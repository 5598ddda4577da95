"""Unigram language-model tokenizer (Kudo 2018, arXiv:1804.10959 —
the SentencePiece unigram model): the second learned-tokenizer family
next to BPE (operators/bpe.py). Where BPE greedily composes merges,
the unigram model starts from a LARGE seed vocabulary and learns piece
probabilities by EM over all segmentations, then PRUNES to the target
size — which is why it can score alternative segmentations
(subword-regularization sampling) and BPE cannot.

Spark-first split, identical to BPE's:

- **Learning is driver-side over the BOUNDED word histogram** (the
  same one shuffle as ``bpe.word_histogram``; the driver never sees
  text, only ≤max_words (word, freq) rows). Seeding counts every
  substring ≤ max_piece_len of the histogram words; EM runs
  forward-backward (soft counts, log-space) over each histogram word;
  pruning drops the lowest-expected-count multi-byte pieces. Single-
  byte pieces are NEVER pruned, which guarantees every word stays
  segmentable — losslessness by construction, like BPE's
  concatenation property.
- **Encoding is an Arrow-batched map**: Viterbi best segmentation per
  word, vocab log-probs on the task closure, per-batch word
  memoization. Map-only, no shuffle, cost ∝ total text bytes.

Determinism: histogram order is pinned by (freq desc, word), every
driver-side dict iteration that feeds a decision is explicitly
sorted, and Viterbi breaks score ties toward the LONGEST piece —
same corpus in, same vocabulary and segmentation out, on every run
and every executor.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

from mongo2pq_spark.operators.bpe import pretokenize, word_histogram

_NEG_INF = float("-inf")


def seed_pieces(
    histogram: list[tuple[bytes, int]],
    seed_size: int = 2000,
    max_piece_len: int = 8,
) -> dict[bytes, float]:
    """Initial piece set: every single byte seen (never pruned later)
    plus the ``seed_size`` most frequent multi-byte substrings of the
    histogram words (count weighted by word frequency, ties broken by
    the substring). Log-probs initialised ∝ substring count."""
    if not histogram:
        raise ValueError("cannot seed a unigram vocab from an empty "
                         "word histogram (empty corpus or text column)")
    counts: dict[bytes, int] = {}
    for wb, freq in histogram:
        n = len(wb)
        for i in range(n):
            top = min(n, i + max_piece_len)
            for j in range(i + 1, top + 1):
                piece = wb[i:j]
                counts[piece] = counts.get(piece, 0) + freq
    multi = sorted(
        (p for p in counts if len(p) > 1),
        key=lambda p: (-counts[p], p),
    )[:seed_size]
    kept = [p for p in counts if len(p) == 1] + multi
    total = sum(counts[p] for p in kept)
    return {p: math.log(counts[p] / total) for p in kept}


def _logsumexp(xs: list[float]) -> float:
    m = max(xs)
    if m == _NEG_INF:
        return _NEG_INF
    return m + math.log(sum(math.exp(x - m) for x in xs))


def _expected_counts(
    wb: bytes, freq: int, logp: dict[bytes, float], max_len: int,
    out: dict[bytes, float],
) -> float:
    """Forward-backward over all segmentations of one word: add
    ``freq``-weighted expected piece counts into ``out``; return the
    word's marginal log-likelihood × freq (the EM objective term)."""
    n = len(wb)
    fwd = [_NEG_INF] * (n + 1)
    fwd[0] = 0.0
    for i in range(1, n + 1):
        opts = []
        for j in range(max(0, i - max_len), i):
            lp = logp.get(wb[j:i])
            if lp is not None and fwd[j] != _NEG_INF:
                opts.append(fwd[j] + lp)
        if opts:
            fwd[i] = _logsumexp(opts)
    bwd = [_NEG_INF] * (n + 1)
    bwd[n] = 0.0
    for i in range(n - 1, -1, -1):
        opts = []
        for j in range(i + 1, min(n, i + max_len) + 1):
            lp = logp.get(wb[i:j])
            if lp is not None and bwd[j] != _NEG_INF:
                opts.append(lp + bwd[j])
        if opts:
            bwd[i] = _logsumexp(opts)
    z = fwd[n]
    if z == _NEG_INF:  # unreachable: single bytes are always in vocab
        raise ValueError(f"unsegmentable word {wb!r}")
    for i in range(n):
        if bwd[i] == _NEG_INF or fwd[i] == _NEG_INF:
            continue
        for j in range(i + 1, min(n, i + max_len) + 1):
            lp = logp.get(wb[i:j])
            if lp is not None and bwd[j] != _NEG_INF:
                e = math.exp(fwd[i] + lp + bwd[j] - z) * freq
                out[wb[i:j]] = out.get(wb[i:j], 0.0) + e
    return z * freq


def _em_round(
    histogram: list[tuple[bytes, int]],
    logp: dict[bytes, float],
    max_len: int,
) -> tuple[dict[bytes, float], dict[bytes, float], float]:
    """One EM iteration: returns (new log-probs, expected counts,
    total log-likelihood). Pieces with zero expected count keep a
    floor probability so single bytes never drop out of the model."""
    exp_counts: dict[bytes, float] = {}
    loglik = 0.0
    for wb, freq in histogram:
        loglik += _expected_counts(wb, freq, logp, max_len, exp_counts)
    floor = 1e-6
    total = sum(exp_counts.values()) + floor * len(logp)
    new_logp = {
        p: math.log((exp_counts.get(p, 0.0) + floor) / total)
        for p in sorted(logp)
    }
    return new_logp, exp_counts, loglik


def learn_unigram_local(
    histogram: list[tuple[bytes, int]],
    vocab_size: int = 400,
    seed_size: int = 2000,
    max_piece_len: int = 8,
    em_rounds: int = 2,
) -> dict[bytes, float]:
    """Seed → EM → prune-to-vocab_size → EM, all on the bounded
    histogram. Pruning drops the multi-byte pieces with the lowest
    expected counts (ties by piece bytes); single-byte pieces are
    structural and never pruned."""
    logp = seed_pieces(histogram, seed_size, max_piece_len)
    for _ in range(em_rounds):
        logp, counts, _ = _em_round(histogram, logp, max_piece_len)
    singles = [p for p in logp if len(p) == 1]
    n_multi = max(0, vocab_size - len(singles))
    survivors = sorted(
        (p for p in logp if len(p) > 1),
        key=lambda p: (-counts.get(p, 0.0), p),
    )[:n_multi]
    logp = {p: logp[p] for p in singles + survivors}
    for _ in range(em_rounds):
        logp, counts, _ = _em_round(histogram, logp, max_piece_len)
    return logp


def learn_unigram(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 400,
    seed_size: int = 2000,
    max_piece_len: int = 8,
    max_words: int = 30_000,
) -> dict[bytes, float]:
    """Distributed-histogram unigram-LM learning: the corpus pass is
    ``bpe.word_histogram`` (one shuffle); seeding, EM, and pruning
    run on the bounded result driver-side."""
    rows = word_histogram(df, text_col, max_words).collect()
    return learn_unigram_local(
        [(r["word"].encode("utf-8"), r["freq"]) for r in rows],
        vocab_size=vocab_size,
        seed_size=seed_size,
        max_piece_len=max_piece_len,
    )


#: log-prob assigned to a single byte absent from the learned vocab
#: (SentencePiece's byte-fallback): far below every learned piece, so
#: it is used only when nothing else covers the byte — which keeps
#: encode TOTAL (lossless on any input), not just on bytes the
#: training histogram happened to contain.
BYTE_FALLBACK_LOGP = -40.0


def viterbi_encode(
    wb: bytes, logp: dict[bytes, float], max_len: int = 8
) -> list[bytes]:
    """Best segmentation under the unigram model. Ties break toward
    the LONGEST piece ending at each position (deterministic), via
    strict > with j iterated ascending (smaller j = longer piece).
    Single bytes outside the vocab fall back to BYTE_FALLBACK_LOGP,
    so every byte string is segmentable."""
    n = len(wb)
    best = [_NEG_INF] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            lp = logp.get(wb[j:i])
            if lp is None and j == i - 1:
                lp = BYTE_FALLBACK_LOGP
            if lp is not None and best[j] != _NEG_INF:
                score = best[j] + lp
                if score > best[i]:
                    best[i] = score
                    back[i] = j
    if best[n] == _NEG_INF:  # unreachable given the byte fallback
        raise ValueError(f"unsegmentable word {wb!r}")
    pieces = []
    i = n
    while i > 0:
        j = back[i]
        pieces.append(wb[j:i])
        i = j
    pieces.reverse()
    return pieces


UNIGRAM_STATS_SCHEMA = (
    "doc_id bigint, n_bytes bigint, n_tokens bigint, "
    "max_token_len int, roundtrip_md5 string"
)


def unigram_encode_stats(
    df: DataFrame,
    logp: dict[bytes, float],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int | None = None,
) -> DataFrame:
    """Arrow-batched Viterbi encode emitting the same per-doc token
    accounting as ``bpe.bpe_encode_stats`` — n_bytes, n_tokens, the
    longest token, and the decoded-bytes md5 that makes losslessness
    value-oracle-checkable in SQL. Map-only; the vocab log-probs ride
    the task closure; per-batch word memoization. ``max_piece_len``
    defaults to the vocab's own longest piece, so a vocab trained
    with a different length bound can never silently lose pieces to
    a too-small Viterbi window."""
    from mongo2pq_spark.deploy import ensure_shipped

    ensure_shipped(df.sparkSession)
    if max_piece_len is None:
        max_piece_len = max((len(p) for p in logp), default=1)

    def stat_batches(batches):
        import hashlib

        import pandas as pd

        cache: dict[str, list[bytes]] = {}
        for pdf in batches:
            out = {
                "doc_id": [], "n_bytes": [], "n_tokens": [],
                "max_token_len": [], "roundtrip_md5": [],
            }
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                text = text or ""
                if len(cache) > 200_000:
                    cache.clear()  # executor-memory bound, never correctness
                tokens: list[bytes] = []
                for w in pretokenize(text):
                    hit = cache.get(w)
                    if hit is None:
                        hit = cache[w] = viterbi_encode(
                            w.encode("utf-8"), logp, max_piece_len
                        )
                    tokens.extend(hit)
                decoded = b"".join(tokens)
                out["doc_id"].append(doc_id)
                out["n_bytes"].append(len(text.encode("utf-8")))
                out["n_tokens"].append(len(tokens))
                out["max_token_len"].append(
                    max((len(t) for t in tokens), default=0)
                )
                out["roundtrip_md5"].append(
                    hashlib.md5(decoded).hexdigest()
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(stat_batches, UNIGRAM_STATS_SCHEMA)


def save_vocab(logp: dict[bytes, float], path: str) -> None:
    """Persist a learned unigram vocab as one ``hex logprob`` line per
    piece (binary-safe; log-probs via ``repr`` so the double
    round-trips bit-exactly). Same pinned-artifact discipline as
    ``bpe.save_merges``: token accounting is only reproducible under
    the exact vocabulary that produced it; format versioned."""
    lines = ["unigram-vocab-v1"]
    lines += [f"{p.hex()} {logp[p]!r}" for p in sorted(logp)]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def load_vocab(path: str) -> dict[bytes, float]:
    """Inverse of ``save_vocab``; fail-loud on unknown versions or
    malformed lines (a silently mis-parsed vocab would corrupt every
    downstream token count)."""
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    if not lines or lines[0] != "unigram-vocab-v1":
        raise ValueError(f"not a unigram-vocab-v1 file: {path}")
    logp = {}
    for ln in lines[1:]:
        parts = ln.split(" ")
        if len(parts) != 2:
            raise ValueError(f"malformed vocab line {ln!r} in {path}")
        logp[bytes.fromhex(parts[0])] = float(parts[1])
    return logp
