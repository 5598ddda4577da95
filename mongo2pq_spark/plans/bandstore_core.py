"""Shared crash-safety core for the persisted MinHash band stores.

Backs both ``plans/neardedup_store.py`` (batch EL store: signature-
verified DROP semantics, content-token batches) and
``streaming/neardedup.py`` (micro-batch store: band-collision FLAG
semantics, numbered increments). The two stores keep their own
semantics and layouts; what they share — and what lives here as the
ONE audited implementation — is the machinery every idempotent run
and every layout-rewriting maintenance job needs:

- ``replace_dir`` / ``recover_replace``: crash-safely replace a
  directory with rewritten content (write-aside build →
  complete-by-naming rename → swap with ``.old`` rollback). Used by
  the batch store's ``consolidate()`` (per-tree ``batch=c0``) and the
  streaming store's ``compact_band_store`` (whole ``bands/`` dir).
- ``RunLog``: a ``runs/`` directory of atomic JSON manifests plus
  ``.done`` completion markers, with NUMERIC run-id ordering
  (lexicographic ordering silently breaks at the 10 000th increment:
  ``'r10000' < 'r9999'`` as strings, so the crashed-run resume check
  would inspect the wrong manifest).
- ``data_partition_dirs``: partition listing that ignores partitions
  holding no data files (a crashed append's ``_temporary`` droppings
  or an empty partition holding only ``_SUCCESS`` must not poison a
  read or an audit).
- ``absorbed_tokens`` / ``record_absorbed``: the SIDECAR variant of
  post-consolidation retry exclusion, used by the inverted-index
  store (operators/text.py). The dedup stores record each row's
  origin batch IN the row (``src_token``) so exclusion survives
  consolidation for free — but that mechanism cannot fit a postings
  layout, where consolidation is a REGROUP that merges several
  batches' postings into one row: per-row provenance is destroyed
  by design. The ``_absorbed.json`` sidecar (written into the build
  dir, so it swaps atomically with the data it describes) is the
  correct mechanism there, and it lives here so the crash-safety
  reasoning is owned once. (r11 verdict task 8: evaluated porting
  the index store onto ``src_token`` rows — doesn't fit, for the
  reason above; the sidecar helpers moved here instead.)

Everything here is driver-local filesystem bookkeeping — at warehouse
scale these become catalog transactions / MERGE boundaries with the
same shape (documented in the two store modules).
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path
from typing import Callable


def atomic_write_json(path: Path, obj) -> None:
    """Write JSON via a same-directory temp file + rename, so readers
    never observe a torn manifest."""
    tmp = path.parent / f"_{path.name}.tmp"
    with open(tmp, "w") as fh:
        json.dump(obj, fh)
    os.replace(tmp, path)


def absorbed_tokens(root: Path | str) -> set[str]:
    """Tokens of batches already folded into the consolidated
    partition — recorded by consolidation in ``_absorbed.json``
    (underscore-prefixed so Spark's parquet discovery ignores it).
    A producer retry whose batch was absorbed must NOT re-append it
    next to the consolidated partition: consolidation is a pure
    regroup, so the duplicate would be baked in permanently."""
    p = Path(root) / "_absorbed.json"
    if not p.is_file():
        return set()
    with open(p) as fh:
        return set(json.load(fh))


def record_absorbed(root: Path | str, tokens: set[str]) -> None:
    """Write the absorbed-token record. Call with the ``replace_dir``
    BUILD path during consolidation — the record then swaps into
    place atomically with the data it describes (a record that could
    land without its data, or vice versa, would break the retry
    exclusion in exactly the crash windows it exists for)."""
    atomic_write_json(Path(root) / "_absorbed.json", sorted(tokens))


def digest_batch_token(df, dig) -> str:
    """Deterministic, order-independent content token of a batch:
    row count + decimal sums of both 64-bit halves of a per-row md5
    digest column (~128 collision bits — a narrow checksum would let
    two DIFFERENT batches alias one partition). One map-side
    aggregate; the same input always maps to the same token, so
    retries overwrite their own partition. Sums over zero rows are
    NULL; coalesced so the empty batch gets the well-formed token
    0_0_0 instead of embedding 'None' in partition dir names (only
    n=0 can null the halves, so no real batch can alias it).

    The one definition behind the near-dedup, media and inverted-index
    stores' batch identity — their on-disk token format is this
    string."""
    from pyspark.sql import functions as F

    half = lambda lo, ln: F.sum(  # noqa: E731
        F.conv(F.substring(dig, lo, ln), 16, 10).cast("decimal(38,0)")
    )
    row = df.select(
        F.count("*").alias("n"),
        half(1, 16).alias("h1"),
        half(17, 16).alias("h2"),
    ).first()
    return f"{row['n']}_{row['h1'] or 0}_{row['h2'] or 0}"


def data_partition_dirs(
    base: Path, prefix: str = "batch=", exclude: str | None = None
) -> list[Path]:
    """Partition dirs under ``base`` that hold actual data files,
    sorted by name; ``exclude`` skips one partition by full dir name
    (the probing batch's own-partition exclusion)."""
    if not base.is_dir():
        return []
    return [
        p
        for p in sorted(base.glob(f"{prefix}*"))
        if p.name != exclude and any(p.glob("*.parquet"))
    ]


def aux_path(target: Path, kind: str) -> Path:
    """Sibling scratch path for ``replace_dir``'s protocol. The
    leading underscore keeps it outside ``<prefix>*`` partition globs
    and makes Spark's readers ignore it; ``=`` is flattened so the
    name is never itself parsed as a partition."""
    return target.parent / f"_{target.name.replace('=', '_')}.{kind}"


def recover_replace(target: Path) -> None:
    """Roll an interrupted ``replace_dir(target, ...)`` forward or
    back. Crash windows and their resolution:

    - build written, not yet renamed → the stranded ``.build`` is
      dropped (incomplete by definition).
    - build renamed to ``.swapin`` but ``target`` still present → the
      swap-in is DISCARDED: its content is recomputable (both call
      sites re-derive it from sources that are only deleted after
      ``replace_dir`` returns), while preferring it would require
      proving it newer than ``target``.
    - ``target`` renamed aside to ``.old``, swap-in not yet renamed →
      roll FORWARD (``.swapin`` is complete by naming: it only ever
      gets that name after its parquet write succeeded).
    - ``.old`` present with no swap-in (or next to a live target
      post-swap) → roll BACK / drop the stale copy.

    ``target`` is therefore never left missing when any complete copy
    exists — the invariant the stores' probes depend on (a missing
    index directory reads as "empty store" and mass-unflags
    duplicates)."""
    swapin, old = aux_path(target, "swapin"), aux_path(target, "old")
    if not target.is_dir():
        if swapin.is_dir():
            os.rename(swapin, target)
        elif old.is_dir():
            os.rename(old, target)
    shutil.rmtree(old, ignore_errors=True)
    if target.is_dir():
        shutil.rmtree(swapin, ignore_errors=True)
    shutil.rmtree(aux_path(target, "build"), ignore_errors=True)


def replace_dir(target: Path, writer: Callable[[str], None]) -> None:
    """Crash-safely replace ``target`` with the content ``writer``
    produces at the build path it is handed. At every crash point the
    combination of on-disk state and ``recover_replace`` yields either
    the complete old or the complete new content (see the crash-window
    inventory there). Callers must keep the inputs ``writer`` derives
    its output from until this returns — that is what makes discarding
    an ambiguous swap-in safe."""
    recover_replace(target)
    build, swapin = aux_path(target, "build"), aux_path(target, "swapin")
    old = aux_path(target, "old")
    writer(str(build))
    os.rename(build, swapin)  # complete-by-naming
    if target.is_dir():
        os.rename(target, old)
    os.rename(swapin, target)
    shutil.rmtree(old, ignore_errors=True)


class RunLog:
    """A ``runs/`` directory of run manifests and completion markers.

    Two usage profiles, one bookkeeping implementation:

    - marker-only (batch store): ``mark_done(token)`` +
      ``done_tokens()`` — tokens are caller-defined (content
      fingerprints).
    - numbered increments (streaming store): ``begin_numbered()``
      allocates ``r<NNNN>`` manifests whose offsets are the running
      sum of completed increments' batch counts, resumes a crashed
      (un-``done``) increment with its ORIGINAL parameters, and
      refuses to resume it under a different input path.
    """

    def __init__(self, runs_dir: str | os.PathLike) -> None:
        self.dir = Path(runs_dir)

    def done_tokens(self) -> set[str]:
        if not self.dir.is_dir():
            return set()
        return {p.name[: -len(".done")] for p in self.dir.glob("*.done")}

    def mark_done(self, token: str) -> None:
        self.dir.mkdir(parents=True, exist_ok=True)
        (self.dir / f"{token}.done").write_text("")

    def _run_ids(self) -> list[str]:
        """Numbered run ids in NUMERIC order — the whole point of
        centralizing this (see module docstring)."""
        if not self.dir.is_dir():
            return []
        ids = [
            p.stem
            for p in self.dir.glob("r*.json")
            if p.stem[1:].isdigit()
        ]
        return sorted(ids, key=lambda n: int(n[1:]))

    def begin_numbered(
        self, n_batches: int, documents_path: str = ""
    ) -> tuple[str, int, int]:
        """Allocate (or resume) a numbered increment: returns
        ``(run_id, offset, n_batches)``.

        The manifest is written atomically BEFORE the caller stages or
        writes anything, and the caller lands ``mark_done(run_id)``
        only after its work drains — so a crash anywhere inside the
        increment leaves an un-``done`` manifest that the next call
        resumes with the ORIGINAL offset and batch count (half-written
        partitions are simply overwritten). A resume with a DIFFERENT
        ``documents_path`` raises instead of silently draining the
        crashed increment's staged files under the new name. Offsets
        are the running sum of completed manifests' ``n_batches`` — a
        pure metadata read, never a store scan. Every un-done manifest
        is checked (not just the newest), so a skipped crashed run can
        never be silently stranded."""
        self.dir.mkdir(parents=True, exist_ok=True)
        ids = self._run_ids()
        done = self.done_tokens()
        offset = 0
        for rid in ids:
            with open(self.dir / f"{rid}.json") as fh:
                manifest = json.load(fh)
            if rid not in done:
                if manifest.get("documents_path", "") != documents_path:
                    raise ValueError(
                        f"increment {rid} crashed mid-run over "
                        f"{manifest.get('documents_path')!r}; resume it "
                        f"with that documents_path (got "
                        f"{documents_path!r}) before starting new work"
                    )
                return rid, int(manifest["offset"]), int(manifest["n_batches"])
            offset += int(manifest["n_batches"])
        run_id = f"r{(int(ids[-1][1:]) + 1) if ids else 0:04d}"
        atomic_write_json(
            self.dir / f"{run_id}.json",
            {
                "offset": offset,
                "n_batches": n_batches,
                "documents_path": documents_path,
            },
        )
        return run_id, offset, n_batches
