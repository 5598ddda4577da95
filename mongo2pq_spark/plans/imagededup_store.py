"""Persistent cross-run incremental IMAGE near-dedup store — the
backend of the CLI's ``--media-dhash-store`` flag: the
``--near-dedup-store`` contract (plans/neardedup_store.py) applied to
the image modality.

Each media EL run is one BATCH: decodable image payloads (PNG /
baseline JPEG, the engine's real codecs) are dHashed once, probed
against every PREVIOUSLY ingested batch's banded fingerprints
(pigeonhole-complete Hamming blocking + exact popcount verify — the
same audited machinery as `operators/dedup.py::hamming_incremental_new`
and the streaming Hamming store), near-dup re-crawls are DROPPED
before the parquet write, and the surviving images' fingerprints are
committed. Per-run cost scales with the increment; history's only
trace is one int64 fingerprint (x bands) per surviving image.

Identity & idempotency mirror the text store: an image is identified
by the md5 of its payload BYTES (rerun-stable, id-column-independent);
the batch token is a deterministic order-independent aggregate of the
payload-digest set; store writes are ``batch=<token>`` partition
overwrites whose probe excludes the batch's own rows (src_token), so
reruns and crash-retries recompute the identical drop set.

Scope honesty: only mimes the real codecs decode (image/png,
image/jpeg) are fingerprinted. Non-image rows (audio/video/other) and
images the codecs reject (GIF/WebP, progressive JPEG, 16-bit PNG)
pass through UN-deduped and UN-indexED — counted and warned, never
silently dropped or crashed on: an ingestion run must not die on one
odd file, and pretending to dedup what we cannot decode would be a
fake. Within-batch near-dups both survive (exact payload-digest dedup
runs upstream in the CLI; the text store has the same contract).

Growth: one ``batch=`` partition per run (a listing cost).
``consolidate()`` is deliberately deferred to the shared-core pattern
already proven twice (text EL + streaming stores both ride
``plans/bandstore_core.replace_dir``); rows already carry
``src_token`` so consolidation is a drop-in when partition counts
warrant it.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mongo2pq_spark.plans.bandstore_core import (
    RunLog,
    atomic_write_json,
    data_partition_dirs,
)

#: canonical image id inside the store: md5 of the payload bytes
STORE_ID = "__m2p_img_id"

#: mimes the engine's REAL pixel codecs decode
DECODABLE_MIMES = ("image/png", "image/jpeg")

DHASH_SCHEMA = f"{STORE_ID} string, fp bigint, decode_err string"


class ImageDedupStore:
    def __init__(
        self,
        root: str | os.PathLike,
        collection: str,
        max_hamming: int = 3,
        bits: int = 60,
    ) -> None:
        root_str = str(root)
        if "://" in root_str:
            raise ValueError(
                "--media-dhash-store must be a driver-visible local "
                f"directory, got {root_str!r}; remote object-store "
                "backends need the catalog-table variant of this "
                "layout (see module docstring)"
            )
        if not 0 <= max_hamming < bits:
            raise ValueError(
                f"max_hamming must be in [0, {bits}), got {max_hamming}"
            )
        self.dir = Path(root) / collection
        self.max_hamming = max_hamming
        self.bits = bits
        self._hashed = None
        self._fp = None
        self._dropped = None
        self._check_meta()

    def _check_meta(self) -> None:
        meta_path = self.dir / "meta.json"
        pinned = {
            "layout": 1,
            "kind": "image-dhash",
            "max_hamming": self.max_hamming,
            "bits": self.bits,
        }
        if meta_path.is_file():
            with open(meta_path) as fh:
                stored = json.load(fh)
            drift = {
                key: (stored.get(key), val)
                for key, val in pinned.items()
                if stored.get(key) != val
            }
            if drift:
                raise ValueError(
                    f"image-dedup store {self.dir} was built with "
                    f"different parameters: {drift} (stored, requested)"
                    " — probing across parameter changes produces "
                    "garbage candidates; use a fresh store directory"
                )
            return
        if self.dir.is_dir() and any(
            e for e in self.dir.iterdir() if not e.name.endswith(".tmp")
        ):
            raise ValueError(
                f"{self.dir} exists and is non-empty but has no "
                "meta.json — not an image-dedup store (or an "
                "incompatible layout); refusing to initialize over it"
            )
        self.dir.mkdir(parents=True, exist_ok=True)
        atomic_write_json(meta_path, pinned)

    # ---------------------------------------------------------- batch

    def batch_token(self, df: DataFrame) -> str:
        """Deterministic, order-independent fingerprint of the batch's
        payload-digest set (same construction and collision margin as
        the text store's token: count + both 64-bit md5-half sums)."""
        dig = F.col("payload_md5")
        half = lambda lo, ln: F.sum(  # noqa: E731
            F.conv(F.substring(dig, lo, ln), 16, 10).cast("decimal(38,0)")
        )
        row = df.select(
            F.count("*").alias("n"),
            half(1, 16).alias("h1"),
            half(17, 16).alias("h2"),
        ).first()
        return f"{row['n']}_{row['h1'] or 0}_{row['h2'] or 0}"

    def _dhash_or_null(self, df: DataFrame) -> DataFrame:
        """(payload_md5, fp, decode_err) for DECODABLE-mime rows: the
        real-codec dHash, with per-file typed decode failures captured
        as a reason string instead of killing the whole Arrow stage —
        those rows pass through un-deduped and un-indexed (warned)."""
        from mongo2pq_spark.deploy import ensure_shipped

        ensure_shipped(df.sparkSession)

        def hash_batches(batches):
            import pandas as pd

            from mongo2pq_spark.operators.multimodal import (
                decode_image_pixels,
                dhash_bits,
            )

            for pdf in batches:
                ids, fps, errs = [], [], []
                for md5_, payload in zip(
                    pdf["payload_md5"], pdf["payload"]
                ):
                    ids.append(md5_)
                    try:
                        fps.append(
                            dhash_bits(
                                decode_image_pixels(bytes(payload))[3]
                            )
                        )
                        errs.append(None)
                    except (ValueError, NotImplementedError) as exc:
                        fps.append(None)
                        errs.append(f"{type(exc).__name__}: {exc}")
                yield pd.DataFrame(
                    {STORE_ID: ids, "fp": fps, "decode_err": errs}
                )

        return df.filter(F.col("mime").isin(*DECODABLE_MIMES)).select(
            "payload_md5", "payload"
        ).mapInPandas(hash_batches, DHASH_SCHEMA)

    def _banded(self, fp_df: DataFrame) -> DataFrame:
        from mongo2pq_spark.operators.dedup import _hamming_band_table

        return _hamming_band_table(
            fp_df, "fp", STORE_ID, self.max_hamming, self.bits, 100_000
        )

    def filter_new(self, df: DataFrame, token: str) -> DataFrame:
        """Drop rows whose image fingerprint lies within
        ``max_hamming`` of ANY previously ingested batch's fingerprint;
        non-image and undecodable rows pass through (warned)."""
        hashed = self._dhash_or_null(df).persist()
        self._hashed = hashed
        n_bad = hashed.filter(F.col("decode_err").isNotNull()).count()
        if n_bad:
            sample = (
                hashed.filter(F.col("decode_err").isNotNull())
                .select("decode_err")
                .first()["decode_err"]
            )
            print(
                f"WARNING: {n_bad} image payload(s) not decodable by "
                f"the built-in codecs (e.g. {sample}) — ingested "
                "un-deduped and un-indexed",
                file=sys.stderr,
            )
        fp = hashed.filter(F.col("fp").isNotNull()).select(STORE_ID, "fp")
        self._fp = fp

        spark = df.sparkSession
        fp_dirs = [
            str(p)
            for p in data_partition_dirs(
                self.dir / "fps", exclude=f"batch={token}"
            )
        ]
        if not fp_dirs:
            self._dropped = None
            return df
        index = (
            spark.read.parquet(*fp_dirs)
            .filter(F.col("src_token") != token)
            .select(
                F.col("fp").alias("other_fp"), "band_id", "band_value"
            )
        )
        ham = F.bit_count(F.col("fp").bitwiseXOR(F.col("other_fp")))
        dropped = (
            self._banded(fp)
            .join(index, ["band_id", "band_value"])
            .filter(ham <= self.max_hamming)
            .select(STORE_ID)
            .distinct()
            .persist()
        )
        self._dropped = dropped
        return df.join(
            dropped.withColumnRenamed(STORE_ID, "__m2p_drop_md5"),
            F.col("payload_md5") == F.col("__m2p_drop_md5"),
            "left_anti",
        )

    def commit(self, token: str) -> None:
        """Index the batch's surviving fingerprints (banded rows,
        overwrite-by-partition, then the done marker) — only after the
        EL write succeeded, same ordering contract as the text store."""
        if self._fp is None:
            raise RuntimeError("commit() before filter_new()")
        survivors = (
            self._fp
            if self._dropped is None
            else self._fp.join(self._dropped, STORE_ID, "left_anti")
        )
        self._banded(survivors).withColumn(
            "src_token", F.lit(token)
        ).write.mode("overwrite").parquet(
            str(self.dir / "fps" / f"batch={token}")
        )
        RunLog(self.dir / "runs").mark_done(token)
        self.close()

    def close(self) -> None:
        for cached in (self._hashed, self._dropped):
            if cached is not None:
                cached.unpersist(False)
        self._hashed = self._fp = self._dropped = None
