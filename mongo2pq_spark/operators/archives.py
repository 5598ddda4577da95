"""Archive-container ingestion (ZIP and TAR) — the formats datasets
actually ship in (HF dataset archives, scraped-site dumps, academic
corpus releases). Unlike the hand-rolled media walks (MP3/MP4/PDF,
where the exercise is the header format itself), here the stdlib
``zipfile``/``tarfile``/``zlib`` modules ARE the real implementation —
ZIP's DEFLATE decompression runs for real, so the manifest's content
digests prove true extraction, not just directory listing.

Scope: ZIP (stored + deflated entries) and POSIX tar. Encrypted ZIP
entries raise ``NotImplementedError`` (the crypto is the library
swap); corrupt archives surface the stdlib's errors re-typed as
``ValueError`` with the doc context.

Scale shape: one input archive row → one output row per entry,
Arrow-batched mapInPandas, map-only. Archives are whole-file units
(like gzip, neither format is splittable mid-stream), so corpus
parallelism is the many-archives sharding a real dump already has.
"""

from __future__ import annotations

import io

from pyspark.sql import DataFrame

ZIP_MAGIC = b"PK\x03\x04"


def build_zip_stub(entries: list[tuple[str, bytes, bool]]) -> bytes:
    """Deterministic ZIP fixture: (name, content, deflate?) per entry,
    fixed timestamps so the bytes are stable across runs."""
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, content, deflate in entries:
            info = zipfile.ZipInfo(name, date_time=(2024, 1, 1, 0, 0, 0))
            info.compress_type = (
                zipfile.ZIP_DEFLATED if deflate else zipfile.ZIP_STORED
            )
            zf.writestr(info, content)
    return buf.getvalue()


def build_tar_stub(entries: list[tuple[str, bytes]]) -> bytes:
    """Deterministic POSIX-tar fixture with fixed mtimes."""
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, content in entries:
            info = tarfile.TarInfo(name)
            info.size = len(content)
            info.mtime = 1_700_000_000
            tf.addfile(info, io.BytesIO(content))
    return buf.getvalue()


def parse_archive_manifest(payload: bytes) -> list[dict]:
    """Extract the per-entry manifest WITH content digests (real
    decompression): ``{entry_idx, archive_fmt, name, n_bytes,
    compressed, content_md5}``."""
    import hashlib
    import tarfile
    import zipfile

    out = []
    if payload[:4] == ZIP_MAGIC or payload[:4] == b"PK\x05\x06":
        try:
            zf = zipfile.ZipFile(io.BytesIO(payload))
            for i, info in enumerate(zf.infolist()):
                if info.flag_bits & 0x1:
                    raise NotImplementedError(
                        f"encrypted zip entry {info.filename!r} — "
                        "archive crypto is the library swap"
                    )
                content = zf.read(info)  # REAL inflate for deflated
                out.append(
                    {
                        "entry_idx": i,
                        "archive_fmt": "zip",
                        "name": info.filename,
                        "n_bytes": info.file_size,
                        "compressed": info.compress_type
                        != zipfile.ZIP_STORED,
                        "content_md5": hashlib.md5(content).hexdigest(),
                    }
                )
        except zipfile.BadZipFile as err:
            raise ValueError(f"corrupt zip archive: {err}") from err
        return out
    # tar has no leading magic; ustar magic sits at offset 257 (both
    # POSIX "ustar\0" and GNU "ustar " spellings share the 5 bytes;
    # Python's tarfile writes PAX/GNU, both carry it). ADVICE r11:
    # the magic is REQUIRED to enter this branch — the old
    # `or not gzip` fallback routed every arbitrary binary payload
    # into tarfile, misreporting corrupt non-archives as corrupt tars
    # and making the unrecognized-container error unreachable.
    # A valid EMPTY tar has no member headers at all — tarfile emits
    # only zero end-of-archive blocks, so the ustar magic test below
    # would misreport it as unrecognized (ADVICE r12). Two 512-byte
    # zero blocks are the POSIX end-of-archive marker; accept any
    # payload that starts with them (padding to the 10 KiB blocksize
    # is also zeros) as an empty archive.
    if len(payload) >= 1024 and payload[:1024] == b"\x00" * 1024:
        return out
    if payload[257:262] == b"ustar":
        try:
            tf = tarfile.open(fileobj=io.BytesIO(payload), mode="r:")
            for i, member in enumerate(tf.getmembers()):
                content = (
                    tf.extractfile(member).read()
                    if member.isfile()
                    else b""
                )
                out.append(
                    {
                        "entry_idx": i,
                        "archive_fmt": "tar",
                        "name": member.name,
                        "n_bytes": member.size,
                        "compressed": False,
                        "content_md5": hashlib.md5(content).hexdigest(),
                    }
                )
        except tarfile.TarError as err:
            raise ValueError(f"corrupt tar archive: {err}") from err
        return out
    raise ValueError("unrecognized archive container")


ARCHIVE_SCHEMA = (
    "doc_id bigint, entry_idx int, archive_fmt string, name string, "
    "n_bytes bigint, compressed boolean, content_md5 string"
)


def archive_manifest(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched archive explode: one archive row → one row per
    entry, content digests via real decompression. Map-only."""
    from mongo2pq_spark.deploy import ensure_shipped

    ensure_shipped(df.sparkSession)

    def parse_batches(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                for rec in parse_archive_manifest(bytes(payload)):
                    rec["doc_id"] = doc_id
                    rows.append(rec)
            yield pd.DataFrame(rows)

    return df.mapInPandas(parse_batches, ARCHIVE_SCHEMA)
