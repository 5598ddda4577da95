"""Archive-container ingestion (ZIP and TAR) — the formats datasets
actually ship in (HF dataset archives, scraped-site dumps, academic
corpus releases). Unlike the hand-rolled media walks (MP3/MP4/PDF,
where the exercise is the header format itself), here the stdlib
``zipfile``/``tarfile``/``zlib`` modules ARE the real implementation —
ZIP's DEFLATE decompression runs for real, so the manifest's content
digests prove true extraction, not just directory listing.

Scope: ZIP (stored + deflated + bzip2 + LZMA entries — methods 0,
8, 12, 14, all stdlib-native — plus traditional-ZipCrypto
encrypted entries given a password — r17: stdlib ``zipfile``
decrypts them natively, and the fixture writer hand-rolls the
PKWARE APPNOTE §6.1 cipher for the write side stdlib lacks) and
POSIX tar, bare or stream-compressed as tar.gz / tar.bz2 / tar.xz
(sniffed by magic, inflated via stdlib ``zlib``/``bz2``/``lzma`` —
the forms academic corpus releases actually ship). Encrypted
entries WITHOUT a password, wrong passwords, and corrupt archives
surface as typed ``ValueError`` with the doc context; AES-encrypted
(WinZip AE-x) entries remain the one genuinely library-bound
refusal.

Scale shape: one input archive row → one output row per entry,
Arrow-batched mapInPandas, map-only. Archives are whole-file units
(like gzip, neither format is splittable mid-stream), so corpus
parallelism is the many-archives sharding a real dump already has.
"""

from __future__ import annotations

import io

from pyspark.sql import DataFrame

ZIP_MAGIC = b"PK\x03\x04"


class _ZipCryptoKeys:
    """The traditional PKWARE stream cipher's key schedule (APPNOTE
    §6.1 — a public spec): three 32-bit keys, CRC-folded per PLAIN
    byte, LCG middle key. Used only by the fixture ENCRYPTOR —
    stdlib zipfile owns the decrypt side."""

    def __init__(self, password: bytes):
        import zlib

        self._crc = lambda crc, b: (
            zlib.crc32(bytes([b]), crc ^ 0xFFFFFFFF) ^ 0xFFFFFFFF
        )
        self.k0, self.k1, self.k2 = 0x12345678, 0x23456789, 0x34567890
        for b in password:
            self.update(b)

    def update(self, b: int) -> None:
        self.k0 = self._crc(self.k0, b)
        self.k1 = (self.k1 + (self.k0 & 0xFF)) & 0xFFFFFFFF
        self.k1 = (self.k1 * 134775813 + 1) & 0xFFFFFFFF
        self.k2 = self._crc(self.k2, (self.k1 >> 24) & 0xFF)

    def stream_byte(self) -> int:
        t = (self.k2 | 2) & 0xFFFF
        return ((t * (t ^ 1)) >> 8) & 0xFF

    def encrypt(self, plain: bytes) -> bytes:
        out = bytearray()
        for b in plain:
            out.append(b ^ self.stream_byte())
            self.update(b)
        return bytes(out)


def build_zip_stub(
    entries: list[tuple[str, bytes, bool | int]],
    password: bytes | None = None,
) -> bytes:
    """Deterministic ZIP fixture: (name, content, method) per entry —
    method is the historical bool (deflate?) or an explicit stdlib
    compress_type (0 stored, 8 deflate, 12 bzip2, 14 LZMA) — with
    fixed timestamps so the bytes are stable across runs. With a
    ``password`` the archive is written by hand (stdlib zipfile has
    no encrypting writer): local headers + central directory + EOCD,
    each entry traditional-ZipCrypto encrypted with a deterministic
    11-byte header (md5 of the name) and the CRC-high check byte;
    the hand-rolled writer supports stored/deflated entries only."""
    import zipfile

    if password is None:
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            for name, content, method in entries:
                info = zipfile.ZipInfo(
                    name, date_time=(2024, 1, 1, 0, 0, 0)
                )
                if isinstance(method, bool):
                    info.compress_type = (
                        zipfile.ZIP_DEFLATED
                        if method
                        else zipfile.ZIP_STORED
                    )
                elif method in (
                    zipfile.ZIP_STORED,
                    zipfile.ZIP_DEFLATED,
                    zipfile.ZIP_BZIP2,
                    zipfile.ZIP_LZMA,
                ):
                    info.compress_type = method
                else:
                    raise ValueError(
                        f"unsupported zip compress method {method!r}"
                    )
                zf.writestr(info, content)
        return buf.getvalue()

    import hashlib
    import struct
    import zlib

    dostime = 0
    dosdate = ((2024 - 1980) << 9) | (1 << 5) | 1
    out = bytearray()
    central = bytearray()
    for name, content, deflate in entries:
        if not isinstance(deflate, bool):
            raise ValueError(
                "the hand-rolled ZipCrypto writer supports "
                "stored/deflated entries only (bool method)"
            )
        crc = zlib.crc32(content) & 0xFFFFFFFF
        if deflate:
            c = zlib.compressobj(6, zlib.DEFLATED, -15)
            data = c.compress(content) + c.flush()
            method = 8
        else:
            data = content
            method = 0
        hdr12 = (
            hashlib.md5(name.encode()).digest()[:11]
            + bytes([crc >> 24])
        )
        enc = _ZipCryptoKeys(password).encrypt(hdr12 + data)
        flag, csize, usize = 0x1, len(enc), len(content)
        nb = name.encode()
        lho = len(out)
        out += struct.pack(
            "<IHHHHHIIIHH", 0x04034B50, 20, flag, method,
            dostime, dosdate, crc, csize, usize, len(nb), 0,
        ) + nb + enc
        central += struct.pack(
            "<IHHHHHHIIIHHHHHII", 0x02014B50, 20, 20, flag, method,
            dostime, dosdate, crc, csize, usize, len(nb),
            0, 0, 0, 0, 0, lho,
        ) + nb
    cd_at = len(out)
    out += central
    out += struct.pack(
        "<IHHHHIIH", 0x06054B50, 0, 0, len(entries), len(entries),
        len(central), cd_at, 0,
    )
    return bytes(out)


def build_tar_stub(
    entries: list[tuple[str, bytes]], compression: str | None = None
) -> bytes:
    """Deterministic POSIX-tar fixture with fixed mtimes; with
    ``compression`` in {"gz", "bz2", "xz"} the tar stream is wrapped
    deterministically (gzip written with mtime=0 — tarfile's own
    ``w:gz`` would stamp wall-clock time into the bytes)."""
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, content in entries:
            info = tarfile.TarInfo(name)
            info.size = len(content)
            info.mtime = 1_700_000_000
            tf.addfile(info, io.BytesIO(content))
    raw = buf.getvalue()
    if compression is None:
        return raw
    if compression == "gz":
        import gzip

        out = io.BytesIO()
        with gzip.GzipFile(fileobj=out, mode="wb", mtime=0) as gz:
            gz.write(raw)
        return out.getvalue()
    if compression == "bz2":
        import bz2

        return bz2.compress(raw)
    if compression == "xz":
        import lzma

        return lzma.compress(raw, check=lzma.CHECK_CRC64)
    raise ValueError(f"unknown tar compression {compression!r}")


def parse_archive_manifest(
    payload: bytes, password: bytes | None = None
) -> list[dict]:
    """Extract the per-entry manifest WITH content digests (real
    decompression): ``{entry_idx, archive_fmt, name, n_bytes,
    compressed, content_md5}``. Traditional-ZipCrypto entries
    decrypt when ``password`` is given (stdlib zipfile's native
    support — r17); without one, or with a wrong one, the refusal
    is a typed ``ValueError`` naming the entry. WinZip AES entries
    (compress_type 99) stay ``NotImplementedError``. ZIP bzip2 and
    LZMA entries (methods 12/14) decompress via stdlib natively,
    as do gzip/bz2/xz stream-compressed tars (sniffed by magic;
    ``archive_fmt`` reports ``tar.gz``/``tar.bz2``/``tar.xz`` and
    members carry ``compressed=True`` — the stream is compressed
    as a whole, the way these releases actually ship)."""
    import hashlib
    import tarfile
    import zipfile

    out = []
    # stream-compressed tar wrappers: inflate, then re-enter on the
    # inner payload. A compressed payload whose inner stream is NOT
    # a tar is a typed refusal (this parser's scope is archives, not
    # bare compressed files — those route through the gzip/JSONL EL
    # paths).
    for magic, fmt, opener in (
        (b"\x1f\x8b", "tar.gz", "gzip"),
        (b"BZh", "tar.bz2", "bz2"),
        (b"\xfd7zXZ\x00", "tar.xz", "lzma"),
    ):
        if payload[: len(magic)] == magic:
            try:
                if opener == "gzip":
                    import gzip

                    inner = gzip.decompress(payload)
                elif opener == "bz2":
                    import bz2

                    inner = bz2.decompress(payload)
                else:
                    import lzma

                    inner = lzma.decompress(payload)
            except Exception as err:
                raise ValueError(
                    f"corrupt {fmt} stream: {err}"
                ) from err
            if not (
                inner[257:262] == b"ustar"
                or (len(inner) >= 1024 and inner[:1024] == b"\x00" * 1024)
            ):
                raise ValueError(
                    f"{opener}-compressed payload is not a tar archive"
                )
            for rec in parse_archive_manifest(inner):
                rec["archive_fmt"] = fmt
                rec["compressed"] = True
                out.append(rec)
            return out
    if payload[:4] == ZIP_MAGIC or payload[:4] == b"PK\x05\x06":
        try:
            zf = zipfile.ZipFile(io.BytesIO(payload))
            for i, info in enumerate(zf.infolist()):
                if info.compress_type == 99:
                    raise NotImplementedError(
                        f"AES-encrypted zip entry {info.filename!r} "
                        "(WinZip AE-x) — that cipher is the library "
                        "swap; traditional ZipCrypto decodes here"
                    )
                if info.flag_bits & 0x1 and password is None:
                    raise ValueError(
                        f"encrypted zip entry {info.filename!r}: no "
                        "password provided (pass password= to "
                        "decrypt traditional ZipCrypto)"
                    )
                try:
                    content = zf.read(info, pwd=password)
                except RuntimeError as err:
                    raise ValueError(
                        f"zip entry {info.filename!r}: {err}"
                    ) from err
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
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    password: bytes | None = None,
) -> DataFrame:
    """Arrow-batched archive explode: one archive row → one row per
    entry, content digests via real decompression (and traditional-
    ZipCrypto decryption when ``password`` is given). Map-only."""
    from mongo2pq_spark.deploy import ensure_shipped

    ensure_shipped(df.sparkSession)

    def parse_batches(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                for rec in parse_archive_manifest(
                    bytes(payload), password=password
                ):
                    rec["doc_id"] = doc_id
                    rows.append(rec)
            yield pd.DataFrame(rows)

    return df.mapInPandas(parse_batches, ARCHIVE_SCHEMA)
