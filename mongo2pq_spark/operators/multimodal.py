"""Multimodal column plumbing.

Media (image/audio/video) travels as an opaque ``binary`` payload
column plus a typed metadata struct. The Spark-side plumbing — schema,
partition-friendly batch iteration, Arrow-batched UDF signatures — is
real and tested. Pixel decoding is REAL for PNG (below) and baseline
JPEG (``operators/jpeg.py``) via pure-stdlib+numpy reference codecs;
the remaining decodes (audio/video, progressive/subsampled JPEG
variants) are stubbed because their codec libraries are not in this
container: ``decode_stub='fake'`` produces a deterministic fake
feature vector from the payload bytes, ``decode_stub='raise'`` raises
NotImplementedError where a real decoder (PIL/librosa/av) would plug
in.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: metadata struct carried alongside every payload
MEDIA_META_FIELDS = "mime string, n_bytes int, payload_md5 string"

DECODED_SCHEMA = (
    "doc_id bigint, mime string, n_bytes int, payload_md5 string, "
    "feature array<double>"
)


def attach_payload(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    mime: str = "text/plain",
) -> DataFrame:
    """Build a multimodal-shaped table from the documents fixture:
    payload = utf-8 bytes of the text (stand-in for image/audio bytes),
    plus the metadata struct every real ingest would carry."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit(mime).alias("mime"),
        F.octet_length(payload).alias("n_bytes"),
        F.md5(payload).alias("payload_md5"),
    )
    return df.select(F.col(id_col), payload.alias("payload"), meta.alias("meta"))


def decode_features(
    df: DataFrame,
    decode_stub: str = "fake",
    feature_dim: int = 4,
) -> DataFrame:
    """Arrow-batched decode: mapInPandas over (id, payload, meta).

    For IMAGES the real path exists: ``image_cell_sums`` pools actual
    decoded pixels through the PNG/JPEG codecs; AUDIO decodes for
    real through WAV and (r16) the full FLAC codec; VIDEO frames
    decode for real for MJPEG-in-AVI (r16, operators/video.py). This
    generic surface keeps the fake-feature stand-in for the
    modalities whose decoders aren't in this container (lossy audio
    samples, compressed inter-frame video); the batch shape, schema
    contract, and partition parallelism are what a real decoder
    plugs into unchanged.
    """
    from mongo2pq_spark.deploy import ensure_shipped

    ensure_shipped(df.sparkSession)

    def decode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "media decoding requires codec libraries (PIL/librosa/av) "
                    "not present in this environment"
                )
            features = pdf["payload"].map(lambda b: _fake_features(b, feature_dim))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["meta"].map(lambda m: m["mime"]),
                    "n_bytes": pdf["meta"].map(lambda m: m["n_bytes"]),
                    "payload_md5": pdf["meta"].map(lambda m: m["payload_md5"]),
                    "feature": features,
                }
            )

    return df.mapInPandas(decode_batches, DECODED_SCHEMA)


def _fake_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in feature vector: FLOOR of the mean byte
    value of ``dim`` equal chunks of the payload (a real decoder
    returns e.g. pooled image embeddings with the same shape contract).

    The floor keeps every feature integer-valued, which makes the
    vector fully mirrorable in ANSI SQL: integer-valued doubles render
    identically ("97.0") in Spark (Java Double.toString) and DuckDB, so
    the scalarized digest in ``multimodal_decode_features`` hash-matches
    its DuckDB oracle — a fractional mean would hit engine-specific
    shortest-float formatting and round-half modes instead."""
    if not payload:
        return [0.0] * dim
    chunk = max(1, len(payload) // dim)
    feats = []
    for i in range(dim):
        piece = payload[i * chunk : (i + 1) * chunk] or payload[-chunk:]
        feats.append(float(sum(piece) // len(piece)))
    return feats


def parse_image_dimensions(payload: bytes):
    """REAL (not stubbed) container-header parse in pure Python — no
    codec libraries: PNG IHDR, GIF logical screen descriptor, JPEG SOF
    marker scan. This is the pipeline stage that filters by resolution
    BEFORE paying for pixel decode; only the pixel decode itself stays
    stubbed in this environment.

    Returns (mime, width, height) or None for unrecognized payloads."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        return (
            "image/png",
            int.from_bytes(payload[16:20], "big"),
            int.from_bytes(payload[20:24], "big"),
        )
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        return (
            "image/gif",
            int.from_bytes(payload[6:8], "little"),
            int.from_bytes(payload[8:10], "little"),
        )
    if payload[:2] == b"\xff\xd8":  # JPEG SOI; scan segments for SOF
        i = 2
        while i + 9 <= len(payload):
            if payload[i] != 0xFF:
                return None  # corrupt segment stream
            marker = payload[i + 1]
            # SOF0-SOF15 carry dimensions, except DHT/JPG/DAC (C4/C8/CC)
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                return (
                    "image/jpeg",
                    int.from_bytes(payload[i + 7 : i + 9], "big"),
                    int.from_bytes(payload[i + 5 : i + 7], "big"),
                )
            seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
            i += 2 + seg_len
        return None
    return None


IMAGE_DIMS_SCHEMA = "doc_id bigint, mime string, width int, height int"


def image_dimensions(df: DataFrame) -> DataFrame:
    """Arrow-batched header parse over (doc_id, payload): emits
    (mime, width, height) per image, nulls for unrecognized payloads.
    Map-side only — pipelines with the scan, no shuffle."""
    from mongo2pq_spark.deploy import ensure_shipped

    ensure_shipped(df.sparkSession)

    def parse_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            parsed = [
                parse_image_dimensions(bytes(p or b"")) for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [p[0] if p else None for p in parsed],
                    "width": [p[1] if p else None for p in parsed],
                    "height": [p[2] if p else None for p in parsed],
                }
            )

    return df.mapInPandas(parse_batches, IMAGE_DIMS_SCHEMA)


_EXT_MIME = {
    "jpg": "image/jpeg", "jpeg": "image/jpeg", "png": "image/png",
    "gif": "image/gif", "webp": "image/webp",
    "wav": "audio/wav", "mp3": "audio/mpeg", "flac": "audio/flac",
    "mp4": "video/mp4", "webm": "video/webm", "mkv": "video/x-matroska",
}


def ingest_binary_dir(
    spark, path: str, glob: str | None = None
) -> DataFrame:
    """Real media ingestion: ``spark.read.format("binaryFile")`` over a
    directory of image/audio/video files → the same (doc_id, payload,
    meta) shape ``attach_payload`` builds from the text fixture, so the
    whole downstream (metadata projection, Arrow-batched decode) works
    unchanged on real files.

    Scale shape: binaryFile is a distributed file-parallel scan (one
    task per file group); mime comes from the extension (a column
    expression), md5/size from the payload — no driver-side listing
    loop. doc_id is the md5-derived 60-bit hash of the file path
    (portable, deterministic, join-friendly).
    """
    from mongo2pq_spark.functions.hashing import hash64

    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    ext = F.lower(F.regexp_extract(F.col("path"), r"\.([A-Za-z0-9]+)$", 1))
    mime = F.lit("application/octet-stream")
    for e, m in _EXT_MIME.items():
        mime = F.when(ext == e, F.lit(m)).otherwise(mime)
    meta = F.struct(
        mime.alias("mime"),
        F.octet_length(F.col("content")).alias("n_bytes"),
        F.md5(F.col("content")).alias("payload_md5"),
    )
    return raw.select(
        hash64(F.col("path")).alias("doc_id"),
        F.col("path").alias("source_path"),
        F.col("content").alias("payload"),
        meta.alias("meta"),
    )


def media_metadata(df_with_payload: DataFrame) -> DataFrame:
    """Flat metadata projection (oracle-checkable: octet_length + md5
    are portable)."""
    return df_with_payload.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.payload_md5").alias("payload_md5"),
    )


FRAME_BYTES = 64          # stand-in frame size (a real video frame is KBs)
FRAME_SAMPLE_EVERY = 4    # keep every 4th frame

FRAME_SAMPLE_SCHEMA = (
    "doc_id bigint, n_frames bigint, n_sampled bigint, sampled_md5 string"
)


def frame_sample(
    df: DataFrame,
    frame_bytes: int = FRAME_BYTES,
    every: int = FRAME_SAMPLE_EVERY,
) -> DataFrame:
    """Video-style frame sampling over the opaque payload: treat the
    payload as a sequence of fixed-size frames, keep every ``every``-th
    frame (starting at frame 0), and emit per-doc frame counts plus an
    md5 digest of the sampled stream — the decode-free stand-in for
    "sample k fps and fingerprint the result".

    Arrow-batched ``mapInPandas`` like the decode stub (a real
    implementation swaps the byte slicing for an ``av``/ffmpeg frame
    iterator; batch shape, schema contract, and parallelism stay as
    tested). The digest is defined over the UPPERCASE HEX rendering of
    the sampled bytes, which both Spark/Python and the DuckDB oracle
    can produce byte-identically.
    """
    from mongo2pq_spark.deploy import ensure_shipped

    ensure_shipped(df.sparkSession)
    hex_per_frame = frame_bytes * 2

    def sample_batches(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "n_frames": [], "n_sampled": [], "sampled_md5": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload or b"")
                hexstr = data.hex().upper()
                n_frames = (len(data) + frame_bytes - 1) // frame_bytes
                sampled_idx = range(0, n_frames, every)
                sampled_hex = "".join(
                    hexstr[i * hex_per_frame : (i + 1) * hex_per_frame]
                    for i in sampled_idx
                )
                out["doc_id"].append(doc_id)
                out["n_frames"].append(n_frames)
                out["n_sampled"].append(len(list(sampled_idx)))
                out["sampled_md5"].append(
                    hashlib.md5(sampled_hex.encode()).hexdigest()
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(sample_batches, FRAME_SAMPLE_SCHEMA)


# --------------------------------------------------------------- PNG
# A REAL pixel codec in pure stdlib (zlib) + numpy — no PIL/codec
# libraries. This retires the "pixel decode is stubbed" caveat for
# PNG: 8-bit non-interlaced gray/gray+alpha/RGB/RGBA, all five scanline
# filters. It is a REFERENCE decoder (per-byte unfiltering loops for
# the left-dependent filters) — correctness over throughput; a
# production deployment swaps in a codec library behind the same
# function contract, exactly as documented for the other modalities.

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_PNG_COLOR_TYPE = {v: k for k, v in _PNG_CHANNELS.items()}


def encode_png(arr) -> bytes:
    """Minimal PNG writer (filter 0 scanlines): h×w×c uint8 array,
    c ∈ {1, 2, 3, 4} → standards-compliant non-interlaced PNG bytes."""
    import struct
    import zlib

    import numpy as np

    arr = np.ascontiguousarray(arr, dtype="uint8")
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3:
        raise ValueError(f"expected h×w or h×w×c array, got shape {arr.shape}")
    h, w, c = arr.shape
    if c not in _PNG_COLOR_TYPE:
        raise ValueError(f"unsupported channel count {c} (want 1, 2, 3, or 4)")
    color = _PNG_COLOR_TYPE[c]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def encode_png_variant(
    samples,
    depth: int = 8,
    color: int = 0,
    palette=None,
    interlace: int = 0,
) -> bytes:
    """Variant-space PNG writer (fixture side): grayscale at depths
    1/2/4/8/16, palette (color 3, ``palette`` is an n×3 uint8 array
    written as PLTE) at 1/2/4/8, RGB / gray+alpha / RGBA at 8/16,
    optionally Adam7-interlaced. Filter-0 scanlines throughout —
    the non-zero filters are exercised through the baseline
    ``encode_png`` path and dedicated unit fixtures. ``samples`` is
    h×w (one sample per pixel: gray or palette indices) or h×w×n,
    raw sample values (no scaling)."""
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(samples)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nsamp = arr.shape
    if color not in _PNG_LEGAL_DEPTHS or depth not in _PNG_LEGAL_DEPTHS[color]:
        raise ValueError(
            f"spec-illegal depth/color combination "
            f"(depth={depth}, color={color})"
        )
    if nsamp != _PNG_SAMPLES[color]:
        raise ValueError(
            f"color type {color} needs {_PNG_SAMPLES[color]} "
            f"sample(s)/pixel, got {nsamp}"
        )
    if int(arr.max(initial=0)) >= (1 << depth):
        raise ValueError(f"sample value out of range for depth {depth}")

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    def pack_row(vals) -> bytes:
        if depth == 8:
            return vals.astype("uint8").tobytes()
        if depth == 16:
            return vals.astype(">u2").tobytes()
        bits = (
            (vals.astype("uint8")[:, None]
             >> np.arange(depth - 1, -1, -1)) & 1
        ).reshape(-1)
        pad = (-len(bits)) % 8
        if pad:
            bits = np.concatenate([bits, np.zeros(pad, dtype="uint8")])
        return np.packbits(bits).tobytes()

    passes = _ADAM7 if interlace == 1 else ((0, 0, 1, 1),)
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        for yy in range(ph):
            row = arr[y0 + yy * dy, x0::dx].reshape(-1)
            raw += b"\x00" + pack_row(row)
    out = PNG_MAGIC + chunk(
        b"IHDR",
        struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace),
    )
    if color == 3:
        pal = np.ascontiguousarray(palette, dtype="uint8")
        if pal.ndim != 2 or pal.shape[1] != 3:
            raise ValueError("palette must be an n×3 uint8 array")
        out += chunk(b"PLTE", pal.tobytes())
    return out + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(
        b"IEND", b""
    )


# samples per pixel by color type (palette pixels are ONE index
# sample; the RGB expansion happens after unfiltering)
_PNG_SAMPLES = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# legal bit depths per color type, straight from the PNG spec's
# IHDR table — anything outside this is an ILLEGAL file (ValueError),
# and everything inside it now decodes (r17: no NotImplementedError
# left in the PNG path)
_PNG_LEGAL_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}
# Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter_line(f, line, prev, bpp):
    """Reverse one scanline's filter in place (byte-wise per the
    spec; ``bpp`` is the filter's byte distance — ceil is NOT used:
    sub-byte depths filter at distance 1)."""
    import numpy as np

    stride = len(line)
    if f == 1:  # Sub
        for i in range(bpp, stride):
            line[i] = (line[i] + line[i - bpp]) & 0xFF
    elif f == 2:  # Up — no intra-row dependency, so vectorize
        line[:] = (
            (
                np.frombuffer(bytes(line), dtype="uint8").astype("uint16")
                + np.frombuffer(bytes(prev), dtype="uint8")
            )
            & 0xFF
        ).astype("uint8").tobytes()
    elif f == 3:  # Average
        for i in range(stride):
            left = line[i - bpp] if i >= bpp else 0
            line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
    elif f == 4:  # Paeth
        for i in range(stride):
            a = line[i - bpp] if i >= bpp else 0
            b = prev[i]
            cc = prev[i - bpp] if i >= bpp else 0
            p = a + b - cc
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
            if pa <= pb and pa <= pc:
                pred = a
            elif pb <= pc:
                pred = b
            else:
                pred = cc
            line[i] = (line[i] + pred) & 0xFF
    elif f != 0:
        raise ValueError(f"unknown PNG filter {f}")


def _png_expand_samples(line: bytes, n_samples: int, depth: int):
    """Unpack one unfiltered scanline's bytes into its first
    ``n_samples`` sample values (MSB-first bit packing per the spec;
    16-bit samples are big-endian)."""
    import numpy as np

    if depth == 8:
        return np.frombuffer(line, dtype="uint8")[:n_samples]
    if depth == 16:
        return np.frombuffer(line, dtype=">u2")[:n_samples].astype("uint16")
    bits = np.unpackbits(np.frombuffer(line, dtype="uint8"))
    groups = bits[: (len(bits) // depth) * depth].reshape(-1, depth)
    weights = 1 << np.arange(depth - 1, -1, -1)
    return (groups * weights).sum(axis=1).astype("uint8")[:n_samples]


def decode_png_pixels(payload: bytes):
    """Decode a PNG to ``(height, width, channels, ndarray)``.

    r17: the FULL legal variant space — color types 0/2/3/4/6 at
    every bit depth the spec allows for each (1/2/4/8/16), palette
    expansion through PLTE, Adam7 interlacing, and all five scanline
    filters (byte-wise per spec, filter distance 1 for sub-byte
    depths). Output dtype is uint16 for 16-bit images, uint8
    otherwise; palette images return the looked-up h×w×3 RGB;
    sub-byte grayscale returns the RAW sample values (0..2^d-1,
    unscaled — consumers scale). Raises ``ValueError`` on non-PNG /
    corrupt / spec-illegal payloads — there is no
    ``NotImplementedError`` left in the PNG path."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    # truncated/corrupt streams must surface as the documented
    # ValueError, not leak struct.error/zlib.error past callers that
    # skip bad rows per the fail-loud contract
    try:
        pos, idat, ihdr, plte = 8, [], None, None
        while pos + 8 <= len(payload):
            (length,) = struct.unpack(">I", payload[pos:pos + 4])
            ctype = payload[pos + 4:pos + 8]
            data = payload[pos + 8:pos + 8 + length]
            pos += 12 + length
            if ctype == b"IHDR":
                ihdr = struct.unpack(">IIBBBBB", data)
            elif ctype == b"PLTE":
                plte = data
            elif ctype == b"IDAT":
                idat.append(data)
            elif ctype == b"IEND":
                break
    except struct.error as exc:
        raise ValueError(f"truncated PNG chunk stream: {exc}") from exc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if color not in _PNG_LEGAL_DEPTHS or depth not in _PNG_LEGAL_DEPTHS[color]:
        raise ValueError(
            f"spec-illegal PNG depth/color combination "
            f"(depth={depth}, color={color})"
        )
    if interlace not in (0, 1):
        raise ValueError(f"spec-illegal PNG interlace method {interlace}")
    if color == 3:
        if plte is None or len(plte) % 3 or not plte:
            raise ValueError("palette PNG missing a valid PLTE chunk")
    nsamp = _PNG_SAMPLES[color]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG IDAT stream: {exc}") from exc
    img = np.zeros(
        (h, w, nsamp), dtype="uint16" if depth == 16 else "uint8"
    )
    passes = _ADAM7 if interlace == 1 else ((0, 0, 1, 1),)
    bpp = max(1, (nsamp * depth) // 8)
    pos = 0
    for x0, y0, dx, dy in passes:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        stride = (pw * nsamp * depth + 7) // 8
        prev = bytearray(stride)
        xs = x0 + np.arange(pw) * dx
        for yy in range(ph):
            if pos + 1 + stride > len(raw):
                raise ValueError("PNG scanline stream has the wrong length")
            f = raw[pos]
            line = bytearray(raw[pos + 1:pos + 1 + stride])
            pos += 1 + stride
            _png_unfilter_line(f, line, prev, bpp)
            samples = _png_expand_samples(bytes(line), pw * nsamp, depth)
            img[y0 + yy * dy, xs] = samples.reshape(pw, nsamp)
            prev = line
    if pos != len(raw):
        raise ValueError("PNG scanline stream has the wrong length")
    if color == 3:
        pal = np.frombuffer(plte, dtype="uint8").reshape(-1, 3)
        idx = img[:, :, 0].astype("int64")
        if idx.max(initial=0) >= len(pal):
            raise ValueError("PNG palette index out of PLTE range")
        return h, w, 3, pal[idx]
    return h, w, nsamp, img


PNG_STATS_SCHEMA = (
    "doc_id bigint, width int, height int, channels int, "
    "pixel_sum bigint, n_pixels bigint"
)


def pixel_stats_with(
    decoder, df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched REAL pixel decode through any ``payload →
    (h, w, c, ndarray)`` decoder (PNG, baseline JPEG, or the magic-
    dispatching ``decode_image_pixels``), emitting exact integer pixel
    statistics per image — the scalars a DuckDB oracle can recompute
    from a deterministic pixel-generation rule, proving the
    encoder→decoder round trip end to end. Scale shape: map-only (no
    shuffle), cost ∝ total payload bytes."""
    from mongo2pq_spark.deploy import ensure_shipped

    ensure_shipped(df.sparkSession)

    def stat_batches(batches):
        import pandas as pd

        for pdf in batches:
            out = {
                "doc_id": [], "width": [], "height": [],
                "channels": [], "pixel_sum": [], "n_pixels": [],
            }
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                h, w, c, arr = decoder(bytes(payload))
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["pixel_sum"].append(int(arr.astype("int64").sum()))
                out["n_pixels"].append(arr.size)
            yield pd.DataFrame(out)

    return df.mapInPandas(stat_batches, PNG_STATS_SCHEMA)


def png_pixel_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    return pixel_stats_with(decode_png_pixels, df, id_col, payload_col)


def bmp_pixel_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    return pixel_stats_with(decode_bmp_pixels, df, id_col, payload_col)


# ------------------------------------------------ perceptual hashing
# Image NEAR-dedup on top of the real pixel codecs: a 60-bit dHash
# (difference hash) per image + the generic Hamming band blocking from
# operators/dedup.py. 60 bits (6×11 luma grid → 6×10 horizontal
# gradients) rather than the classic 64 keeps the fingerprint inside
# a signed int64 in BOTH engines (the SIMHASH_BITS rationale: DuckDB
# refuses 1<<63) and divides exactly into 4 pigeonhole bands.

DHASH_ROWS, DHASH_COLS = 6, 11


def cell_slices(h: int, w: int, rows: int, cols: int):
    """The clamped integer-bin-edge cell lattice shared by the dHash
    resampler and ``image_cell_sums``: yields ``(y, x, yslice,
    xslice)`` per cell. Edges are ``i·extent // bins``; a bin that
    would be empty (image smaller than the lattice) is clamped to one
    pixel, so every cell is non-empty and cells of an evenly divisible
    image exactly partition it."""
    ys = [(i * h) // rows for i in range(rows + 1)]
    xs = [(i * w) // cols for i in range(cols + 1)]
    for y in range(rows):
        for x in range(cols):
            yield (
                y,
                x,
                slice(ys[y], max(ys[y + 1], ys[y] + 1)),
                slice(xs[x], max(xs[x + 1], xs[x] + 1)),
            )


def decode_image_pixels(payload: bytes):
    """Magic-dispatched pixel decode: PNG, JPEG (baseline or
    progressive), uncompressed 24-bit BMP, or GIF (LZW, r17) → the
    codecs' ``(h, w, c, uint8 ndarray)`` contract; ``ValueError`` on
    anything else (the fail-loud contract shared by all four
    codecs)."""
    from mongo2pq_spark.operators.jpeg import JPEG_MAGIC, decode_jpeg_pixels

    if payload[:8] == PNG_MAGIC:
        return decode_png_pixels(payload)
    if payload[:2] == JPEG_MAGIC:
        return decode_jpeg_pixels(payload)
    if payload[:2] == BMP_MAGIC:
        return decode_bmp_pixels(payload)
    if payload[:6] in GIF_MAGICS:
        return decode_gif_pixels(payload)
    from mongo2pq_spark.operators.tiff import TIFF_MAGICS, decode_tiff_pixels

    if payload[:4] in TIFF_MAGICS:
        return decode_tiff_pixels(payload)
    raise ValueError(
        "unrecognized image payload (PNG, JPEG, BMP, GIF, or TIFF)"
    )


def dhash_bits(arr) -> int:
    """60-bit dHash of an ``(h, w, c)`` uint8 pixel array: luma →
    area-mean resample to a 6×11 grid → bit (y·10+x) set iff
    grid[y, x+1] > grid[y, x]. Deterministic pure math; for an input
    already sized 6×11 the resample is the identity, which is what
    lets a SQL oracle recompute the hash from a closed-form pixel
    rule."""
    import numpy as np

    a = arr.astype(np.float64)
    c = a.shape[2]
    if c >= 3:
        gray = 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]
    else:
        gray = a[:, :, 0]  # gray / gray+alpha: luma IS channel 0
    h, w = gray.shape
    grid = np.empty((DHASH_ROWS, DHASH_COLS))
    for y, x, ysl, xsl in cell_slices(h, w, DHASH_ROWS, DHASH_COLS):
        grid[y, x] = gray[ysl, xsl].mean()
    bits = 0
    for y in range(DHASH_ROWS):
        for x in range(DHASH_COLS - 1):
            if grid[y, x + 1] > grid[y, x]:
                bits |= 1 << (y * (DHASH_COLS - 1) + x)
    return bits


IMAGE_DHASH_SCHEMA = "doc_id bigint, dhash bigint"


def image_dhash(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched perceptual fingerprint: mapInPandas decoding each
    PNG/JPEG payload through the REAL codecs and emitting its 60-bit
    dHash. Map-only (no shuffle), cost ∝ total payload bytes; feed the
    result to ``operators.dedup.hamming_near_pairs`` for banded image
    near-dedup — byte-level dedup misses re-encoded/brightness-shifted
    copies, which is exactly what a gradient hash survives."""
    from mongo2pq_spark.deploy import ensure_shipped

    ensure_shipped(df.sparkSession)

    def hash_batches(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "dhash": [
                        dhash_bits(decode_image_pixels(bytes(p))[3])
                        for p in pdf[payload_col]
                    ],
                }
            )

    return df.mapInPandas(hash_batches, IMAGE_DHASH_SCHEMA)


IMAGE_CELL_SCHEMA = (
    "doc_id bigint, cell_y int, cell_x int, n_px bigint, px_sum bigint"
)


def image_cell_sums(
    df: DataFrame,
    rows: int = 2,
    cols: int = 2,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL image feature extraction / resize over the pixel codecs:
    decode each PNG/JPEG payload, partition its pixel grid into a
    ``rows×cols`` cell lattice (integer bin edges — the same area
    binning the dHash resampler uses), and emit one row per cell with
    the EXACT integer pixel count and pixel-value sum (summed across
    channels, so the statistic is modality-agnostic and engine-exact;
    a mean-pooled feature vector is ``px_sum / n_px`` downstream, and
    a downscaled image is exactly these cells). Long format — (doc,
    cell_y, cell_x) rows — keeps the output SQL-mirrorable and free of
    array columns. Map-only; cost ∝ total payload bytes."""
    from mongo2pq_spark.deploy import ensure_shipped

    ensure_shipped(df.sparkSession)

    def cell_batches(batches):
        import pandas as pd

        for pdf in batches:
            out = {
                "doc_id": [], "cell_y": [], "cell_x": [],
                "n_px": [], "px_sum": [],
            }
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                h, w, c, arr = decode_image_pixels(bytes(payload))
                a = arr.astype("int64")
                for y, x, ysl, xsl in cell_slices(h, w, rows, cols):
                    cell = a[ysl, xsl]
                    out["doc_id"].append(doc_id)
                    out["cell_y"].append(y)
                    out["cell_x"].append(x)
                    out["n_px"].append(cell.size)
                    out["px_sum"].append(int(cell.sum()))
            yield pd.DataFrame(out)

    return df.mapInPandas(cell_batches, IMAGE_CELL_SCHEMA)


PHASH_SIZE = 32          # resample grid for the DCT
PHASH_BITS = 60          # zigzag AC coefficients kept (int64-safe)


def _dct_mat(n: int):
    """Orthonormal DCT-II basis matrix (the jpeg codec's 8×8
    ``_dct_matrix`` generalized to any size). Memoized: phash_bits
    runs once per IMAGE inside mapInPandas — rebuilding a constant
    1024-entry basis per row would be pure per-row recomputation."""
    import numpy as np

    cached = _DCT_CACHE.get(n)
    if cached is not None:
        return cached

    m = np.empty((n, n))
    m[0, :] = 1.0 / np.sqrt(n)
    for u in range(1, n):
        for x in range(n):
            m[u, x] = np.sqrt(2.0 / n) * np.cos(
                (2 * x + 1) * u * np.pi / (2 * n)
            )
    _DCT_CACHE[n] = m
    return m


_DCT_CACHE: dict = {}
_ZIGZAG_CACHE: dict = {}


def _zigzag_indices(n: int, count: int) -> list[tuple[int, int]]:
    """First ``count`` (u, v) positions of an n×n block in JPEG zigzag
    order, EXCLUDING the DC term at (0, 0). Memoized like _dct_mat."""
    key = (n, count)
    cached = _ZIGZAG_CACHE.get(key)
    if cached is None:
        order = sorted(
            ((u, v) for u in range(n) for v in range(n)),
            key=lambda t: (t[0] + t[1], t[1] if (t[0] + t[1]) % 2 else t[0]),
        )
        cached = _ZIGZAG_CACHE[key] = order[1:count + 1]
    return cached


def phash_bits(arr) -> int:
    """60-bit pHash of an ``(h, w, c)`` uint8 pixel array: luma →
    area-mean resample to 32×32 → 2-D orthonormal DCT-II → the first
    60 AC coefficients in zigzag order → bit k set iff coefficient k
    exceeds the median of those 60.

    dHash compares NEIGHBORING cells, so localized edits flip
    localized bits; pHash thresholds GLOBAL low-frequency structure
    against its own median, so high-frequency noise (re-compression
    artifacts, dithering) leaves the hash nearly untouched while a
    structural change (e.g. inversion: every AC coefficient and the
    median negate, flipping strict relations) moves many bits at
    once. Both fingerprints feed the same 60-bit Hamming banding."""
    import numpy as np

    a = arr.astype(np.float64)
    c = a.shape[2]
    if c >= 3:
        gray = 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]
    else:
        gray = a[:, :, 0]
    h, w = gray.shape
    n = PHASH_SIZE
    grid = np.empty((n, n))
    for y, x, ysl, xsl in cell_slices(h, w, n, n):
        grid[y, x] = gray[ysl, xsl].mean()
    m = _dct_mat(n)
    coeffs = m @ grid @ m.T
    ac = np.array([coeffs[u, v] for u, v in _zigzag_indices(n, PHASH_BITS)])
    med = float(np.median(ac))
    bits = 0
    for k, v in enumerate(ac):
        if v > med:
            bits |= 1 << k
    return bits


IMAGE_PHASH_SCHEMA = "doc_id bigint, phash bigint"


def image_phash(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched DCT perceptual fingerprint through the REAL
    PNG/JPEG codecs — the frequency-domain companion to
    ``image_dhash`` (same 60-bit width, same Hamming banding
    downstream). Map-only, cost ∝ total payload bytes."""
    from mongo2pq_spark.deploy import ensure_shipped

    ensure_shipped(df.sparkSession)

    def hash_batches(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "phash": [
                        phash_bits(decode_image_pixels(bytes(p))[3])
                        for p in pdf[payload_col]
                    ],
                }
            )

    return df.mapInPandas(hash_batches, IMAGE_PHASH_SCHEMA)


BMP_MAGIC = b"BM"


def encode_bmp(arr) -> bytes:
    """Minimal BMP writer: h×w×3 uint8 RGB → uncompressed 24-bit
    BI_RGB Windows bitmap (BITMAPINFOHEADER, bottom-up rows, BGR byte
    order, rows padded to 4-byte boundaries — the three quirks that
    make BMP a real format rather than a raw dump)."""
    import struct

    import numpy as np

    arr = np.ascontiguousarray(arr, dtype="uint8")
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected h×w×3 RGB array, got {arr.shape}")
    h, w, _ = arr.shape
    row_len = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        bgr = arr[y, :, ::-1].tobytes()  # BGR
        body += bgr + bytes(row_len - len(bgr))
    header_size = 14 + 40
    return (
        BMP_MAGIC
        + struct.pack("<IHHI", header_size + len(body), 0, 0, header_size)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
        + bytes(body)
    )


def encode_bmp_variant(
    samples,
    bpp: int,
    palette=None,
    rle: bool = False,
    bitfields=None,
) -> bytes:
    """Variant-space BMP writer (fixture side): paletted 1/4/8-bit
    (``samples`` = h×w indices, ``palette`` n×3 RGB written as BGRX
    quads), optionally RLE8/RLE4-compressed (run-length per row,
    end-of-line/end-of-bitmap escapes; absolute/delta modes are
    exercised by hand-built unit fixtures), 16-bit X1R5G5B5
    (``samples`` = h×w×3 with 5-bit channel values), or 32-bit BGRX
    (``samples`` = h×w×3 8-bit RGB). r17: ``bitfields=(rm, gm, bm)``
    writes a BI_BITFIELDS 16-bit file (e.g. the R5G6B5 masks) with
    ``samples`` = h×w×3 raw channel values fitting each mask width.
    Bottom-up rows throughout."""
    import struct

    import numpy as np

    arr = np.asarray(samples)
    if bpp in (1, 4, 8):
        if palette is None or arr.ndim != 2:
            raise ValueError("paletted BMP needs h×w indices + palette")
        h, w = arr.shape
        pal = np.ascontiguousarray(palette, dtype="uint8")
        if int(arr.max(initial=0)) >= len(pal):
            raise ValueError("index out of palette range")
        quads = np.zeros((len(pal), 4), dtype="uint8")
        quads[:, :3] = pal[:, ::-1]  # RGB -> BGRX
        pal_bytes = quads.tobytes()
        if rle:
            if bpp not in (4, 8):
                raise ValueError("RLE needs 4 or 8 bpp")
            body = bytearray()
            for y in range(h - 1, -1, -1):  # bottom-up
                x = 0
                row = arr[y]
                while x < w:
                    v = int(row[x])
                    n = 1
                    while x + n < w and row[x + n] == v and n < 255:
                        n += 1
                    byte = v if bpp == 8 else (v << 4) | v
                    body += bytes([n, byte])
                    x += n
                body += b"\x00\x00"  # end of line
            body[-2:] = b"\x00\x01"  # end of bitmap
            compression = 1 if bpp == 8 else 2
        else:
            row_len = ((w * bpp + 31) // 32) * 4
            body = bytearray()
            for y in range(h - 1, -1, -1):
                if bpp == 8:
                    raw = arr[y].astype("uint8").tobytes()
                else:
                    bits = (
                        (arr[y].astype("uint8")[:, None]
                         >> np.arange(bpp - 1, -1, -1)) & 1
                    ).reshape(-1)
                    pad = (-len(bits)) % 8
                    if pad:
                        bits = np.concatenate(
                            [bits, np.zeros(pad, dtype="uint8")]
                        )
                    raw = np.packbits(bits).tobytes()
                body += raw + bytes(row_len - len(raw))
            compression = 0
    elif bpp == 16:
        if arr.ndim != 3 or arr.shape[2] != 3:
            raise ValueError("16-bit BMP needs h×w×3 channel values")
        h, w = arr.shape[:2]
        pal_bytes = b""
        if bitfields is not None:
            v = np.zeros((h, w), dtype="uint16")
            for k, m in enumerate(bitfields):
                sh = (m & -m).bit_length() - 1
                wdt = (m >> sh).bit_length()
                ch = arr[:, :, k].astype("uint32")
                if int(ch.max(initial=0)) >= (1 << wdt):
                    raise ValueError(
                        f"channel {k} exceeds its {wdt}-bit mask"
                    )
                v |= (ch << sh).astype("uint16")
            compression = 3
        else:
            if int(arr.max(initial=0)) >= 32:
                raise ValueError(
                    "16-bit BMP channels are 5-bit (0..31)"
                )
            v = (
                (arr[:, :, 0].astype("uint16") << 10)
                | (arr[:, :, 1].astype("uint16") << 5)
                | arr[:, :, 2].astype("uint16")
            )
            compression = 0
        row_len = (w * 2 + 3) & ~3
        body = bytearray()
        for y in range(h - 1, -1, -1):
            raw = v[y].astype("<u2").tobytes()
            body += raw + bytes(row_len - len(raw))
    elif bpp == 32:
        if arr.ndim != 3 or arr.shape[2] != 3:
            raise ValueError("32-bit BMP needs h×w×3 RGB")
        h, w = arr.shape[:2]
        pal_bytes = b""
        body = bytearray()
        for y in range(h - 1, -1, -1):
            bgrx = np.zeros((w, 4), dtype="uint8")
            bgrx[:, :3] = arr[y, :, ::-1]
            body += bgrx.tobytes()
        compression = 0
    else:
        raise ValueError(f"unsupported fixture bpp {bpp}")
    mask_bytes = (
        struct.pack("<III", *bitfields) if compression == 3 else b""
    )
    data_offset = 14 + 40 + len(mask_bytes) + len(pal_bytes)
    n_colors = len(pal_bytes) // 4
    return (
        BMP_MAGIC
        + struct.pack(
            "<IHHI", data_offset + len(body), 0, 0, data_offset
        )
        + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, bpp, compression, len(body),
            2835, 2835, n_colors, 0,
        )
        + mask_bytes
        + pal_bytes
        + bytes(body)
    )


def _bmp_decode_rle(data: bytes, w: int, h: int, bpp: int):
    """Decode an RLE8/RLE4 pixel stream (bottom-up per spec) into an
    h×w index array. Handles encoded runs, absolute mode (word-
    padded), end-of-line (0,0), delta (0,2,dx,dy — skipped pixels
    stay 0 per spec), and end-of-bitmap (0,1)."""
    import numpy as np

    idx = np.zeros((h, w), dtype="uint8")
    x, row, pos = 0, 0, 0  # row counts from the BOTTOM scanline
    while pos + 1 < len(data):
        n, v = data[pos], data[pos + 1]
        pos += 2
        if n > 0:  # encoded run
            if bpp == 8:
                vals = [v] * n
            else:
                vals = [(v >> 4, v & 0xF)[i % 2] for i in range(n)]
            end = min(x + n, w)
            if row < h:
                idx[h - 1 - row, x:end] = vals[: end - x]
            x += n
        elif v == 0:  # end of line
            x, row = 0, row + 1
        elif v == 1:  # end of bitmap
            return idx
        elif v == 2:  # delta
            if pos + 1 >= len(data):
                raise ValueError("truncated BMP RLE delta")
            x += data[pos]
            row += data[pos + 1]
            pos += 2
        else:  # absolute mode: v literal pixels, word-aligned
            if bpp == 8:
                need = v
                raw = data[pos:pos + need]
                vals = list(raw)
            else:
                need = (v + 1) // 2
                raw = data[pos:pos + need]
                vals = []
                for b in raw:
                    vals += [b >> 4, b & 0xF]
                vals = vals[:v]
            if len(raw) < need:
                raise ValueError("truncated BMP RLE absolute run")
            pos += need + (need % 2)  # pad to 16-bit boundary
            end = min(x + v, w)
            if row < h:
                idx[h - 1 - row, x:end] = vals[: end - x]
            x += v
    raise ValueError("BMP RLE stream ended without end-of-bitmap")


def decode_bmp_pixels(payload: bytes):
    """Decode a Windows bitmap to the shared ``(h, w, c, uint8
    ndarray)`` codec contract (top-down RGB).

    r17: the full classic variant space — 24-bit BI_RGB (bottom-up
    AND top-down), 32-bit BI_RGB (BGRX, the padding byte dropped),
    16-bit X1R5G5B5 (channels expanded ``(v << 3) | (v >> 2)``),
    paletted 1/4/8-bit with BGRX color tables, RLE8/RLE4
    compression including absolute mode, deltas, and early
    end-of-bitmap, and BI_BITFIELDS 16/32-bit with explicit channel
    masks (the R5G6B5 shape; mask widths 4..8 expand by bit
    replication). ``ValueError`` on structural corruption; the one
    refusal left (``NotImplementedError``) is mask widths outside
    4..8 and PNG/JPEG-in-BMP."""
    import struct

    import numpy as np

    if payload[:2] != BMP_MAGIC:
        raise ValueError("not a BMP payload (no BM magic)")
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    data_offset = struct.unpack("<I", payload[10:14])[0]
    hsize, w, h_signed = struct.unpack("<Iii", payload[14:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    compression = struct.unpack("<I", payload[30:34])[0]
    colors_used = struct.unpack("<I", payload[46:50])[0]
    if hsize < 40:
        raise ValueError(f"BITMAPCOREHEADER ({hsize}) not supported")
    if compression not in (0, 1, 2, 3):
        raise NotImplementedError(
            f"BMP compression {compression} (PNG/JPEG-in-BMP) "
            "unsupported"
        )
    masks = None
    if compression == 3:
        if bpp not in (16, 32):
            raise ValueError(
                f"BI_BITFIELDS at {bpp} bpp is spec-illegal"
            )
        # masks: inside the header for V4+ (hsize >= 52), appended
        # right after a plain BITMAPINFOHEADER otherwise
        mask_at = 54 if hsize >= 52 else 14 + hsize
        if len(payload) < mask_at + 12:
            raise ValueError("truncated BI_BITFIELDS masks")
        masks = struct.unpack("<III", payload[mask_at:mask_at + 12])
        for m in masks:
            if m == 0:
                raise ValueError("BI_BITFIELDS zero channel mask")
            mm = m >> ((m & -m).bit_length() - 1)
            if mm & (mm + 1):
                raise ValueError(
                    "BI_BITFIELDS non-contiguous channel mask"
                )
            if not 4 <= mm.bit_length() <= 8:
                raise NotImplementedError(
                    "BI_BITFIELDS mask width outside 4..8 "
                    "(bit-replication expansion scope)"
                )
    if bpp not in (1, 4, 8, 16, 24, 32):
        raise ValueError(f"spec-illegal BMP bit depth {bpp}")
    if compression == 1 and bpp != 8 or compression == 2 and bpp != 4:
        if compression != 0:
            raise ValueError(
                f"spec-illegal BMP RLE{8 if compression == 1 else 4} "
                f"at {bpp} bpp"
            )
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    if w <= 0 or h <= 0:
        raise ValueError(f"bad BMP dimensions {w}x{h_signed}")
    if top_down and compression != 0:
        raise ValueError("top-down BMP cannot be RLE-compressed")

    if bpp <= 8:  # paletted: color table sits right after the header
        n_pal = colors_used or (1 << bpp)
        pal_off = 14 + hsize
        if len(payload) < pal_off + 4 * n_pal:
            raise ValueError("truncated BMP color table")
        pal = np.frombuffer(
            payload[pal_off:pal_off + 4 * n_pal], dtype="uint8"
        ).reshape(n_pal, 4)[:, [2, 1, 0]]  # BGRX -> RGB
        if compression:  # RLE8 / RLE4
            idx = _bmp_decode_rle(payload[data_offset:], w, h, bpp)
        else:
            row_len = ((w * bpp + 31) // 32) * 4
            if len(payload) < data_offset + row_len * h:
                raise ValueError("BMP pixel data truncated")
            idx = np.zeros((h, w), dtype="uint8")
            for i in range(h):
                y = i if top_down else h - 1 - i
                line = payload[
                    data_offset + y * row_len:
                    data_offset + y * row_len + row_len
                ]
                if bpp == 8:
                    idx[i] = np.frombuffer(line[:w], dtype="uint8")
                else:
                    bits = np.unpackbits(
                        np.frombuffer(line, dtype="uint8")
                    )
                    groups = bits[
                        : (len(bits) // bpp) * bpp
                    ].reshape(-1, bpp)
                    weights = 1 << np.arange(bpp - 1, -1, -1)
                    idx[i] = (groups * weights).sum(axis=1).astype(
                        "uint8"
                    )[:w]
        if int(idx.max(initial=0)) >= n_pal:
            raise ValueError("BMP palette index out of color-table range")
        return h, w, 3, pal[idx.astype("int64")]

    nbytes = bpp // 8
    row_len = (w * nbytes + 3) & ~3
    need = data_offset + row_len * h
    if len(payload) < need:
        raise ValueError(f"BMP pixel data truncated ({len(payload)} < {need})")
    rows = []
    for i in range(h):
        y = i if top_down else h - 1 - i
        start = data_offset + y * row_len
        line = payload[start:start + w * nbytes]
        if bpp == 24:
            row = np.frombuffer(line, dtype="uint8").reshape(w, 3)[:, ::-1]
        elif masks is not None:  # BI_BITFIELDS 16/32-bit
            v = np.frombuffer(
                line, dtype="<u2" if bpp == 16 else "<u4"
            ).astype("uint32")
            chans = []
            for m in masks:
                sh = (m & -m).bit_length() - 1
                wdt = (m >> sh).bit_length()
                c = (v & m) >> sh
                chans.append(
                    ((c << (8 - wdt)) | (c >> (2 * wdt - 8)))
                    .astype("uint8")
                )
            row = np.stack(chans, axis=1)
        elif bpp == 32:
            row = np.frombuffer(line, dtype="uint8").reshape(w, 4)[
                :, [2, 1, 0]
            ]
        else:  # 16-bit X1R5G5B5
            v = np.frombuffer(line, dtype="<u2").astype("uint16")
            r5 = (v >> 10) & 0x1F
            g5 = (v >> 5) & 0x1F
            b5 = v & 0x1F
            row = np.stack(
                [(c5 << 3) | (c5 >> 2) for c5 in (r5, g5, b5)], axis=1
            ).astype("uint8")
        rows.append(row)
    return h, w, 3, np.stack(rows, axis=0)


# ------------------------------------------------------------- ICO
# The favicon container (r17 session 2): an ICONDIR directory of
# images, each either a PNG (full file, magic-sniffed) or a BMP
# WITHOUT its file header whose BITMAPINFOHEADER declares DOUBLE
# height (XOR color plane + 1-bit AND transparency mask). A web
# crawl meets this format on effectively every host; the decode
# reuses the PNG/BMP codecs above, so the manifest's pixel sums
# prove real dispatch + decode per entry.

ICO_MAGIC = b"\x00\x00\x01\x00"


def build_ico_stub(entries: list[tuple]) -> bytes:
    """Fixture ICO: each entry is ``("png", h×w×3 rgb)``,
    ``("bmp24", h×w×3 rgb)``, or ``("bmp8", h×w indices, n×3
    palette)`` — PNG entries embedded whole, BMP entries written
    header-less with doubled height and an all-zero AND mask, per
    the ICO layout."""
    import struct

    import numpy as np

    blobs = []
    dims = []
    bitcounts = []
    for e in entries:
        kind, arr = e[0], np.asarray(e[1])
        if kind == "png":
            h, w = arr.shape[:2]
            blobs.append(encode_png(arr.astype("uint8")))
            bitcounts.append(32)
        elif kind == "bmp24":
            h, w = arr.shape[:2]
            row_len = (w * 3 + 3) & ~3
            xor = bytearray()
            for y in range(h - 1, -1, -1):
                bgr = arr[y, :, ::-1].astype("uint8").tobytes()
                xor += bgr + bytes(row_len - len(bgr))
            and_len = ((w + 31) // 32) * 4 * h
            blobs.append(
                struct.pack(
                    "<IiiHHIIiiII", 40, w, 2 * h, 1, 24, 0,
                    len(xor) + and_len, 0, 0, 0, 0,
                )
                + bytes(xor) + bytes(and_len)
            )
            bitcounts.append(24)
        elif kind == "bmp8":
            idx, pal = np.asarray(e[1]), np.asarray(e[2])
            h, w = idx.shape
            quads = np.zeros((len(pal), 4), dtype="uint8")
            quads[:, :3] = pal[:, ::-1].astype("uint8")
            row_len = (w + 3) & ~3
            xor = bytearray()
            for y in range(h - 1, -1, -1):
                raw = idx[y].astype("uint8").tobytes()
                xor += raw + bytes(row_len - len(raw))
            and_len = ((w + 31) // 32) * 4 * h
            blobs.append(
                struct.pack(
                    "<IiiHHIIiiII", 40, w, 2 * h, 1, 8, 0,
                    len(xor) + and_len, 0, 0, len(pal), 0,
                )
                + quads.tobytes() + bytes(xor) + bytes(and_len)
            )
            bitcounts.append(8)
        else:
            raise ValueError(f"unknown ICO fixture kind {kind!r}")
        dims.append((w, h))
    out = bytearray(ICO_MAGIC + struct.pack("<H", len(entries)))
    offset = 6 + 16 * len(entries)
    for (w, h), bc, blob in zip(dims, bitcounts, blobs):
        out += struct.pack(
            "<BBBBHHII",
            w if w < 256 else 0, h if h < 256 else 0, 0, 0,
            1, bc, len(blob), offset,
        )
        offset += len(blob)
    for blob in blobs:
        out += blob
    return bytes(out)


def parse_ico_entries(payload: bytes) -> list[dict]:
    """Walk an ICO directory and DECODE every image:
    ``{img_idx, fmt, width, height, bitcount, pixel_sum}`` — PNG
    entries through ``decode_png_pixels``, header-less BMP entries
    re-headered (height halved back; the AND mask beyond the XOR
    plane is transparency scope and is not applied) through
    ``decode_bmp_pixels``. Typed ``ValueError`` on structural
    corruption."""
    import struct

    if payload[:4] != ICO_MAGIC:
        raise ValueError("not an ICO payload")
    if len(payload) < 6:
        raise ValueError("truncated ICONDIR")
    (count,) = struct.unpack("<H", payload[4:6])
    if count == 0:
        raise ValueError("ICO declares zero images")
    out = []
    for i in range(count):
        at = 6 + 16 * i
        if at + 16 > len(payload):
            raise ValueError(f"truncated ICONDIRENTRY {i}")
        _w8, _h8, _colors, _res, _planes, bitcount, size, off = (
            struct.unpack("<BBBBHHII", payload[at:at + 16])
        )
        blob = payload[off:off + size]
        if len(blob) < size:
            raise ValueError(f"ICO image {i} beyond payload")
        if blob[:8] == PNG_MAGIC:
            h, w, c, arr = decode_png_pixels(blob)
            fmt = "png"
        else:
            if len(blob) < 40:
                raise ValueError(f"truncated ICO BMP header {i}")
            hsize, bw, bh2 = struct.unpack("<Iii", blob[:12])
            if hsize != 40:
                raise ValueError(
                    f"ICO BMP {i} header size {hsize} != 40"
                )
            if bh2 % 2:
                raise ValueError(
                    f"ICO BMP {i} height {bh2} not doubled"
                )
            fixed = bytearray(blob)
            struct.pack_into("<i", fixed, 8, bh2 // 2)
            bmp = (
                BMP_MAGIC
                + struct.pack("<IHHI", 14 + len(blob), 0, 0, 0)
                + bytes(fixed)
            )
            # data offset = file header + info header + color table
            bpp_i = struct.unpack("<H", blob[14:16])[0]
            n_pal = 0
            if bpp_i <= 8:
                (cu,) = struct.unpack("<I", blob[32:36])
                n_pal = cu or (1 << bpp_i)
            bmp = bytearray(bmp)
            struct.pack_into("<I", bmp, 10, 14 + 40 + 4 * n_pal)
            h, w, c, arr = decode_bmp_pixels(bytes(bmp))
            fmt = "bmp"
        out.append(
            {
                "img_idx": i,
                "fmt": fmt,
                "width": w,
                "height": h,
                "bitcount": bitcount,
                "pixel_sum": int(arr.astype("int64").sum()),
            }
        )
    return out


ICO_SCHEMA = (
    "doc_id bigint, img_idx int, fmt string, width int, height int, "
    "bitcount int, pixel_sum bigint"
)


def ico_manifest(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched ICO explode: one icon row → one row per
    directory entry, every entry DECODED (PNG or header-less BMP)
    with its exact pixel sum. Map-only."""
    from mongo2pq_spark.deploy import ensure_shipped

    ensure_shipped(df.sparkSession)

    def parse_batches(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                for rec in parse_ico_entries(bytes(payload)):
                    rec["doc_id"] = doc_id
                    rows.append(rec)
            yield pd.DataFrame(rows)

    return df.mapInPandas(parse_batches, ICO_SCHEMA)


GIF_MAGICS = (b"GIF87a", b"GIF89a")


def build_gif_stub(
    width: int,
    height: int,
    n_frames: int,
    loop: bool = False,
    gct_bits: int = 2,
) -> bytes:
    """Structurally real GIF: header + logical screen descriptor +
    global color table + optional NETSCAPE loop extension + per frame
    (graphic control extension + image descriptor + minimal LZW data
    stream as length-prefixed sub-blocks) + trailer. The LZW payload
    is opaque filler — frame counting must WALK the sub-block chain,
    it cannot scan for markers (0x2C legally occurs inside data)."""
    import struct

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | (gct_bits - 1), 0, 0])  # GCT flag + sizes
    out += bytes(3 * (1 << gct_bits))            # global color table
    if loop:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for i in range(n_frames):
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", 10 * (i + 1))
        out += b"\x00\x00"                       # GCE: delay, no key
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
        out += b"\x00"                           # no local color table
        out += bytes([2])                        # LZW min code size
        # filler data containing the 0x2C descriptor byte ON PURPOSE
        data = bytes([0x2C, 0x21, 0x3B, 0xFF] * 3)
        out += bytes([len(data)]) + data + b"\x00"
    out += b"\x3b"
    return bytes(out)


def parse_gif_metadata(payload: bytes) -> dict:
    """GIF triage: ``{version, width, height, n_frames, animated,
    loop_forever, duration_cs}`` — the pre-decode filter for a GIF
    corpus (static-vs-animated routing, duration windows). Frames
    are counted by WALKING the length-prefixed sub-block chains —
    no pixel decode needed for triage; ``decode_gif_pixels`` (r17)
    does the real LZW decode when pixels are wanted. ``ValueError``
    on structural corruption."""
    import struct

    if payload[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF payload")
    version = payload[3:6].decode("latin-1")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    width, height = struct.unpack("<HH", payload[6:10])
    flags = payload[10]
    pos = 13
    if flags & 0x80:
        pos += 3 * (1 << ((flags & 0x7) + 1))
    n_frames = 0
    duration_cs = 0
    loop_forever = False
    pending_delay = 0

    def skip_subblocks(p: int) -> int:
        while True:
            if p >= len(payload):
                raise ValueError("truncated GIF sub-block chain")
            n = payload[p]
            p += 1
            if n == 0:
                return p
            p += n

    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            if pos + 2 > len(payload):
                raise ValueError("truncated GIF extension")
            label = payload[pos + 1]
            p = pos + 2
            if label == 0xF9 and payload[p] >= 4:
                pending_delay = struct.unpack(
                    "<H", payload[p + 2:p + 4]
                )[0]
            if label == 0xFF and payload[p] == 11 and payload[
                p + 1:p + 12
            ] == b"NETSCAPE2.0":
                loop_forever = True
            pos = skip_subblocks(p)
        elif b == 0x2C:  # image descriptor
            if pos + 10 > len(payload):
                raise ValueError("truncated GIF image descriptor")
            lflags = payload[pos + 9]
            pos += 10
            if lflags & 0x80:
                pos += 3 * (1 << ((lflags & 0x7) + 1))
            pos += 1  # LZW minimum code size
            pos = skip_subblocks(pos)
            n_frames += 1
            duration_cs += pending_delay
            pending_delay = 0
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x} at {pos}")
    else:
        raise ValueError("GIF missing trailer")
    if n_frames == 0:
        raise ValueError("GIF contains no image frames")
    return {
        "version": version,
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "animated": n_frames > 1,
        "loop_forever": loop_forever,
        "duration_cs": duration_cs,
    }


def _gif_lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW encode: variable 3..12-bit codes, LSB-first
    bit packing, leading CLEAR, trailing EOI, table reset via CLEAR
    when the 4096-entry dictionary fills. The width grows one step
    LATER than the encoder's own table size suggests (at next ==
    2^width + 1) because the decoder's dictionary lags one entry."""
    clear = 1 << min_code_size
    eoi = clear + 1
    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh():
        return (
            {bytes([i]): i for i in range(clear)},
            eoi + 1,
            min_code_size + 1,
        )

    table, next_code, width = fresh()
    emit(clear, width)
    prefix = b""
    for b in bytes(indices):
        if b >= clear:
            raise ValueError(
                f"index {b} outside the {clear}-color palette"
            )
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) + 1:
            if width < 12:
                width += 1
            else:
                emit(clear, width)
                table, next_code, width = fresh()
        prefix = bytes([b])
    if prefix:
        emit(table[prefix], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """GIF-variant LZW decode (the stub retired in r17): mirrors the
    encoder above / giflib semantics — width grows at next == 2^width,
    KwKwK special case, CLEAR resets, adds stop at 4096. Typed
    ``ValueError`` on out-of-range codes, truncation, or pixel-count
    mismatch."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    ended = False

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev = None

    reset()
    while not ended:
        while nbits < width:
            if pos >= len(data):
                raise ValueError(
                    "truncated GIF LZW stream (no EOI code)"
                )
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            reset()
            continue
        if code == eoi:
            ended = True
            break
        if prev is None:
            if code >= clear:
                raise ValueError(
                    f"first GIF code after clear is {code} (not a "
                    "root)"
                )
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(
                f"GIF code {code} beyond dictionary size {len(table)}"
            )
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) > n_pixels:
            raise ValueError(
                f"GIF LZW stream decodes {len(out)}+ pixels for a "
                f"{n_pixels}-pixel frame"
            )
    if len(out) != n_pixels:
        raise ValueError(
            f"GIF LZW stream decodes {len(out)} pixels, frame "
            f"declares {n_pixels}"
        )
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def build_gif_pixels(
    indices,
    palette,
    interlace: bool = False,
    trailing_frames: int = 0,
    screen: tuple[int, int] | None = None,
    offset: tuple[int, int] = (0, 0),
    background: int = 0,
) -> bytes:
    """Fixture writer with REAL pixel data: single-frame GIF89a from
    an (h, w) uint8 index array and an RGB palette (padded to the
    next power of two), real LZW data stream, optional interlaced
    row order, optional opaque trailing animation frames (decode
    reads the FIRST frame; metadata still counts them all). r17:
    ``screen=(sw, sh)`` + ``offset=(left, top)`` place the frame on
    a larger logical screen whose ``background`` color index fills
    the uncovered area (the banner/sprite shape real GIFs use)."""
    import struct

    import numpy as np

    idx = np.ascontiguousarray(indices, dtype="uint8")
    h, w = idx.shape
    n = max(2, len(palette))
    bits = max(2, (n - 1).bit_length())
    size = 1 << bits
    if idx.size and int(idx.max()) >= len(palette):
        raise ValueError("index outside the palette")
    left, top = offset
    sw, sh = screen if screen is not None else (left + w, top + h)
    if left + w > sw or top + h > sh:
        raise ValueError("GIF frame exceeds the logical screen")
    pal = bytearray()
    for r, g, b in palette:
        pal += bytes([r, g, b])
    pal += bytes(3 * (size - len(palette)))

    if interlace:
        rows = []
        for start, step in _GIF_INTERLACE_PASSES:
            rows.extend(range(start, h, step))
        stream = idx[rows].tobytes()
    else:
        stream = idx.tobytes()
    min_code = max(2, bits)
    lzw = _gif_lzw_encode(stream, min_code)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", sw, sh)
    out += bytes([0x80 | ((bits - 1) << 4) | (bits - 1), background, 0])
    out += pal
    out += b"\x2c" + struct.pack("<HHHH", left, top, w, h)
    out += bytes([0x40 if interlace else 0x00])
    out += bytes([min_code])
    for off in range(0, len(lzw), 255):
        piece = lzw[off:off + 255]
        out += bytes([len(piece)]) + piece
    out += b"\x00"
    for i in range(trailing_frames):
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", 5) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
        out += bytes([0x00, min_code])
        for off in range(0, len(lzw), 255):
            piece = lzw[off:off + 255]
            out += bytes([len(piece)]) + piece
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def decode_gif_pixels(payload: bytes):
    """Decode a GIF's FIRST frame to ``(height, width, 3, uint8
    ndarray)`` — real LZW decode (r17; the last library-free image
    stub retired): global or local color table, interlaced row
    reordering, sub-block reassembly. Animated files decode frame 0
    (the triage contract — MULTI-frame compositing is animation
    territory); a first frame smaller than the logical screen is
    composited onto a background-color canvas at its (left, top)
    offset per spec (r17 session 2 — retires the sub-frame
    refusal; background defaults to black when the header names no
    global color table). ``ValueError`` on structural corruption —
    the PNG/JPEG/BMP contract."""
    import struct

    import numpy as np

    if payload[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    sw, sh = struct.unpack("<HH", payload[6:10])
    flags = payload[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 1 << ((flags & 0x7) + 1)
        gct = payload[pos:pos + 3 * n]
        if len(gct) < 3 * n:
            raise ValueError("truncated global color table")
        pos += 3 * n

    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:
            raise ValueError("GIF contains no image frames")
        if b == 0x21:  # extensions: skip
            p = pos + 2
            while True:
                if p >= len(payload):
                    raise ValueError("truncated GIF sub-block chain")
                n = payload[p]
                p += 1
                if n == 0:
                    break
                p += n
            pos = p
            continue
        if b != 0x2C:
            raise ValueError(f"unknown GIF block 0x{b:02x} at {pos}")
        if pos + 11 > len(payload):
            raise ValueError("truncated GIF image descriptor")
        left, top, w, h = struct.unpack("<HHHH", payload[pos + 1:pos + 9])
        lflags = payload[pos + 9]
        pos += 10
        pal = gct
        if lflags & 0x80:
            n = 1 << ((lflags & 0x7) + 1)
            pal = payload[pos:pos + 3 * n]
            if len(pal) < 3 * n:
                raise ValueError("truncated local color table")
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF frame has no color table")
        if left + w > sw or top + h > sh:
            raise ValueError(
                "GIF frame exceeds the logical screen bounds"
            )
        min_code = payload[pos]
        pos += 1
        data = bytearray()
        while True:
            if pos >= len(payload):
                raise ValueError("truncated GIF image data")
            n = payload[pos]
            pos += 1
            if n == 0:
                break
            data += payload[pos:pos + n]
            pos += n
        stream = _gif_lzw_decode(bytes(data), min_code, w * h)
        idx = np.frombuffer(stream, dtype="uint8")
        if lflags & 0x40:  # interlaced: undo the four-pass order
            rows = []
            for start, step in _GIF_INTERLACE_PASSES:
                rows.extend(range(start, h, step))
            laced = idx.reshape(h, w)
            out_idx = np.empty((h, w), dtype="uint8")
            out_idx[rows] = laced
            idx = out_idx.reshape(-1)
        table = np.frombuffer(pal, dtype="uint8").reshape(-1, 3)
        if int(idx.max(initial=0)) >= table.shape[0]:
            raise ValueError("GIF index outside the color table")
        rgb = table[idx].reshape(h, w, 3)
        if (left, top, w, h) != (0, 0, sw, sh):
            # sub-frame: composite onto the background-color canvas
            # (header byte 11 indexes the GLOBAL table; black when
            # there is none or the index runs past it)
            bg_idx = payload[11]
            if gct is not None and 3 * bg_idx + 3 <= len(gct):
                bg = np.frombuffer(
                    gct[3 * bg_idx:3 * bg_idx + 3], dtype="uint8"
                )
            else:
                bg = np.zeros(3, dtype="uint8")
            canvas = np.broadcast_to(
                bg, (sh, sw, 3)
            ).copy()
            canvas[top:top + h, left:left + w] = rgb
            return sh, sw, 3, canvas
        return h, w, 3, rgb
    raise ValueError("GIF missing trailer")


def build_webp_stub(
    width: int,
    height: int,
    variant: str = "lossy",
    alpha: bool = False,
    n_anim_frames: int = 0,
    payload_fill: int = 24,
) -> bytes:
    """Structurally real WEBP fixture: RIFF/WEBP container with a
    real bitstream HEADER for the chosen variant — 'lossy' (VP8
    frame tag + 9D012A start code + 14-bit dims), 'lossless' (VP8L
    0x2F signature + bit-packed dims/alpha/version), or 'extended'
    (VP8X flags + 24-bit canvas dims, optional ALPH and ANIM/ANMF
    chunks). The codec payload beyond the header is opaque filler —
    triage reads headers; sample decode is the documented VP8
    library boundary (the H.264 posture)."""
    import struct

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    fill = bytes((7 * i + 3) % 256 for i in range(payload_fill))
    if variant == "lossy":
        if alpha or n_anim_frames:
            raise ValueError("lossy variant: plain VP8 only")
        body = (
            b"\x00\x00\x00"  # frame tag (key frame, version 0)
            + b"\x9d\x01\x2a"
            + struct.pack("<HH", width & 0x3FFF, height & 0x3FFF)
            + fill
        )
        chunks = chunk(b"VP8 ", body)
    elif variant == "lossless":
        if n_anim_frames:
            raise ValueError("lossless variant: no animation here")
        b = (
            (width - 1)
            | ((height - 1) << 14)
            | ((1 if alpha else 0) << 28)
        )
        chunks = chunk(
            b"VP8L", b"\x2f" + struct.pack("<I", b) + fill
        )
    elif variant == "extended":
        flags = 0
        if alpha:
            flags |= 0x10
        if n_anim_frames:
            flags |= 0x02
        vp8x = bytes([flags, 0, 0, 0])
        vp8x += (width - 1).to_bytes(3, "little")
        vp8x += (height - 1).to_bytes(3, "little")
        chunks = chunk(b"VP8X", vp8x)
        if n_anim_frames:
            chunks += chunk(
                b"ANIM", struct.pack("<IH", 0xFFFFFFFF, 0)
            )
            for _ in range(n_anim_frames):
                chunks += chunk(b"ANMF", bytes(16) + fill)
        else:
            if alpha:
                chunks += chunk(b"ALPH", b"\x00" + fill)
            body = (
                b"\x00\x00\x00\x9d\x01\x2a"
                + struct.pack("<HH", width & 0x3FFF, height & 0x3FFF)
                + fill
            )
            chunks += chunk(b"VP8 ", body)
    else:
        raise ValueError(f"unknown webp variant {variant!r}")
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WEBP" + chunks


def parse_webp_metadata(payload: bytes) -> dict:
    """WEBP triage (r17 — web crawls ship webp everywhere now):
    ``{variant, width, height, has_alpha, animated, n_chunks}`` from
    the container walk + the real bitstream headers (VP8 start code,
    VP8L signature/version, VP8X flags/canvas). The codec payload
    stays the documented library boundary — this is the
    resolution/animation/alpha filter a crawl pipeline runs on 100 %
    of its webp before any decode. ``ValueError`` on structural
    corruption."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP payload")
    (riff_len,) = struct.unpack("<I", payload[4:8])
    if riff_len + 8 > len(payload):
        raise ValueError("truncated WEBP (RIFF length exceeds payload)")
    end = 8 + riff_len
    pos = 12
    first = None
    n_chunks = 0
    saw_anmf = False
    saw_alph = False
    meta: dict | None = None
    while pos + 8 <= end:
        fourcc = payload[pos:pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + length]
        if len(body) < length:
            raise ValueError(f"truncated WEBP chunk {fourcc!r}")
        pos += 8 + length + (length & 1)
        n_chunks += 1
        if first is None:
            first = fourcc
        if fourcc == b"ANMF":
            saw_anmf = True
        if fourcc == b"ALPH":
            saw_alph = True
        if meta is not None:
            continue
        if fourcc == b"VP8 ":
            if body[3:6] != b"\x9d\x01\x2a":
                raise ValueError("VP8 frame lacks the 9D012A start code")
            w, h = struct.unpack("<HH", body[6:10])
            meta = {
                "variant": "lossy" if first == b"VP8 " else "extended",
                "width": w & 0x3FFF,
                "height": h & 0x3FFF,
                "has_alpha": False,
            }
        elif fourcc == b"VP8L":
            if body[:1] != b"\x2f":
                raise ValueError("VP8L lacks the 0x2F signature")
            (b,) = struct.unpack("<I", body[1:5])
            if (b >> 29) & 0x7 != 0:
                raise ValueError(f"VP8L version {(b >> 29) & 7} != 0")
            meta = {
                "variant": "lossless" if first == b"VP8L" else "extended",
                "width": (b & 0x3FFF) + 1,
                "height": ((b >> 14) & 0x3FFF) + 1,
                "has_alpha": bool((b >> 28) & 1),
            }
        elif fourcc == b"VP8X":
            flags = body[0]
            w = int.from_bytes(body[4:7], "little") + 1
            h = int.from_bytes(body[7:10], "little") + 1
            meta = {
                "variant": "extended",
                "width": w,
                "height": h,
                "has_alpha": bool(flags & 0x10),
                "animated": bool(flags & 0x02),
            }
    if meta is None:
        raise ValueError("WEBP carries no VP8/VP8L/VP8X chunk")
    meta.setdefault("animated", saw_anmf)
    if saw_alph:
        meta["has_alpha"] = True
    meta["n_chunks"] = n_chunks
    return meta


WEBP_META_SCHEMA = (
    "doc_id bigint, variant string, width int, height int, "
    "has_alpha boolean, animated boolean, n_chunks int"
)


def webp_metadata(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched WEBP triage — map-only, the metadata-walk scale
    shape shared by GIF/TIFF/MP3/MP4/PDF/FLAC."""
    from mongo2pq_spark.deploy import ensure_shipped

    ensure_shipped(df.sparkSession)

    def parse_batches(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                m = parse_webp_metadata(bytes(payload))
                m["doc_id"] = doc_id
                rows.append(m)
            yield pd.DataFrame(rows)

    return df.mapInPandas(parse_batches, WEBP_META_SCHEMA)


GIF_META_SCHEMA = (
    "doc_id bigint, version string, width int, height int, "
    "n_frames int, animated boolean, loop_forever boolean, "
    "duration_cs bigint"
)


def gif_metadata(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched GIF triage — map-only, the metadata-walk scale
    shape shared by MP3/MP4/PDF/FLAC."""
    from mongo2pq_spark.deploy import ensure_shipped

    ensure_shipped(df.sparkSession)

    def parse_batches(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                m = parse_gif_metadata(bytes(payload))
                m["doc_id"] = doc_id
                rows.append(m)
            yield pd.DataFrame(rows)

    return df.mapInPandas(parse_batches, GIF_META_SCHEMA)


# -- EXIF (JPEG APP1 / TIFF IFD) provenance ----------------------------------

_EXIF_TAGS = {0x010F: "make", 0x0110: "model", 0x0112: "orientation",
              0x0100: "exif_width", 0x0101: "exif_height"}


def build_exif_jpeg(
    orientation: int,
    make: str,
    model: str,
    width: int,
    height: int,
    big_endian: bool = False,
) -> bytes:
    """Minimal JPEG wrapper carrying a REAL Exif APP1 segment: TIFF
    header in the chosen byte order (II little / MM big), IFD0 with
    Make/Model (ASCII — TIFF 6.0-correct: values of <=4 bytes stored
    INLINE in the value field, longer ones out-of-line via value
    offsets), Orientation and ImageWidth/Length (SHORT/LONG inline).
    The body after APP1 is just SOI…EOI filler — this fixture is
    about the metadata channel, the pixel path has its own codecs."""
    import struct

    e = ">" if big_endian else "<"
    make_b = make.encode("latin-1") + b"\x00"
    model_b = model.encode("latin-1") + b"\x00"
    n = 5
    ifd_end = 8 + 2 + n * 12 + 4  # header + count + entries + next-ptr
    tail = b""

    def entry(tag, typ, count, value):
        return struct.pack(e + "HHI", tag, typ, count) + value

    def inline_short(v):
        return struct.pack(e + "H", v) + b"\x00\x00"

    def ascii_value(data: bytes) -> bytes:
        # TIFF 6.0 §2: <=4-byte values live in the 4-byte value field
        # itself (zero-padded); longer values are offset-addressed
        nonlocal tail
        if len(data) <= 4:
            return data.ljust(4, b"\x00")
        off = ifd_end + len(tail)
        tail += data
        return struct.pack(e + "I", off)

    entries = b"".join([
        entry(0x0100, 3, 1, inline_short(width)),
        entry(0x0101, 3, 1, inline_short(height)),
        entry(0x010F, 2, len(make_b), ascii_value(make_b)),
        entry(0x0110, 2, len(model_b), ascii_value(model_b)),
        entry(0x0112, 3, 1, inline_short(orientation)),
    ])
    tiff = (
        (b"MM" if big_endian else b"II")
        + struct.pack(e + "H", 42)
        + struct.pack(e + "I", 8)
        + struct.pack(e + "H", n)
        + entries
        + struct.pack(e + "I", 0)
        + tail
    )
    app1 = b"Exif\x00\x00" + tiff
    return (
        b"\xff\xd8"                              # SOI
        + b"\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1
        + b"\xff\xd9"                            # EOI
    )


def parse_jpeg_exif(payload: bytes) -> dict:
    """Walk a JPEG's marker segments to APP1/Exif and parse the TIFF
    IFD0: ``{endian, orientation, make, model, exif_width,
    exif_height}`` (missing tags → None) — the provenance keys an
    image-dedup pipeline clusters on before any pixel work. Both
    byte orders; ``ValueError`` on structural corruption or when no
    Exif APP1 exists."""
    import struct

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    tiff = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"lost JPEG marker sync at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack(">H", payload[pos + 2:pos + 4])[0]
        body = payload[pos + 4:pos + 2 + seg_len]
        if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            tiff = body[6:]
            break
        pos += 2 + seg_len
    if tiff is None:
        raise ValueError("JPEG carries no Exif APP1 segment")
    if tiff[:2] == b"II":
        e = "<"
    elif tiff[:2] == b"MM":
        e = ">"
    else:
        raise ValueError(f"bad TIFF byte-order mark {tiff[:2]!r}")
    if struct.unpack(e + "H", tiff[2:4])[0] != 42:
        raise ValueError("bad TIFF magic (not 42)")
    ifd_off = struct.unpack(e + "I", tiff[4:8])[0]
    if ifd_off + 2 > len(tiff):
        raise ValueError("IFD offset beyond the TIFF block")
    n = struct.unpack(e + "H", tiff[ifd_off:ifd_off + 2])[0]
    out = {
        "endian": "big" if e == ">" else "little",
        "orientation": None, "make": None, "model": None,
        "exif_width": None, "exif_height": None,
    }
    for k in range(n):
        at = ifd_off + 2 + k * 12
        if at + 12 > len(tiff):
            raise ValueError("truncated IFD entry")
        tag, typ, count = struct.unpack(e + "HHI", tiff[at:at + 8])
        field = _EXIF_TAGS.get(tag)
        if field is None:
            continue
        if typ == 3 and count == 1:          # SHORT inline
            out[field] = struct.unpack(e + "H", tiff[at + 8:at + 10])[0]
        elif typ == 4 and count == 1:        # LONG inline
            out[field] = struct.unpack(e + "I", tiff[at + 8:at + 12])[0]
        elif typ == 2:                       # ASCII
            # TIFF 6.0 §2: values of <=4 bytes are stored INLINE in
            # the value field, not via offset — a short Make like
            # b"LG\x00" would otherwise be misread as an offset
            if count <= 4:
                raw = tiff[at + 8:at + 8 + count]
            else:
                off = struct.unpack(e + "I", tiff[at + 8:at + 12])[0]
                raw = tiff[off:off + count]
            if len(raw) < count:
                raise ValueError(f"ASCII tag 0x{tag:04x} overruns TIFF")
            out[field] = raw.split(b"\x00")[0].decode("latin-1")
    return out


EXIF_SCHEMA = (
    "doc_id bigint, endian string, orientation int, make string, "
    "model string, exif_width int, exif_height int"
)


def jpeg_exif(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched EXIF provenance extraction — map-only, the
    metadata-walk scale shape."""
    from mongo2pq_spark.deploy import ensure_shipped

    ensure_shipped(df.sparkSession)

    def parse_batches(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                m = parse_jpeg_exif(bytes(payload))
                m["doc_id"] = doc_id
                rows.append(m)
            yield pd.DataFrame(rows)

    return df.mapInPandas(parse_batches, EXIF_SCHEMA)


def wds_group_samples(
    df: DataFrame, name_col: str = "name", payload_col: str = "payload"
) -> DataFrame:
    """Group tar members into WebDataset SAMPLES — the wds data
    model's second half (the tarshards source/sink carries members;
    this aligns them): everything before the member name's FIRST dot
    is the sample key, the remainder the part type, and all parts
    sharing a key form one training sample (``doc123.txt`` +
    ``doc123.json`` + ``doc123.jpg`` -> one row). Returns one row per
    sample::

        (sample_key, n_parts, part_exts, sample_md5)

    ``part_exts`` is the comma-joined sorted extension list;
    ``sample_md5`` digests the ext-sorted ``ext:md5(payload)`` pairs,
    so it is order-insensitive across shards/partitions and changes
    iff any part's bytes change — the whole-sample identity key for
    sample-level dedup and snapshot diffing. A member name with no
    dot is a single-part sample whose part type is the empty string
    (wds corpora always carry extensions; this just keeps the
    grouping total).

    Scale shape: per-member projection (regex split + payload md5) is
    map-only; the group-by-key is ONE shuffle on the sample key —
    keys are unique per sample and parts-per-sample is small and
    bounded (modalities, not documents), so no skew; everything
    JVM-side, output rows = samples. All columns scalar (driver-
    canonicalizer contract, registry.complex_top_level_cols)."""
    parts = df.select(
        F.regexp_extract(F.col(name_col), r"^([^.]*)", 1).alias(
            "sample_key"
        ),
        F.regexp_extract(F.col(name_col), r"^[^.]*\.(.*)$", 1).alias(
            "__ext"
        ),
        F.md5(F.col(payload_col)).alias("__pmd5"),
    )
    return parts.groupBy("sample_key").agg(
        F.count("*").cast("bigint").alias("n_parts"),
        F.array_join(F.array_sort(F.collect_list("__ext")), ",").alias(
            "part_exts"
        ),
        F.md5(
            F.array_join(
                F.array_sort(
                    F.collect_list(
                        F.concat_ws(":", F.col("__ext"), F.col("__pmd5"))
                    )
                ),
                "|",
            ).cast("binary")
        ).alias("sample_md5"),
    )


def wds_snapshot_diff(
    old_members: DataFrame,
    new_members: DataFrame,
    name_col: str = "name",
    payload_col: str = "payload",
) -> DataFrame:
    """Sample-level diff between two tar-shard snapshot GENERATIONS —
    the generation-management primitive of a wds corpus (what changed
    between yesterday's drop and today's?): both member tables group
    into samples (``wds_group_samples``), and a full outer join on
    the sample key classifies every sample as ``added`` (new gen
    only), ``removed`` (old gen only), ``changed`` (both, different
    whole-sample digest — ANY part's bytes differing flips it), or
    ``unchanged``. Returns ``(sample_key, status, old_md5, new_md5)``.

    Scale shape: two single-shuffle groupings + one equi-join on the
    unique sample key; payload bytes reduce to 16-byte digests at the
    grouping, so the join moves digest-width rows no matter how large
    the samples are. Downstream: ``added``+``changed`` is the
    incremental processing set; ``removed`` drives retention
    deletes."""
    a = wds_group_samples(old_members, name_col, payload_col).select(
        "sample_key", F.col("sample_md5").alias("old_md5")
    )
    b = wds_group_samples(new_members, name_col, payload_col).select(
        "sample_key", F.col("sample_md5").alias("new_md5")
    )
    return a.join(b, "sample_key", "full_outer").select(
        "sample_key",
        F.when(F.col("old_md5").isNull(), F.lit("added"))
        .when(F.col("new_md5").isNull(), F.lit("removed"))
        .when(F.col("old_md5") != F.col("new_md5"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
        "old_md5",
        "new_md5",
    )
