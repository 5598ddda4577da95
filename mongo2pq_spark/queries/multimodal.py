"""Multimodal-column queries: binary payload + typed metadata.

The payload is built from the documents fixture (utf-8 bytes stand in
for image/audio bytes); octet_length and md5 are portable, so the
metadata path is fully oracle-checked. The decode path (mapInPandas)
is exercised by ``multimodal_decode_features``: the deterministic fake
decoder (floor-mean byte value per chunk) is mirrored byte-for-byte in
DuckDB SQL — bytes recovered from hex(encode(text)), integer-valued
doubles render identically in both engines — so even the Python-side
decode carries a full value-level oracle.
"""

from __future__ import annotations

from mongo2pq_spark.operators import multimodal as ops
from mongo2pq_spark.queries.registry import register


def _sql_fake_feature_exprs(dim: int = 4) -> list[str]:
    """DuckDB expressions mirroring multimodal._fake_features over the
    byte list ``bytes`` with scalars ``n`` (payload length) and
    ``chunk`` (= greatest(1, n // dim)) in scope."""
    exprs = []
    for i in range(dim):
        start = f"{i} * chunk + 1"
        stop = f"least(n, {i + 1} * chunk)"
        tail = "CAST(floor(list_sum(bytes[n - chunk + 1 : n]) * 1.0 / chunk) AS DOUBLE)"
        body = (
            f"CAST(floor(list_sum(bytes[{start} : {stop}]) * 1.0 "
            f"/ ({stop} - {i} * chunk)) AS DOUBLE)"
        )
        exprs.append(
            f"CASE WHEN n = 0 THEN 0.0 WHEN {start} > n THEN {tail} "
            f"ELSE {body} END"
        )
    return exprs


def _decode_oracle_sql(dim: int = 4) -> str:
    feats = ", ".join(_sql_fake_feature_exprs(dim))
    return f"""
    WITH p AS (
        SELECT doc_id, 'text/plain' AS mime,
               CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
               md5(text) AS payload_md5,
               hex(encode(text)) AS hx,
               octet_length(encode(text)) AS n
        FROM documents
    ),
    b AS (
        SELECT doc_id, mime, n_bytes, payload_md5, n,
               greatest(1, n // {dim}) AS chunk,
               [ (strpos('0123456789ABCDEF', substring(hx, 2*i-1, 1)) * 16
                  + strpos('0123456789ABCDEF', substring(hx, 2*i, 1)) - 17)
                 FOR i IN generate_series(1, n) ] AS bytes
        FROM p
    )
    SELECT doc_id, mime, n_bytes, payload_md5,
           CAST({dim} AS BIGINT) AS n_features,
           md5(array_to_string([{feats}], ',')) AS features_md5
    FROM b
    """


@register(
    "multimodal_metadata",
    """
    SELECT doc_id,
           'text/plain' AS mime,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           md5(text) AS payload_md5
    FROM documents
    """,
    doc="binary payload column + typed metadata struct (mime, size, digest)",
)
def multimodal_metadata(spark, sf_dir):
    from mongo2pq_spark.sources.registry import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents")
    return ops.media_metadata(ops.attach_payload(docs))


@register(
    "multimodal_decode_features",
    _decode_oracle_sql(),
    doc="Arrow-batched decode plumbing (mapInPandas): payload → stubbed "
        "feature vector; schema/batch contract is the real one. Output is "
        "scalarized (count + digest of the vector) so the result is "
        "hashable/sortable for any downstream canonicalizer; the fake "
        "decoder is mirrored in DuckDB (hex → byte list → floor-mean per "
        "chunk), making this a FULL value-level oracle despite the "
        "Python-side execution",
)
def multimodal_decode_features(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.sources.registry import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents")
    decoded = ops.decode_features(ops.attach_payload(docs))
    return decoded.select(
        "doc_id",
        "mime",
        "n_bytes",
        "payload_md5",
        F.size("feature").cast("bigint").alias("n_features"),
        F.md5(
            F.concat_ws(",", F.col("feature").cast("array<string>")).cast("binary")
        ).alias("features_md5"),
    )


@register(
    "multimodal_image_dims",
    """
    SELECT doc_id,
           CASE CAST(doc_id % 3 AS INT)
                WHEN 0 THEN 'image/png'
                WHEN 1 THEN 'image/gif'
                ELSE 'image/jpeg' END AS mime,
           CAST(n_chars AS INT) AS width,
           CAST(doc_id % 256 + 1 AS INT) AS height
    FROM documents
    """,
    doc="REAL (non-stubbed) media decode step: container-header "
        "dimension parsing in pure Python — PNG IHDR, GIF logical "
        "screen descriptor, JPEG SOF marker scan (through an APP0 "
        "segment, exercising segment skipping). Each doc gets a "
        "synthetic but format-correct header (format by doc_id % 3, "
        "width = n_chars, height = doc_id % 256 + 1); the parser's "
        "round-trip must reproduce those values exactly, which the "
        "oracle computes directly from the table. This is the "
        "resolution-filter stage that runs BEFORE paying for pixel "
        "decode (which stays stubbed: no codec libs here); map-side "
        "only, no shuffle",
)
def multimodal_image_dims(spark, sf_dir):
    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.sources.registry import read_sf_table

    spark_docs = read_sf_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars"
    )
    ensure_shipped(spark)

    def make_payloads(batches):
        import struct

        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                w, h = int(n_chars), int(doc_id) % 256 + 1
                fmt = int(doc_id) % 3
                if fmt == 0:  # PNG: magic + IHDR
                    p = (
                        b"\x89PNG\r\n\x1a\n"
                        + struct.pack(">I", 13)
                        + b"IHDR"
                        + struct.pack(">II", w, h)
                        + b"\x08\x06\x00\x00\x00"
                        + b"\x00" * 4
                    )
                elif fmt == 1:  # GIF: magic + logical screen descriptor
                    p = b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"
                else:  # JPEG: SOI + APP0 (skipped) + SOF0
                    app0 = (
                        b"\xff\xe0"
                        + struct.pack(">H", 16)
                        + b"JFIF\x00"
                        + b"\x00" * 9
                    )
                    sof0 = (
                        b"\xff\xc0"
                        + struct.pack(">H", 17)
                        + b"\x08"
                        + struct.pack(">HH", h, w)
                        + b"\x03"
                        + b"\x00" * 10
                    )
                    p = b"\xff\xd8" + app0 + sof0
                payloads.append(p)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    with_payload = spark_docs.mapInPandas(
        make_payloads, "doc_id bigint, payload binary"
    )
    return ops.image_dimensions(with_payload)


def _frame_sample_oracle() -> str:
    fb = ops.FRAME_BYTES
    ev = ops.FRAME_SAMPLE_EVERY
    hex_per = fb * 2
    return f"""
    WITH p AS (
        SELECT doc_id, hex(encode(text)) AS hexstr,
               CAST(ceil(octet_length(encode(text)) * 1.0 / {fb}) AS BIGINT)
                   AS n_frames
        FROM documents
    ),
    f AS (
        SELECT doc_id, n_frames, hexstr,
               unnest(generate_series(0, CAST(n_frames - 1 AS BIGINT), {ev}))
                   AS i
        FROM p WHERE n_frames > 0
    ),
    s AS (
        SELECT doc_id,
               max(n_frames) AS n_frames,
               count(*) AS n_sampled,
               md5(string_agg(substr(hexstr, CAST(i * {hex_per} + 1 AS BIGINT),
                                     {hex_per}), '' ORDER BY i)) AS sampled_md5
        FROM f GROUP BY doc_id
    )
    SELECT p.doc_id,
           CAST(p.n_frames AS BIGINT) AS n_frames,
           CAST(coalesce(s.n_sampled, 0) AS BIGINT) AS n_sampled,
           coalesce(s.sampled_md5, md5('')) AS sampled_md5
    FROM p LEFT JOIN s ON s.doc_id = p.doc_id
    """


@register(
    "multimodal_frame_sample",
    _frame_sample_oracle(),
    doc=f"video-style frame sampling over the opaque payload (fixed "
        f"{ops.FRAME_BYTES}-byte frames, every {ops.FRAME_SAMPLE_EVERY}th "
        "kept, md5 over the sampled hex stream) via Arrow-batched "
        "mapInPandas — the decode-free stand-in for 'sample k fps and "
        "fingerprint'; byte-identical DuckDB mirror makes it a full "
        "value oracle despite Python-side execution",
)
def multimodal_frame_sample(spark, sf_dir):
    from mongo2pq_spark.sources.registry import read_sf_table

    docs = read_sf_table(spark, sf_dir, "documents")
    return ops.frame_sample(ops.attach_payload(docs))


@register(
    "multimodal_png_pixel_roundtrip",
    """
    SELECT doc_id,
           CAST(8 AS INTEGER) AS width,
           CAST(8 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS channels,
           CAST(sum((7 * doc_id + 13 * x.i + 29 * y.i + 31 * ch.i) % 256)
                AS BIGINT) AS pixel_sum
    FROM documents,
         generate_series(0, 7) x(i),
         generate_series(0, 7) y(i),
         generate_series(0, 2) ch(i)
    WHERE doc_id < 200
    GROUP BY doc_id
    """,
    doc="REAL PNG pixel decode, end to end: deterministic 8×8×3 pixels "
        "(a closed-form function of doc_id/x/y/channel) are ENCODED to "
        "standards-compliant PNG bytes and DECODED back by the pure-"
        "stdlib codec (operators/multimodal.py), both inside Arrow-"
        "batched mapInPandas; the oracle recomputes the exact integer "
        "pixel sums from the generation rule alone, so a hash match "
        "proves decode∘encode = identity on the executors — retiring "
        "the pixel-decode stub for PNG (other codecs remain documented "
        "stubs: their libraries aren't in this container)",
)
def multimodal_png_pixel_roundtrip(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def build_batches(batches):
        import numpy as np
        import pandas as pd

        from mongo2pq_spark.operators.multimodal import encode_png

        y, x, ch = np.meshgrid(
            np.arange(8), np.arange(8), np.arange(3), indexing="ij"
        )
        base = 13 * x + 29 * y + 31 * ch
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                arr = ((7 * int(d) + base) % 256).astype("uint8")
                payloads.append(encode_png(arr))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    with_png = docs.mapInPandas(build_batches, "doc_id bigint, payload binary")
    return ops.png_pixel_stats(with_png).select(
        "doc_id", "width", "height", "channels", "pixel_sum"
    )


@register(
    "multimodal_png_variant_matrix",
    """
    WITH d AS (
        SELECT doc_id, CAST(doc_id % 6 AS INTEGER) AS v
        FROM documents WHERE doc_id < 200
    ),
    s AS (
        SELECT d.doc_id, d.v,
               SUM(CASE d.v
                   WHEN 0 THEN
                         (7 * ((d.doc_id + 3 * x.i + 5 * y.i) % 32) + 1) % 256
                       + (11 * ((d.doc_id + 3 * x.i + 5 * y.i) % 32) + 3) % 256
                       + (13 * ((d.doc_id + 3 * x.i + 5 * y.i) % 32) + 5) % 256
                   WHEN 1 THEN
                         (7 * ((d.doc_id + x.i + 2 * y.i) % 16) + 1) % 256
                       + (11 * ((d.doc_id + x.i + 2 * y.i) % 16) + 3) % 256
                       + (13 * ((d.doc_id + x.i + 2 * y.i) % 16) + 5) % 256
                   WHEN 2 THEN (d.doc_id + x.i + y.i) % 2
                   WHEN 3 THEN (d.doc_id + 3 * x.i + y.i) % 16
                   WHEN 4 THEN
                       (997 * d.doc_id + 257 * x.i + 513 * y.i) % 65536
                   ELSE (7 * d.doc_id + 13 * x.i + 29 * y.i) % 256
                      + (7 * d.doc_id + 13 * x.i + 29 * y.i + 31) % 256
                      + (7 * d.doc_id + 13 * x.i + 29 * y.i + 62) % 256
                   END) AS ps
        FROM d, generate_series(0, 15) x(i), generate_series(0, 15) y(i)
        GROUP BY d.doc_id, d.v
    )
    SELECT doc_id,
           list_extract(['pal8', 'pal4_adam7', 'gray1', 'gray4',
                         'gray16', 'rgb_adam7'], v + 1) AS variant,
           CAST(16 AS INTEGER) AS width,
           CAST(16 AS INTEGER) AS height,
           CAST(CASE WHEN v IN (0, 1, 5) THEN 3 ELSE 1 END
                AS INTEGER) AS channels,
           CAST(ps AS BIGINT) AS pixel_sum
    FROM s
    """,
    doc="the FULL legal PNG variant space decodes for real (r17 — "
        "retires the 8-bit-non-interlaced-only boundary): per-doc "
        "16×16 fixtures rotate through paletted 8-bit, paletted "
        "4-bit ADAM7-INTERLACED, 1-bit and 4-bit grayscale (MSB-"
        "first sub-byte packing), 16-bit grayscale (big-endian "
        "samples), and Adam7-interlaced RGB — each pixel a closed "
        "form of (doc_id, x, y), encoded by the variant writer and "
        "decoded back by the generalized pure-stdlib decoder "
        "(PLTE palette expansion, 7-pass de-interlace, per-depth "
        "bit unpacking), both inside Arrow-batched mapInPandas. "
        "The oracle recomputes the exact integer pixel sums from "
        "the generation rule alone, so a hash match proves "
        "decode∘encode = identity across the whole variant space "
        "on the executors. Map-only; no NotImplementedError "
        "remains in the PNG path",
)
def multimodal_png_variant_matrix(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def build_batches(batches):
        import numpy as np
        import pandas as pd

        from mongo2pq_spark.operators.multimodal import encode_png_variant

        y, x = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")

        def pal(n):
            k = np.arange(n)
            return np.stack(
                [(7 * k + 1) % 256, (11 * k + 3) % 256, (13 * k + 5) % 256],
                axis=1,
            ).astype("uint8")

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                v = d % 6
                if v == 0:
                    idx = ((d + 3 * x + 5 * y) % 32).astype("uint8")
                    p = encode_png_variant(
                        idx, depth=8, color=3, palette=pal(32)
                    )
                elif v == 1:
                    idx = ((d + x + 2 * y) % 16).astype("uint8")
                    p = encode_png_variant(
                        idx, depth=4, color=3, palette=pal(16), interlace=1
                    )
                elif v == 2:
                    p = encode_png_variant(
                        ((d + x + y) % 2).astype("uint8"), depth=1, color=0
                    )
                elif v == 3:
                    p = encode_png_variant(
                        ((d + 3 * x + y) % 16).astype("uint8"),
                        depth=4, color=0,
                    )
                elif v == 4:
                    p = encode_png_variant(
                        ((997 * d + 257 * x + 513 * y) % 65536).astype(
                            "uint16"
                        ),
                        depth=16, color=0,
                    )
                else:
                    ch = np.arange(3)
                    rgb = (
                        (7 * d + 13 * x[:, :, None] + 29 * y[:, :, None]
                         + 31 * ch) % 256
                    ).astype("uint8")
                    p = encode_png_variant(
                        rgb, depth=8, color=2, interlace=1
                    )
                payloads.append(p)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    with_png = docs.mapInPandas(build_batches, "doc_id bigint, payload binary")
    names = F.array(
        *[F.lit(s) for s in
          ["pal8", "pal4_adam7", "gray1", "gray4", "gray16", "rgb_adam7"]]
    )
    return ops.png_pixel_stats(with_png).select(
        "doc_id",
        F.element_at(
            names, (F.col("doc_id") % 6).cast("int") + 1
        ).alias("variant"),
        "width", "height", "channels", "pixel_sum",
    )


@register(
    "multimodal_jpeg_pixel_roundtrip",
    """
    SELECT doc_id,
           CAST(16 AS INTEGER) AS width,
           CAST(16 AS INTEGER) AS height,
           CAST(1 AS INTEGER) AS channels,
           CAST(64 * sum((7 * doc_id + 17 * bx.i + 23 * by.i) % 256)
                AS BIGINT) AS pixel_sum
    FROM documents,
         generate_series(0, 1) bx(i),
         generate_series(0, 1) by(i)
    WHERE doc_id < 200
    GROUP BY doc_id
    """,
    doc="REAL baseline-JPEG pixel decode, end to end: deterministic "
        "16×16 grayscale images whose four 8×8 blocks are each "
        "CONSTANT (a closed-form function of doc_id and block "
        "coordinates) are ENCODED to standards-compliant baseline "
        "JPEG bytes (all-ones quantization) and DECODED back by the "
        "pure-stdlib codec (operators/jpeg.py), both inside Arrow-"
        "batched mapInPandas. DC-only blocks round-trip BIT-EXACTLY "
        "through FDCT→quantize→Huffman→IDCT, so the oracle recomputes "
        "the exact integer pixel sums from the generation rule alone — "
        "a hash match proves decode∘encode = identity on the "
        "executors, retiring the pixel-decode stub for baseline JPEG "
        "the way multimodal_png_pixel_roundtrip did for PNG "
        "(FLAC and MJPEG-in-AVI decode for real as of r16; lossy "
        "audio samples and inter-frame video remain the documented "
        "library-swap stubs)",
)
def multimodal_jpeg_pixel_roundtrip(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import jpeg as jpeg_ops
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def build_batches(batches):
        import numpy as np
        import pandas as pd

        from mongo2pq_spark.operators.jpeg import encode_jpeg

        by, bx = np.meshgrid(np.arange(2), np.arange(2), indexing="ij")
        base = 17 * bx + 23 * by
        ones8 = np.ones((8, 8), dtype="uint8")
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                blocks = ((7 * int(d) + base) % 256).astype("uint8")
                payloads.append(encode_jpeg(np.kron(blocks, ones8)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    with_jpeg = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    return jpeg_ops.jpeg_pixel_stats(with_jpeg).select(
        "doc_id", "width", "height", "channels", "pixel_sum"
    )


@register(
    "multimodal_image_dhash_neardup",
    """
    WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 240),
    g AS (
        SELECT doc_id, y.i AS y, x.i AS x,
               ((17 * x.i * (y.i + 1) + 29 * y.i + 31 * (doc_id % 40)) % 150
                + (doc_id // 40) % 46
                + CASE WHEN doc_id % 5 = 0 AND y.i = 3 AND x.i = 4
                       THEN 60 ELSE 0 END) AS p
        FROM d, generate_series(0, 5) y(i), generate_series(0, 10) x(i)
    ),
    h AS (
        SELECT a.doc_id,
               CAST(sum(CASE WHEN b.p > a.p
                             THEN CAST(1 AS BIGINT) << (a.y * 10 + a.x)
                             ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS dhash
        FROM g a JOIN g b ON a.doc_id = b.doc_id AND a.y = b.y
                         AND b.x = a.x + 1
        WHERE a.x < 10
        GROUP BY a.doc_id
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.dhash, b.dhash)) AS hamming
    FROM h a JOIN h b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
    """,
    doc="Image NEAR-dedup via perceptual hashing, end to end on the "
        "REAL codec: deterministic 6×11 grayscale images (a closed-"
        "form pixel rule planting groups that share a base pattern "
        "under per-doc brightness shifts — different BYTES, same "
        "gradients — plus a localized bump that flips 1-2 hash bits "
        "for every 5th doc) are encoded to PNG, decoded back and "
        "60-bit dHashed inside Arrow-batched mapInPandas, then paired "
        "by the generic pigeonhole Hamming banding "
        "(operators/dedup.py::hamming_near_pairs — the same audited "
        "blocking as text simhash, never an all-pairs join). The "
        "oracle recomputes the hashes from the pixel rule alone and "
        "takes brute-force pairs, so a hash match proves "
        "decode∘encode ∘ dhash ∘ banding = the exact Hamming "
        "relation — byte-level dedup would find NONE of these pairs "
        "(every payload differs); that is the capability gap this "
        "operator closes for image corpora",
)
def multimodal_image_dhash_neardup(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators.dedup import hamming_near_pairs
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 240
    )

    def build_batches(batches):
        import numpy as np
        import pandas as pd

        from mongo2pq_spark.operators.multimodal import encode_png

        y, x = np.meshgrid(np.arange(6), np.arange(11), indexing="ij")
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                img = (
                    (17 * x * (y + 1) + 29 * y + 31 * (d % 40)) % 150
                    + (d // 40) % 46
                )
                if d % 5 == 0:
                    img = img.copy()
                    img[3, 4] += 60
                payloads.append(encode_png(img.astype("uint8")))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    with_png = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    hashes = ops.image_dhash(with_png)
    return hamming_near_pairs(hashes, "dhash", max_hamming=3, bits=60)


@register(
    "multimodal_wav_audio_stats",
    """
    WITH d AS (
        SELECT doc_id, 1 + doc_id % 2 AS channels,
               80 + (doc_id % 20) * 8 AS frames
        FROM documents WHERE doc_id < 200
    ),
    s AS (
        SELECT d.doc_id, d.channels, d.frames,
               ((31 * d.doc_id + 17 * i.i + 57 * c.i) % 2003) - 1001 AS v
        FROM d, generate_series(0, 1) c(i), generate_series(0, 231) i(i)
        WHERE c.i < d.channels AND i.i < d.frames
    )
    SELECT doc_id,
           CAST(max(channels) AS INTEGER) AS channels,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(max(frames) AS BIGINT) AS n_frames,
           CAST(max(frames) // 8 AS BIGINT) AS duration_ms,
           CAST(sum(v) AS BIGINT) AS sample_sum,
           CAST(max(abs(v)) AS INTEGER) AS peak_abs
    FROM s GROUP BY doc_id
    """,
    doc="REAL PCM audio decode, end to end: deterministic int16 "
        "sample streams (a closed-form function of doc_id, frame, and "
        "channel; mono/stereo alternating per doc, 8 kHz) are ENCODED "
        "to RIFF/WAVE bytes and DECODED back by the pure-stdlib codec "
        "(operators/audio.py) inside Arrow-batched mapInPandas, "
        "emitting the exact corpus-filter scalars (frame count, "
        "integer-ms duration, sample sum, peak amplitude); the oracle "
        "recomputes them from the generation rule alone, so a hash "
        "match proves container parse + interleaved-PCM decode = "
        "identity on the executors — retiring the audio-decode stub "
        "for uncompressed WAV (lossy audio codecs remain documented "
        "stubs: their libraries aren't in this container)",
)
def multimodal_wav_audio_stats(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import audio as audio_ops
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def build_batches(batches):
        import numpy as np
        import pandas as pd

        from mongo2pq_spark.operators.audio import encode_wav

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                channels = 1 + d % 2
                frames = 80 + (d % 20) * 8
                i, c = np.meshgrid(
                    np.arange(frames), np.arange(channels), indexing="ij"
                )
                samples = ((31 * d + 17 * i + 57 * c) % 2003 - 1001).astype(
                    "int16"
                )
                payloads.append(encode_wav(samples, 8000))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    with_wav = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    return audio_ops.wav_audio_stats(with_wav)


@register(
    "multimodal_mp4_metadata",
    """
    SELECT doc_id,
           'isom' AS brand,
           CAST(1000 + (doc_id % 97) * 250 AS BIGINT) AS duration_ms,
           CAST(1 + doc_id % 3 AS INTEGER) AS n_tracks,
           CAST(1 AS INTEGER) AS n_video_tracks,
           CAST(doc_id % 3 AS INTEGER) AS n_audio_tracks,
           CAST(320 + (doc_id % 4) * 320 AS INTEGER) AS video_width,
           CAST((320 + (doc_id % 4) * 320) * 9 // 16 AS INTEGER)
               AS video_height
    FROM documents WHERE doc_id < 200
    """,
    doc="REAL ISO-BMFF (MP4) container-metadata extraction, end to "
        "end: minimal well-formed box trees (ftyp + moov(mvhd + video "
        "trak + 0-2 audio traks), closed-form durations/dimensions "
        "per doc_id) are BUILT and PARSED back by the pure-stdlib box "
        "walker (operators/video.py) inside Arrow-batched "
        "mapInPandas; the oracle recomputes every scalar from the "
        "generation rule, proving the duration/resolution/track-"
        "layout filter stage — the stage a video pipeline runs on "
        "100% of its corpus BEFORE any frame decode — works without "
        "any codec. Frame decode itself remains the video modality's "
        "documented stub (H.264/AV1 decoders aren't in this "
        "container), mirroring the image posture before the real "
        "codecs landed",
)
def multimodal_mp4_metadata(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import video as video_ops
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def build_batches(batches):
        import pandas as pd

        from mongo2pq_spark.operators.video import build_mp4_stub

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w = 320 + (d % 4) * 320
                payloads.append(
                    build_mp4_stub(
                        duration_ms=1000 + (d % 97) * 250,
                        width=w,
                        height=w * 9 // 16,
                        n_audio_tracks=d % 3,
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    with_mp4 = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    return video_ops.mp4_metadata(with_mp4)


@register(
    "multimodal_image_cell_features",
    """
    WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 200),
    px AS (
        SELECT doc_id, y.i AS y, x.i AS x, ch.i AS ch,
               (11 * doc_id + 5 * x.i + 7 * y.i + 13 * ch.i) % 251 AS p
        FROM d,
             generate_series(0, 11) y(i),
             generate_series(0, 19) x(i),
             generate_series(0, 2) ch(i)
    )
    SELECT doc_id,
           CAST(y // 4 AS INTEGER) AS cell_y,
           CAST(x // 5 AS INTEGER) AS cell_x,
           CAST(count(*) AS BIGINT) AS n_px,
           CAST(sum(p) AS BIGINT) AS px_sum
    FROM px
    GROUP BY doc_id, y // 4, x // 5
    """,
    doc="REAL image feature extraction / resize, end to end on the "
        "codec: deterministic 12×20 RGB images (closed-form pixel "
        "rule) are encoded to PNG and decoded back inside Arrow-"
        "batched mapInPandas, then area-pooled onto a 3×4 cell "
        "lattice (operators/multimodal.py::image_cell_sums) — exact "
        "integer per-cell pixel counts and sums, i.e. both the "
        "downscaled image and the mean-pooled feature vector in long "
        "format. The oracle recomputes every cell from the generation "
        "rule alone, so a hash match proves decode∘encode∘pool = "
        "identity; with the codecs real since r9/r10 this retires the "
        "'feature-extract/resize is fake' caveat for images (the fake "
        "path remains only as the audio/video feature stand-in)",
)
def multimodal_image_cell_features(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def build_batches(batches):
        import numpy as np
        import pandas as pd

        from mongo2pq_spark.operators.multimodal import encode_png

        y, x, ch = np.meshgrid(
            np.arange(12), np.arange(20), np.arange(3), indexing="ij"
        )
        base = 5 * x + 7 * y + 13 * ch
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                arr = ((11 * int(d) + base) % 251).astype("uint8")
                payloads.append(encode_png(arr))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    with_png = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    return ops.image_cell_sums(with_png, rows=3, cols=4)


@register(
    "multimodal_image_dhash_incremental",
    """
    WITH corpus_px AS (
        SELECT doc_id, y.i AS y, x.i AS x,
               ((17 * x.i * (y.i + 1) + 29 * y.i + 31 * (doc_id % 40)) % 150
                + (doc_id // 40) % 46
                + CASE WHEN doc_id % 5 = 0 AND y.i = 3 AND x.i = 4
                       THEN 60 ELSE 0 END) AS p
        FROM documents, generate_series(0, 5) y(i), generate_series(0, 10) x(i)
        WHERE doc_id < 240
    ),
    corpus_h AS (
        SELECT a.doc_id,
               CAST(sum(CASE WHEN b.p > a.p
                             THEN CAST(1 AS BIGINT) << (a.y * 10 + a.x)
                             ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS dhash
        FROM corpus_px a JOIN corpus_px b
          ON a.doc_id = b.doc_id AND a.y = b.y AND b.x = a.x + 1
        WHERE a.x < 10 GROUP BY a.doc_id
    ),
    inc_px AS (
        SELECT doc_id, y.i AS y, x.i AS x,
               CASE WHEN doc_id % 3 = 0 THEN
                   ((17 * x.i * (y.i + 1) + 29 * y.i
                     + 31 * ((doc_id - 300) % 40)) % 150
                    + ((doc_id - 300) // 40) % 46
                    + CASE WHEN (doc_id - 300) % 5 = 0 AND y.i = 3
                                AND x.i = 4 THEN 60 ELSE 0 END)
               ELSE (13 * x.i * (y.i + 2) + 19 * y.i + 23 * doc_id) % 149
               END AS p
        FROM documents, generate_series(0, 5) y(i), generate_series(0, 10) x(i)
        WHERE doc_id >= 300 AND doc_id < 400
    ),
    inc_h AS (
        SELECT a.doc_id,
               CAST(sum(CASE WHEN b.p > a.p
                             THEN CAST(1 AS BIGINT) << (a.y * 10 + a.x)
                             ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS dhash
        FROM inc_px a JOIN inc_px b
          ON a.doc_id = b.doc_id AND a.y = b.y AND b.x = a.x + 1
        WHERE a.x < 10 GROUP BY a.doc_id
    )
    SELECT i.doc_id, i.dhash,
           NOT EXISTS (
               SELECT 1 FROM corpus_h c
               WHERE bit_count(xor(c.dhash, i.dhash)) <= 3
           ) AS is_new
    FROM inc_h i
    """,
    doc="Incremental IMAGE dedup against a corpus fingerprint index, "
        "end to end on the real codec: the corpus is 240 closed-form "
        "6×11 PNGs; the increment re-crawls a third of its docs "
        "RE-RENDERED AT 2× RESOLUTION (different bytes, different "
        "dimensions — byte dedup finds nothing) alongside genuinely "
        "new images. dHash is resample-stable, so the re-renders "
        "collide with the corpus index at Hamming 0 and are flagged, "
        "via operators/dedup.py::hamming_incremental_new — the "
        "increment's bands probe the index's bands (pigeonhole-"
        "complete equi-join, O(increment·bands)); the corpus appears "
        "only as one int64 per doc, never content. The oracle "
        "recomputes both hash sets from the pixel rules and "
        "brute-forces the Hamming relation",
)
def multimodal_image_dhash_incremental(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators.dedup import hamming_incremental_new
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id")
    corpus_docs = docs.filter(F.col("doc_id") < 240)
    inc_docs = docs.filter(
        (F.col("doc_id") >= 300) & (F.col("doc_id") < 400)
    )

    def _rule_a(np, d, y, x):
        img = (
            (17 * x * (y + 1) + 29 * y + 31 * (d % 40)) % 150
            + (d // 40) % 46
        )
        if d % 5 == 0:
            img = img.copy()
            img[3, 4] += 60
        return img.astype("uint8")

    def corpus_batches(batches):
        import numpy as np
        import pandas as pd

        from mongo2pq_spark.operators.multimodal import encode_png

        y, x = np.meshgrid(np.arange(6), np.arange(11), indexing="ij")
        for pdf in batches:
            payloads = [
                encode_png(_rule_a(np, int(d), y, x)) for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def inc_batches(batches):
        import numpy as np
        import pandas as pd

        from mongo2pq_spark.operators.multimodal import encode_png

        y, x = np.meshgrid(np.arange(6), np.arange(11), indexing="ij")
        up = np.ones((2, 2), dtype="uint8")
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                if d % 3 == 0:  # 2x re-render of corpus doc d-300
                    payloads.append(
                        encode_png(np.kron(_rule_a(np, d - 300, y, x), up))
                    )
                else:
                    img = (
                        (13 * x * (y + 2) + 19 * y + 23 * d) % 149
                    ).astype("uint8")
                    payloads.append(encode_png(img))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    schema = "doc_id bigint, payload binary"
    corpus_fp = ops.image_dhash(corpus_docs.mapInPandas(corpus_batches, schema))
    inc_fp = ops.image_dhash(inc_docs.mapInPandas(inc_batches, schema))
    return hamming_incremental_new(inc_fp, corpus_fp, bits=60)


@register(
    "multimodal_audio_fp_neardup",
    """
    WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 240),
    s AS (
        SELECT doc_id, i.i AS i,
               CASE WHEN doc_id % 5 = 0 AND i.i = 30 THEN 32000
                    ELSE (1 + (doc_id // 40) % 6) *
                         (((23 * (i.i + 1) * ((doc_id % 40) + 3)
                            + 41 * i.i) % 1901) - 950)
               END AS v
        FROM d, generate_series(0, 60) i(i)
    ),
    h AS (
        SELECT a.doc_id,
               CAST(sum(CASE WHEN abs(b.v) > abs(a.v)
                             THEN CAST(1 AS BIGINT) << a.i
                             ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS afp
        FROM s a JOIN s b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        WHERE a.i < 60
        GROUP BY a.doc_id
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.afp, b.afp)) AS hamming
    FROM h a JOIN h b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.afp, b.afp)) <= 3
    """,
    doc="AUDIO near-dedup via perceptual fingerprinting, end to end "
        "on the REAL WAV codec: deterministic 61-frame int16 streams "
        "(a closed-form sample rule planting 40 base envelopes, each "
        "repeated under 6 gain multipliers and mono/stereo channel "
        "duplication — different BYTES, same loudness gradients — "
        "plus a 32000-amplitude spike at frame 30 for every 5th doc "
        "that deterministically flips ≤2 fingerprint bits) are "
        "encoded to RIFF/WAVE, decoded back and envelope-hashed "
        "(operators/audio.py::audio_fingerprint — sign-of-gradient "
        "over the 61-window mean-|amplitude| envelope, the simplified "
        "Haitsma-Kalman shape, gain- and channel-duplication-"
        "invariant) inside Arrow-batched mapInPandas, then paired by "
        "the generic pigeonhole Hamming banding "
        "(operators/dedup.py::hamming_near_pairs — the same audited "
        "equi-join blocking as text simhash and image dHash, never "
        "all-pairs). The oracle recomputes the hashes from the sample "
        "rule alone (61 frames make the envelope pooling the "
        "identity, the dHash-oracle trick) and takes brute-force "
        "pairs, so a hash match proves decode∘encode ∘ envelope-hash "
        "∘ banding = the exact Hamming relation — byte-level dedup "
        "finds NONE of these pairs (every payload differs), the gap "
        "this closes for re-mastered/gain-shifted audio corpora",
)
def multimodal_audio_fp_neardup(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import audio as audio_ops
    from mongo2pq_spark.operators.dedup import hamming_near_pairs
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 240
    )

    def build_batches(batches):
        import numpy as np
        import pandas as pd

        from mongo2pq_spark.operators.audio import encode_wav

        i = np.arange(61)
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                gain = 1 + (d // 40) % 6
                v = gain * (
                    (23 * (i + 1) * ((d % 40) + 3) + 41 * i) % 1901 - 950
                )
                if d % 5 == 0:
                    v = v.copy()
                    v[30] = 32000
                channels = 1 + d % 2
                samples = np.repeat(
                    v[:, None], channels, axis=1
                ).astype("int16")
                payloads.append(encode_wav(samples, 8000))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    with_wav = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    fp = audio_ops.audio_fingerprint(with_wav)
    return hamming_near_pairs(fp, "afp", max_hamming=3, bits=60)


@register(
    "multimodal_audio_fp_incremental",
    """
    WITH corpus_s AS (
        SELECT doc_id, i.i AS i,
               CASE WHEN doc_id % 5 = 0 AND i.i = 30 THEN 32000
                    ELSE (1 + (doc_id // 40) % 6) *
                         (((23 * (i.i + 1) * ((doc_id % 40) + 3)
                            + 41 * i.i) % 1901) - 950)
               END AS v
        FROM documents, generate_series(0, 60) i(i)
        WHERE doc_id < 240
    ),
    corpus_h AS (
        SELECT a.doc_id,
               CAST(sum(CASE WHEN abs(b.v) > abs(a.v)
                             THEN CAST(1 AS BIGINT) << a.i
                             ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS afp
        FROM corpus_s a JOIN corpus_s b
          ON a.doc_id = b.doc_id AND b.i = a.i + 1
        WHERE a.i < 60 GROUP BY a.doc_id
    ),
    inc_s AS (
        SELECT doc_id, i.i AS i,
               CASE WHEN doc_id % 3 = 0 THEN
                   CASE WHEN (doc_id - 300) % 5 = 0 AND i.i = 30 THEN 32000
                        ELSE 7 * (((23 * (i.i + 1)
                                    * (((doc_id - 300) % 40) + 3)
                                    + 41 * i.i) % 1901) - 950)
                   END
               ELSE ((29 * (i.i + 1) * ((doc_id % 37) + 5)
                      + 13 * i.i) % 1801) - 900
               END AS v
        FROM documents, generate_series(0, 60) i(i)
        WHERE doc_id >= 300 AND doc_id < 400
    ),
    inc_h AS (
        SELECT a.doc_id,
               CAST(sum(CASE WHEN abs(b.v) > abs(a.v)
                             THEN CAST(1 AS BIGINT) << a.i
                             ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS afp
        FROM inc_s a JOIN inc_s b
          ON a.doc_id = b.doc_id AND b.i = a.i + 1
        WHERE a.i < 60 GROUP BY a.doc_id
    )
    SELECT i.doc_id, i.afp,
           NOT EXISTS (
               SELECT 1 FROM corpus_h c
               WHERE bit_count(xor(c.afp, i.afp)) <= 3
           ) AS is_new
    FROM inc_h i
    """,
    doc="Incremental AUDIO dedup against a corpus fingerprint index, "
        "end to end on the real WAV codec: the corpus is the 240 "
        "closed-form envelope streams of multimodal_audio_fp_neardup; "
        "the increment re-crawls a third of its docs RE-MASTERED at "
        "gain 7 and collapsed to mono (different bytes, different "
        "channel layout — byte dedup finds nothing) alongside "
        "genuinely new streams. The envelope fingerprint is gain- and "
        "channel-duplication-invariant, so the re-masters collide "
        "with the corpus index at Hamming 0 and are flagged, via "
        "operators/dedup.py::hamming_incremental_new — the "
        "increment's bands probe the index's bands (pigeonhole-"
        "complete equi-join, O(increment·bands)); the corpus appears "
        "only as one int64 per stream, never samples. The oracle "
        "recomputes both hash sets from the sample rules and "
        "brute-forces the Hamming relation",
)
def multimodal_audio_fp_incremental(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import audio as audio_ops
    from mongo2pq_spark.operators.dedup import hamming_incremental_new
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id")
    corpus_docs = docs.filter(F.col("doc_id") < 240)
    inc_docs = docs.filter(
        (F.col("doc_id") >= 300) & (F.col("doc_id") < 400)
    )

    def _corpus_rule(np, d, i):
        gain = 1 + (d // 40) % 6
        v = gain * ((23 * (i + 1) * ((d % 40) + 3) + 41 * i) % 1901 - 950)
        if d % 5 == 0:
            v = v.copy()
            v[30] = 32000
        return v

    def corpus_batches(batches):
        import numpy as np
        import pandas as pd

        from mongo2pq_spark.operators.audio import encode_wav

        i = np.arange(61)
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                v = _corpus_rule(np, d, i)
                channels = 1 + d % 2
                samples = np.repeat(
                    v[:, None], channels, axis=1
                ).astype("int16")
                payloads.append(encode_wav(samples, 8000))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def inc_batches(batches):
        import numpy as np
        import pandas as pd

        from mongo2pq_spark.operators.audio import encode_wav

        i = np.arange(61)
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                if d % 3 == 0:  # gain-7 mono re-master of corpus doc d-300
                    c = d - 300
                    v = 7 * (
                        (23 * (i + 1) * ((c % 40) + 3) + 41 * i) % 1901 - 950
                    )
                    if c % 5 == 0:
                        v = v.copy()
                        v[30] = 32000
                else:
                    v = (
                        (29 * (i + 1) * ((d % 37) + 5) + 13 * i) % 1801
                    ) - 900
                payloads.append(
                    encode_wav(v[:, None].astype("int16"), 8000)
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    schema = "doc_id bigint, payload binary"
    corpus_fp = audio_ops.audio_fingerprint(
        corpus_docs.mapInPandas(corpus_batches, schema)
    )
    inc_fp = audio_ops.audio_fingerprint(
        inc_docs.mapInPandas(inc_batches, schema)
    )
    return hamming_incremental_new(
        inc_fp, corpus_fp, hash_col="afp", bits=60
    )


@register(
    "multimodal_mp4_sample_tables",
    """
    WITH d AS (
        SELECT doc_id,
               24 + (doc_id % 5) * 12 AS n,
               800 + (doc_id % 11) * 50 AS base
        FROM documents WHERE doc_id < 200
    ),
    s AS (
        SELECT doc_id, n, base, unnest(generate_series(0, n - 1)) AS i
        FROM d
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_samples,
           CAST(sum(base + (i % 7) * 16) AS BIGINT)
               AS total_sample_bytes,
           CAST((n + 7) // 8 AS BIGINT) AS n_keyframes,
           CAST(n * 512 AS BIGINT) AS duration_units,
           round(CAST((n + 7) // 8 AS DOUBLE) / n, 6) AS keyframe_ratio
    FROM s GROUP BY doc_id, n, base
    """,
    doc="REAL ISO-BMFF sample-table extraction (stts/stsz/stss), end "
        "to end: per doc a well-formed video trak with closed-form "
        "sample tables (n = 24+(id%5)*12 samples of 512 units each, "
        "sizes base+(i%7)*16, sync samples every 8th) is BUILT and "
        "parsed back by the pure-stdlib stbl walker "
        "(operators/video.py::parse_mp4_sample_stats) inside "
        "Arrow-batched mapInPandas; the oracle recomputes sample "
        "count, byte total, keyframe count/ratio, and duration from "
        "the generation rule. This is the bitrate/fps/keyframe-"
        "density triage a video pipeline runs on 100% of its corpus "
        "with zero codec work — one level below the mvhd/tkhd "
        "metadata query",
)
def multimodal_mp4_sample_tables(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import video as video_ops
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def build_batches(batches):
        import pandas as pd

        from mongo2pq_spark.operators.video import build_mp4_stub

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                n = 24 + (d % 5) * 12
                base = 800 + (d % 11) * 50
                payloads.append(
                    build_mp4_stub(
                        duration_ms=1000,
                        width=640,
                        height=360,
                        sample_sizes=[
                            base + (i % 7) * 16 for i in range(n)
                        ],
                        sample_delta=512,
                        keyframe_every=8,
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    with_mp4 = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    return video_ops.mp4_sample_stats(with_mp4)


@register(
    "multimodal_wav_window_features",
    """
    WITH d AS (
        SELECT doc_id, 1 + doc_id % 2 AS channels,
               80 + (doc_id % 20) * 8 AS frames
        FROM documents WHERE doc_id < 200
    ),
    fr AS (
        SELECT d.doc_id, d.frames, i.i AS i,
               sum(((31 * d.doc_id + 17 * i.i + 57 * c.i) % 2003)
                   - 1001) AS v
        FROM d, generate_series(0, 231) i(i), generate_series(0, 1) c(i)
        WHERE i.i < d.frames AND c.i < d.channels
        GROUP BY d.doc_id, d.frames, i.i
    ),
    w AS (
        SELECT doc_id, i, v,
               lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv,
               CAST((i * 8) // frames AS INTEGER) AS win
        FROM fr
    )
    SELECT doc_id, win,
           CAST(count(*) AS BIGINT) AS n_frames,
           CAST(sum(abs(v)) AS BIGINT) AS abs_sum,
           CAST(sum(v * v) AS BIGINT) AS sq_sum,
           CAST(count(*) FILTER (WHERE pv IS NOT NULL AND v * pv < 0)
                AS BIGINT) AS n_zero_cross
    FROM w GROUP BY doc_id, win
    """,
    doc="REAL framewise audio feature extraction, end to end: the "
        "closed-form int16 streams of multimodal_wav_audio_stats are "
        "encoded to RIFF/WAVE, decoded back by the pure-stdlib codec, "
        "and reduced to per-window integer energy/sign features "
        "(frame count, |v| and v-squared sums of the channel-sum "
        "signal, strict-sign-flip zero crossings) — the VAD / "
        "silence-trim primitives of a speech pipeline; the oracle "
        "recomputes every window row from the generation rule alone",
)
def multimodal_wav_window_features(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import audio as audio_ops
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def build_batches(batches):
        import numpy as np
        import pandas as pd

        from mongo2pq_spark.operators.audio import encode_wav

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                channels = 1 + d % 2
                frames = 80 + (d % 20) * 8
                i, c = np.meshgrid(
                    np.arange(frames), np.arange(channels), indexing="ij"
                )
                samples = ((31 * d + 17 * i + 57 * c) % 2003 - 1001).astype(
                    "int16"
                )
                payloads.append(encode_wav(samples, 8000))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    with_wav = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    return audio_ops.wav_window_features(with_wav, n_windows=8)


@register(
    "multimodal_mp4_keyframe_ranges",
    """
    WITH d AS (
        SELECT doc_id,
               24 + (doc_id % 5) * 12 AS n,
               800 + (doc_id % 11) * 50 AS base
        FROM documents WHERE doc_id < 200
    ),
    s AS (
        SELECT doc_id, n, base, unnest(generate_series(0, n - 1)) AS i
        FROM d
    )
    SELECT doc_id,
           CAST(i + 1 AS BIGINT) AS sample_idx,
           CAST(base + (i % 7) * 16 AS BIGINT) AS n_bytes,
           CAST(i * base
                + 16 * ((i // 7) * 21 + (i % 7) * ((i % 7) - 1) // 2)
                + 8 * (CASE WHEN i < 12 THEN i // 6
                            ELSE 2 + (i - 12) // 4 END)
                AS BIGINT) AS rel_offset
    FROM s WHERE i % 8 = 0
    """,
    doc="REAL keyframe read-plan extraction, end to end: per doc a "
        "well-formed MP4 with a CHUNKED layout (stsc runs [(1,6),"
        "(3,4)], stco absolute offsets, mdat with 8 dead bytes before "
        "every chunk after the first) is BUILT and resolved back to "
        "per-sample byte ranges by the pure-stdlib stsc/stco/co64 "
        "walker (operators/video.py::parse_mp4_sample_ranges); only "
        "sync samples (every 8th) are emitted — the exact byte slices "
        "a thumbnail/scene-sampling stage would read. The oracle "
        "recomputes each range in closed form: prefix sum of the size "
        "rule base+(i%7)*16 plus 8·chunk_idx of the two-run chunk "
        "layout — a flat stsz prefix sum WITHOUT the chunk walk would "
        "be wrong for every sample past the first gap",
)
def multimodal_mp4_keyframe_ranges(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import video as video_ops
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def build_batches(batches):
        import pandas as pd

        from mongo2pq_spark.operators.video import build_mp4_stub

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                n = 24 + (d % 5) * 12
                base = 800 + (d % 11) * 50
                payloads.append(
                    build_mp4_stub(
                        duration_ms=1000,
                        width=640,
                        height=360,
                        sample_sizes=[
                            base + (i % 7) * 16 for i in range(n)
                        ],
                        sample_delta=512,
                        keyframe_every=8,
                        stsc_runs=[(1, 6), (3, 4)],
                        chunk_gap=8,
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    with_mp4 = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    return video_ops.mp4_keyframe_ranges(with_mp4)


@register(
    "multimodal_image_phash_invariance",
    """
    SELECT doc_id AS g,
           true AS noisy_within,
           true AS negated_beyond
    FROM documents WHERE doc_id < 40
    """,
    doc="REAL DCT perceptual hashing (pHash), proven by its defining "
        "invariance: per group g a deterministic low-frequency test "
        "card, a ±2 Nyquist-checkerboard NOISY copy (re-compression-"
        "artifact stand-in) and a NEGATED copy are encoded to PNG, "
        "decoded by the real codec, pHashed (32x32 area resample -> "
        "orthonormal 2-D DCT -> 60 zigzag AC coefficients thresholded "
        "at their median), and compared: noise must stay within "
        "Hamming 20 (measured max 14 over all 40 groups) while "
        "negation must exceed 30 (measured min 48 — every AC "
        "coefficient and the median flip sign). The oracle pins the "
        "invariant closed-form (the ann_ivf_recall tolerance-oracle "
        "pattern; SQL cannot run a DCT, but it can pin what the hash "
        "must achieve). dHash, by contrast, is a NEIGHBOR-gradient "
        "hash — this frequency-domain fingerprint is what survives "
        "dithering/re-encode noise",
)
def multimodal_image_phash_invariance(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import multimodal as mm
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 120
    )

    def build_batches(batches):
        import numpy as np
        import pandas as pd

        from mongo2pq_spark.operators.multimodal import encode_png

        yy, xx = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
        checker = ((-1) ** (xx + yy))[:, :, None]
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                g, variant = d % 40, d // 40
                f1, f2 = 1 + g % 3, 1 + (g // 3) % 3
                ph = (g * 0.37) % 3.14
                p = (
                    128
                    + 60 * np.cos(2 * np.pi * f1 * xx / 32 + ph)
                    + 40 * np.cos(2 * np.pi * f2 * yy / 32 - ph)
                )
                base = np.clip(np.round(p), 30, 225).astype(np.uint8)[
                    :, :, None
                ]
                if variant == 1:
                    img = np.clip(
                        base.astype(int) + 2 * checker, 0, 255
                    ).astype(np.uint8)
                elif variant == 2:
                    img = (255 - base.astype(int)).astype(np.uint8)
                else:
                    img = base
                payloads.append(encode_png(img))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    imgs = docs.mapInPandas(build_batches, "doc_id bigint, payload binary")
    ph = mm.image_phash(imgs).select(
        (F.col("doc_id") % 40).alias("g"),
        (F.col("doc_id") / 40).cast("int").alias("variant"),
        "phash",
    )
    wide = ph.groupBy("g").agg(
        F.max(F.when(F.col("variant") == 0, F.col("phash"))).alias("h0"),
        F.max(F.when(F.col("variant") == 1, F.col("phash"))).alias("h1"),
        F.max(F.when(F.col("variant") == 2, F.col("phash"))).alias("h2"),
    )
    return wide.select(
        F.col("g").cast("bigint").alias("g"),
        (
            F.bit_count(F.col("h0").bitwiseXOR(F.col("h1"))) <= 20
        ).alias("noisy_within"),
        (
            F.bit_count(F.col("h0").bitwiseXOR(F.col("h2"))) >= 30
        ).alias("negated_beyond"),
    )


@register(
    "multimodal_mp3_metadata",
    """
    WITH d AS (
        SELECT doc_id,
               list_extract([44100, 48000, 32000],
                            1 + CAST(doc_id % 3 AS INTEGER)) AS sr,
               20 + doc_id % 30 AS nf
        FROM documents WHERE doc_id < 200
    ),
    f AS (
        SELECT d.doc_id, d.sr, d.nf,
               list_extract(
                   [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                    224, 256, 320],
                   1 + CAST(CASE WHEN d.doc_id % 4 = 0
                                 THEN (d.doc_id + 3 * i.i) % 14
                                 ELSE d.doc_id % 14 END AS INTEGER)
               ) AS br,
               (d.doc_id + i.i) % 2 AS pad
        FROM d, generate_series(0, 49) i(i)
        WHERE i.i < d.nf
    )
    SELECT doc_id,
           CAST(max(sr) AS INTEGER) AS sample_rate,
           CAST(2 - doc_id % 2 AS INTEGER) AS channels,
           CAST(max(nf) AS BIGINT) AS n_frames,
           CAST(max(nf) * 1152 * 1000 // max(sr) AS BIGINT)
               AS duration_ms,
           CAST(min(br) AS INTEGER) AS bitrate_min_kbps,
           CAST(max(br) AS INTEGER) AS bitrate_max_kbps,
           max(br) > min(br) AS is_vbr,
           CAST(sum(144000 * br // sr + pad) AS BIGINT) AS audio_bytes,
           doc_id % 5 = 0 AS has_id3v2
    FROM f
    GROUP BY doc_id
    """,
    doc="MP3 frame-header triage, end to end: structurally real "
        "MPEG-1 Layer III streams (closed-form per-frame bitrate and "
        "padding rule; CBR and VBR profiles, ID3v2 prefixes, ID3v1 "
        "trailers) are BUILT and WALKED back by the pure-stdlib "
        "header parser (operators/audio.py::parse_mp3_metadata) "
        "inside Arrow-batched mapInPandas. Per-frame padding and VBR "
        "bitrates change every frame length, so landing on each next "
        "sync word — and matching the oracle's closed-form duration / "
        "bitrate-profile / byte-count scalars — proves a real frame "
        "walk. This is the pre-decode filter stage for a lossy-audio "
        "corpus (duration windows, CBR/VBR routing, integrity); the "
        "DECODE itself remains the documented lossy-audio stub, "
        "mirroring the video posture (metadata real, frames stubbed). "
        "Map-only: zero shuffles before the final per-doc emit",
)
def multimodal_mp3_metadata(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import audio as audio_ops
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def build_batches(batches):
        import pandas as pd

        from mongo2pq_spark.operators.audio import build_mp3_stub

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                nf = 20 + d % 30
                if d % 4 == 0:
                    idxs = [1 + (d + 3 * i) % 14 for i in range(nf)]
                else:
                    idxs = [1 + d % 14] * nf
                payloads.append(
                    build_mp3_stub(
                        idxs,
                        d % 3,
                        [(d + i) % 2 for i in range(nf)],
                        mono=d % 2 == 1,
                        id3v2_body=10 + 17 * (d % 7) if d % 5 == 0 else 0,
                        id3v1=d % 7 == 0,
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    with_mp3 = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    return audio_ops.mp3_metadata(with_mp3)


@register(
    "multimodal_mpeg_family_triage",
    """
    WITH d AS (
        SELECT doc_id,
               CAST(doc_id % 9 AS INTEGER) AS v9,
               CAST(doc_id % 9 AS INTEGER) // 3 AS vgrp,
               1 + CAST(doc_id % 9 AS INTEGER) % 3 AS lay,
               CAST(doc_id % 3 AS INTEGER) AS sri,
               10 + doc_id % 20 AS nf,
               1 + CAST(doc_id % 14 AS INTEGER) AS bri
        FROM documents WHERE doc_id < 200
    ),
    t AS (
        SELECT d.*,
               list_extract(
                   list_extract(
                       [[44100, 48000, 32000],
                        [22050, 24000, 16000],
                        [11025, 12000, 8000]], vgrp + 1),
                   sri + 1) AS sr,
               list_extract(
                   list_extract(
                       [[32, 64, 96, 128, 160, 192, 224, 256, 288,
                         320, 352, 384, 416, 448],
                        [32, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                         224, 256, 320, 384],
                        [32, 40, 48, 56, 64, 80, 96, 112, 128, 160,
                         192, 224, 256, 320],
                        [32, 48, 56, 64, 80, 96, 112, 128, 144, 160,
                         176, 192, 224, 256],
                        [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112,
                         128, 144, 160]],
                       CASE WHEN vgrp = 0 THEN lay
                            WHEN lay = 1 THEN 4 ELSE 5 END),
                   bri) AS br,
               CASE WHEN lay = 1 THEN 384
                    WHEN lay = 2 THEN 1152
                    WHEN vgrp = 0 THEN 1152 ELSE 576 END AS spf
        FROM d
    ),
    f AS (
        SELECT t.doc_id, t.sr, t.br,
               CASE WHEN t.lay = 1
                    THEN (12000 * t.br // t.sr
                          + (t.doc_id + i.i) % 2) * 4
                    ELSE (CASE WHEN t.lay = 3 AND t.vgrp > 0
                               THEN 72000 ELSE 144000 END)
                         * t.br // t.sr + (t.doc_id + i.i) % 2
               END AS flen
        FROM t, generate_series(0, 29) i(i)
        WHERE i.i < t.nf
    )
    SELECT t.doc_id,
           list_extract(['1', '2', '2.5'], t.vgrp + 1) AS mpeg_version,
           CAST(t.lay AS INTEGER) AS layer,
           CAST(t.sr AS INTEGER) AS sample_rate,
           CAST(2 - t.doc_id % 2 AS INTEGER) AS channels,
           CAST(t.nf AS BIGINT) AS n_frames,
           CAST(t.nf * t.spf * 1000 // t.sr AS BIGINT) AS duration_ms,
           CAST(t.br AS INTEGER) AS bitrate_min_kbps,
           CAST(t.br AS INTEGER) AS bitrate_max_kbps,
           FALSE AS is_vbr,
           CAST((SELECT sum(flen) FROM f
                 WHERE f.doc_id = t.doc_id) AS BIGINT) AS audio_bytes,
           t.doc_id % 5 = 0 AS has_id3v2
    FROM t
    """,
    doc="the FULL MPEG audio family triages (r17 session 2 — "
        "retires the MPEG-1-Layer-III-only boundary): per-doc "
        "streams rotate through all NINE (version, layer) combos — "
        "MPEG-1/2/2.5 × Layer I/II/III — with per-version sample "
        "rates, per-(version, layer) bitrate tables, Layer I 4-byte "
        "slot counting, and the MPEG-2 Layer III 576-sample "
        "granule, all from the published ISO tables. Per-frame "
        "padding still changes each frame's length, so matching "
        "the oracle's closed-form duration/byte-count scalars "
        "proves the walk lands on every sync word under every "
        "family's size formula. Decode stays the documented "
        "lossy-audio library boundary. Map-only",
)
def multimodal_mpeg_family_triage(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import audio as audio_ops
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def build_batches(batches):
        import pandas as pd

        from mongo2pq_spark.operators.audio import build_mp3_stub

        combos = [
            (v, l)
            for v in ("1", "2", "2.5")
            for l in (1, 2, 3)
        ]
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                ver, lay = combos[d % 9]
                nf = 10 + d % 20
                payloads.append(
                    build_mp3_stub(
                        [1 + d % 14] * nf,
                        d % 3,
                        [(d + i) % 2 for i in range(nf)],
                        mono=d % 2 == 1,
                        id3v2_body=16 + d % 31 if d % 5 == 0 else 0,
                        id3v1=d % 7 == 0,
                        version=ver,
                        layer=lay,
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    with_mp3 = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    return audio_ops.mp3_metadata_full(with_mp3).select(
        "doc_id", "mpeg_version", "layer", "sample_rate", "channels",
        "n_frames", "duration_ms", "bitrate_min_kbps",
        "bitrate_max_kbps", "is_vbr", "audio_bytes", "has_id3v2",
    )


@register(
    "multimodal_pdf_metadata",
    """
    WITH d AS (
        SELECT doc_id,
               1 + doc_id % 12 AS np,
               doc_id % 9 = 0 AS enc,
               doc_id % 2 = 0 AS has_info
        FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           '1.4' AS version,
           CAST(2 + np + CASE WHEN has_info THEN 1 ELSE 0 END
                + CASE WHEN enc THEN 1 ELSE 0 END AS INTEGER)
               AS n_objects,
           CAST(np AS INTEGER) AS n_pages,
           enc AS encrypted,
           CASE WHEN has_info AND NOT enc
                THEN 'Doc-' || CAST(doc_id AS VARCHAR) ELSE '' END
               AS title
    FROM d
    """,
    doc="PDF metadata triage, end to end: minimal structurally real "
        "PDFs (catalog → pages tree → 1-12 page objects, optional "
        "Info /Title and /Encrypt, byte-exact xref TABLE, per-doc "
        "padding that shifts every object offset) are BUILT and "
        "parsed back by the pure-stdlib cross-reference walk "
        "(operators/pdf.py) inside Arrow-batched mapInPandas — "
        "version, object inventory, page count, encryption flag, "
        "title (never decrypted: encrypted docs report title=''). "
        "Objects are resolved THROUGH the xref offsets (the "
        "corrupted-offset unit test pins that a broken entry breaks "
        "the parse), and the per-doc padding makes an offset-ignoring "
        "scan provably unable to stay correct. PDF 1.5 xref STREAMS "
        "raise typed NotImplementedError — the compressed-xref "
        "decoder is the documented library swap, the document "
        "modality's analog of the lossy-audio/video-frame stubs. "
        "Completes the pre-decode triage family: images (real "
        "codecs), WAV (real decode), MP3/MP4 (header/box walks), and "
        "now PDF (xref walk)",
)
def multimodal_pdf_metadata(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import pdf as pdf_ops
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def build_batches(batches):
        import pandas as pd

        from mongo2pq_spark.operators.pdf import build_pdf_stub

        for pdf_b in batches:
            payloads = []
            for d in pdf_b["doc_id"]:
                d = int(d)
                payloads.append(
                    build_pdf_stub(
                        1 + d % 12,
                        title=f"Doc-{d}" if d % 2 == 0 else None,
                        encrypted=d % 9 == 0,
                        pad=(d * 7) % 53,
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf_b["doc_id"], "payload": payloads}
            )

    with_pdf = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    out = pdf_ops.pdf_metadata(with_pdf)
    return out.withColumn(
        "title", F.coalesce(F.col("title"), F.lit(""))
    )


@register(
    "multimodal_pdf_xref_stream",
    """
    WITH d AS (
        SELECT doc_id,
               1 + doc_id % 12 AS np,
               doc_id % 9 = 0 AS enc,
               doc_id % 2 = 0 AS has_info
        FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           '1.5' AS version,
           CAST(4 + np + CASE WHEN has_info THEN 1 ELSE 0 END
                + CASE WHEN enc THEN 1 ELSE 0 END AS INTEGER)
               AS n_objects,
           CAST(np AS INTEGER) AS n_pages,
           enc AS encrypted,
           CASE WHEN has_info AND NOT enc
                THEN 'Doc-' || CAST(doc_id AS VARCHAR)
                     || CASE WHEN doc_id % 4 = 0 THEN '-v2' ELSE '' END
                ELSE '' END
               AS title
    FROM d
    """,
    doc="PDF **1.5** metadata triage (VERDICT r16 #4 — the layout "
        "modern writers emit almost universally): per-doc PDFs whose "
        "catalog/pages/Info live inside a FlateDecode'd /ObjStm and "
        "whose cross-reference is a /XRef STREAM (FlateDecode + PNG "
        "Up predictor, W [1 2 1], two /Index subsections) are BUILT "
        "and parsed back by the pure-stdlib machinery in "
        "operators/pdf.py — zlib inflate, PNG row unfiltering, "
        "type-2 entries resolved through the object stream. Docs "
        "divisible by 4 additionally carry an INCREMENTAL UPDATE "
        "(new Info + second xref stream with /Prev), so the parser's "
        "newest-entry-wins chain walk is driver-checked: their title "
        "reports the -v2 retitle. The extra +2 objects vs the "
        "classic-xref query are the ObjStm and XRef stream objects "
        "themselves. Map-only; the PDF-modality analog of the "
        "subsampled-JPEG envelope retirement",
)
def multimodal_pdf_xref_stream(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import pdf as pdf_ops
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def build_batches(batches):
        import pandas as pd

        from mongo2pq_spark.operators.pdf import (
            append_pdf_retitle_update,
            build_pdf_stub_xrefstream,
        )

        for pdf_b in batches:
            payloads = []
            for d in pdf_b["doc_id"]:
                d = int(d)
                has_info = d % 2 == 0
                p = build_pdf_stub_xrefstream(
                    1 + d % 12,
                    title=f"Doc-{d}" if has_info else None,
                    encrypted=d % 9 == 0,
                    pad=(d * 7) % 53,
                )
                if has_info and d % 4 == 0:
                    p = append_pdf_retitle_update(p, f"Doc-{d}-v2")
                payloads.append(p)
            yield pd.DataFrame(
                {"doc_id": pdf_b["doc_id"], "payload": payloads}
            )

    with_pdf = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    out = pdf_ops.pdf_metadata(with_pdf)
    return out.withColumn(
        "title", F.coalesce(F.col("title"), F.lit(""))
    )


@register(
    "multimodal_pdf_extract_text",
    """
    WITH d AS (
        SELECT doc_id, 1 + doc_id % 4 AS np
        FROM documents WHERE doc_id < 150
    ),
    pages AS (
        SELECT doc_id,
               CAST(j.i AS INTEGER) AS page_idx,
               'Doc ' || CAST(doc_id AS VARCHAR) || ' page '
                   || CAST(j.i AS VARCHAR) || chr(10)
                   || 'Line(2) ' || CAST(doc_id * 7 + j.i AS VARCHAR)
                   AS text
        FROM d, generate_series(0, 3) j(i)
        WHERE j.i < np
    )
    SELECT doc_id, page_idx,
           CAST(length(text) AS INTEGER) AS n_chars,
           md5(text) AS text_md5
    FROM pages
    """,
    doc="per-page PDF TEXT EXTRACTION — the document-pipeline payoff "
        "stage after triage (r17): per-doc PDF 1.5 files whose pages "
        "carry FlateDecode'd /Contents streams (built with literal "
        "strings, escaped parens, kerned TJ arrays, Td line "
        "positioning) are resolved through the xref-stream machinery "
        "and lexed by the shown-text operator scanner "
        "(operators/pdf.py::extract_pdf_text — Tj/TJ/quote ops, "
        "octal and paren escapes, hex strings, balanced-paren "
        "literals; latin-1 byte decode, with real font /Encoding "
        "maps the documented out-of-scope tail). The oracle states "
        "every page's text closed-form, so the md5 match proves the "
        "content-stream decompression, string lexing, and line "
        "assembly end to end. Map-only page explode — the WARC "
        "scale shape",
)
def multimodal_pdf_extract_text(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import pdf as pdf_ops
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 150
    )

    def build_batches(batches):
        import pandas as pd

        from mongo2pq_spark.operators.pdf import build_pdf_stub_xrefstream

        for pdf_b in batches:
            payloads = []
            for d in pdf_b["doc_id"]:
                d = int(d)
                np_ = 1 + d % 4
                texts = [
                    (
                        b"BT /F1 12 Tf 72 720 Td (Doc %d page %d) Tj "
                        b"0 -14 Td [(Line\\(2\\) ) -120 (%d)] TJ ET"
                        % (d, p, d * 7 + p)
                    )
                    for p in range(np_)
                ]
                payloads.append(
                    build_pdf_stub_xrefstream(
                        np_, pad=(d * 11) % 47, page_texts=texts
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf_b["doc_id"], "payload": payloads}
            )

    with_pdf = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    out = pdf_ops.pdf_page_texts(with_pdf)
    return out.select(
        "doc_id", "page_idx", "n_chars",
        F.md5("text").alias("text_md5"),
    )


@register(
    "multimodal_warc_extract",
    """
    SELECT doc_id,
           CAST(2 AS INTEGER) AS rec_idx,
           CAST(list_extract([200, 404, 503],
                1 + CAST(doc_id % 3 AS INTEGER)) AS INTEGER)
               AS http_status,
           'http://site' || CAST(doc_id % 5 AS VARCHAR)
               || '.example/p/' || CAST(doc_id AS VARCHAR)
               AS target_uri,
           md5('Page ' || CAST(doc_id AS VARCHAR) || chr(10)
               || 'A & B <ok>' || chr(10)
               || trim(regexp_replace(text, '[ \t]+', ' ', 'g')))
               AS text_md5,
           CAST(length('Page ' || CAST(doc_id AS VARCHAR) || chr(10)
               || 'A & B <ok>' || chr(10)
               || trim(regexp_replace(text, '[ \t]+', ' ', 'g')))
               AS BIGINT) AS n_chars
    FROM documents WHERE doc_id < 200
    """,
    doc="the full web-ingestion chain on the container CommonCrawl "
        "actually ships: per-doc WARC files (warcinfo + request + "
        "response records, byte-exact Content-Length framing, the "
        "response HTML wrapping the doc text with script/entity "
        "traps) are BUILT, record-walked by the pure-stdlib WARC "
        "parser (operators/warc.py — framing by Content-Length, "
        "never by magic-scanning: bodies legally contain 'WARC/1.0'), "
        "HTTP-split (status, content type, identity body), and the "
        "HTML body flows through html_extract_text — WARC → HTTP → "
        "HTML → text, each stage real. The oracle recomputes the "
        "expected status/URI/text ground truth closed-form (no "
        "parsing in the oracle), so a hash match proves the whole "
        "chain. Map-only explode; corpus-scale parallelism is the "
        "file sharding CommonCrawl provides",
)
def multimodal_warc_extract(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import warc as warc_ops
    from mongo2pq_spark.operators.text import html_extract_text
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).filter(F.col("doc_id") < 200)

    def build_batches(batches):
        import pandas as pd

        from mongo2pq_spark.operators.warc import build_warc_stub

        for pdf in batches:
            payloads = []
            for d, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                uri = f"http://site{d % 5}.example/p/{d}"
                html = (
                    f"<html><head><title>Page {d}</title>"
                    '<script>var x="<p>";</script></head><body>'
                    "<h1>A &amp; B &lt;ok&gt;</h1><p>"
                    f"{text}</p><!-- c --></body></html>"
                ).encode()
                payloads.append(
                    build_warc_stub(
                        [
                            {"warc_type": "warcinfo", "uri": "none",
                             "date": "2024-01-01T00:00:00Z",
                             "body": b"software: fixture"},
                            {"warc_type": "request", "uri": uri,
                             "date": "2024-01-01T00:00:00Z",
                             "body": b"GET / HTTP/1.1\r\n\r\n"},
                            {"warc_type": "response", "uri": uri,
                             "date": "2024-01-01T00:00:00Z",
                             "status": [200, 404, 503][d % 3],
                             "content_type": "text/html",
                             "body": html},
                        ]
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    files = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    recs = warc_ops.warc_records(files).filter(
        F.col("warc_type") == "response"
    )
    html_rows = recs.select(
        "doc_id",
        "rec_idx",
        "http_status",
        "target_uri",
        F.col("body").cast("string").alias("html"),
    )
    extracted = html_extract_text(
        html_rows.select("doc_id", "html"), html_col="html"
    ).select(
        F.col("doc_id").alias("e_doc_id"),
        F.md5("text").alias("text_md5"),
        "n_chars",
    )
    return html_rows.join(
        extracted, html_rows["doc_id"] == extracted["e_doc_id"]
    ).select("doc_id", "rec_idx", "http_status", "target_uri",
             "text_md5", "n_chars")


@register(
    "multimodal_archive_manifest",
    """
    WITH d AS (
        SELECT doc_id,
               1 + doc_id % 4 AS ne,
               doc_id % 2 = 0 AS is_zip
        FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           CAST(j.i AS INTEGER) AS entry_idx,
           CASE WHEN is_zip THEN 'zip' ELSE 'tar' END AS archive_fmt,
           'f' || CAST(j.i AS VARCHAR) || '.txt' AS name,
           CAST(length('payload-' || CAST(doc_id AS VARCHAR) || '-'
                || CAST(j.i AS VARCHAR) || '-')
                + doc_id % 64 + j.i AS BIGINT) AS n_bytes,
           (is_zip AND j.i % 2 = 1) AS compressed,
           md5('payload-' || CAST(doc_id AS VARCHAR) || '-'
               || CAST(j.i AS VARCHAR) || '-'
               || repeat('y', CAST(doc_id % 64 + j.i AS INTEGER)))
               AS content_md5
    FROM d, generate_series(0, 3) j(i)
    WHERE j.i < ne
    """,
    doc="archive-container ingestion on the formats datasets ship in: "
        "per-doc ZIP (alternating stored/deflated entries) and POSIX "
        "tar fixtures with closed-form entry contents are built and "
        "exploded to per-entry manifests by operators/archives.py — "
        "and the manifest carries CONTENT digests, so the ZIP rows "
        "prove REAL DEFLATE decompression (stdlib zlib — a true "
        "codec, unlike the header-walk families), not just a "
        "directory listing. The oracle recomputes every name, size, "
        "compression flag, and content md5 closed-form. Encrypted "
        "ZIP entries decode too since r17 (traditional ZipCrypto "
        "stream cipher, operators/archives.py:268, value-oracled by "
        "multimodal_zip_encrypted_manifest); only AES-extra-field "
        "zips remain a typed refusal. Map-only explode, whole-file "
        "units like gzip (parallelism = the many-archives sharding "
        "real dumps have)",
)
def multimodal_archive_manifest(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import archives as arc
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def build_batches(batches):
        import pandas as pd

        from mongo2pq_spark.operators.archives import (
            build_tar_stub,
            build_zip_stub,
        )

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                entries = [
                    (
                        f"f{i}.txt",
                        f"payload-{d}-{i}-".encode()
                        + b"y" * (d % 64 + i),
                    )
                    for i in range(1 + d % 4)
                ]
                if d % 2 == 0:
                    payloads.append(
                        build_zip_stub(
                            [(n, c, i % 2 == 1)
                             for i, (n, c) in enumerate(entries)]
                        )
                    )
                else:
                    payloads.append(build_tar_stub(entries))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    files = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    return arc.archive_manifest(files)


@register(
    "multimodal_zip_encrypted_manifest",
    """
    WITH d AS (
        SELECT doc_id FROM documents WHERE doc_id < 150
    )
    SELECT doc_id,
           CAST(j.i AS INTEGER) AS entry_idx,
           list_extract(['doc.txt', 'meta/info.json', 'pad.bin'],
                        CAST(j.i AS INTEGER) + 1) AS name,
           CAST(list_extract(
               [length('secret-' || CAST(doc_id AS VARCHAR) || '-x'),
                length('{"id": ' || CAST(doc_id AS VARCHAR) || '}'),
                doc_id % 97],
               CAST(j.i AS INTEGER) + 1) AS BIGINT) AS n_bytes,
           j.i = 1 AS compressed,
           md5(list_extract(
               ['secret-' || CAST(doc_id AS VARCHAR) || '-x',
                '{"id": ' || CAST(doc_id AS VARCHAR) || '}',
                repeat('z', CAST(doc_id % 97 AS INTEGER))],
               CAST(j.i AS INTEGER) + 1)) AS content_md5
    FROM d, generate_series(0, 2) j(i)
    """,
    doc="traditional-ZipCrypto ENCRYPTED archives decode for real "
        "(r17 — retires the encrypted-zip stub): per-doc ZIPs whose "
        "three entries (stored text, deflated JSON, stored filler) "
        "are encrypted by the hand-rolled PKWARE APPNOTE §6.1 cipher "
        "(fixture side; stdlib zipfile has no encrypting writer) and "
        "decrypted by stdlib zipfile's native ZipCrypto support with "
        "the per-doc password. The manifest's content digests only "
        "match the oracle's closed-form md5s if the plaintext was "
        "truly recovered — key schedule, stream bytes, 12-byte "
        "header check, and the deflate layered beneath the cipher. "
        "Wrong/missing passwords and AES (AE-x) entries are typed "
        "refusals. Map-only explode",
)
def multimodal_zip_encrypted_manifest(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import archives as arc
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 150
    )

    def build_batches(batches):
        import pandas as pd

        from mongo2pq_spark.operators.archives import build_zip_stub

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                entries = [
                    ("doc.txt", f"secret-{d}-x".encode(), False),
                    ("meta/info.json", b'{"id": %d}' % d, True),
                    ("pad.bin", b"z" * (d % 97), False),
                ]
                payloads.append(
                    build_zip_stub(entries, password=b"corpus-key")
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    files = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    return arc.archive_manifest(files, password=b"corpus-key").select(
        "doc_id", "entry_idx", "name", "n_bytes", "compressed",
        "content_md5",
    )


@register(
    "multimodal_archive_compression_matrix",
    """
    WITH d AS (
        SELECT doc_id, CAST(doc_id % 5 AS INTEGER) AS v
        FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           CAST(j.i AS INTEGER) AS entry_idx,
           list_extract(['tar.gz', 'tar.bz2', 'tar.xz', 'zip', 'zip'],
                        v + 1) AS archive_fmt,
           'e' || CAST(j.i AS VARCHAR) || '.txt' AS name,
           CAST(length('blob-' || CAST(doc_id AS VARCHAR) || '-'
                || CAST(j.i AS VARCHAR) || '-')
                + doc_id % 53 + j.i AS BIGINT) AS n_bytes,
           TRUE AS compressed,
           md5('blob-' || CAST(doc_id AS VARCHAR) || '-'
               || CAST(j.i AS VARCHAR) || '-'
               || repeat('w', CAST(doc_id % 53 + j.i AS INTEGER)))
               AS content_md5
    FROM d, generate_series(0, 1) j(i)
    """,
    doc="the compressed-archive matrix corpus releases actually ship "
        "(r17): per-doc fixtures rotate through tar.gz / tar.bz2 / "
        "tar.xz stream-compressed tars (sniffed by magic, inflated "
        "via stdlib gzip/bz2/lzma) and ZIPs whose entries use the "
        "bzip2 (method 12) and LZMA (method 14) compress types — "
        "all five decompress for REAL, and the manifest's content "
        "digests only match the oracle's closed-form md5s if the "
        "member plaintext was truly recovered through the codec. "
        "Retires the 'deflate-only' archive boundary; WinZip-AES "
        "entries remain the one library-bound refusal. Map-only "
        "Arrow-batched explode, whole-file units (parallelism = the "
        "many-archives sharding a real dump already has)",
)
def multimodal_archive_compression_matrix(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import archives as arc
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def build_batches(batches):
        import pandas as pd

        from mongo2pq_spark.operators.archives import (
            build_tar_stub,
            build_zip_stub,
        )

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                entries = [
                    (
                        f"e{i}.txt",
                        f"blob-{d}-{i}-".encode() + b"w" * (d % 53 + i),
                    )
                    for i in range(2)
                ]
                v = d % 5
                if v < 3:
                    payloads.append(
                        build_tar_stub(
                            entries,
                            compression=["gz", "bz2", "xz"][v],
                        )
                    )
                else:
                    method = 12 if v == 3 else 14
                    payloads.append(
                        build_zip_stub(
                            [(n, c, method) for n, c in entries]
                        )
                    )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    files = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    return arc.archive_manifest(files)


@register(
    "multimodal_flac_streaminfo",
    """
    WITH d AS (
        SELECT doc_id,
               list_extract([44100, 48000, 96000, 192000],
                            1 + CAST(doc_id % 4 AS INTEGER)) AS sr,
               1 + CAST(doc_id % 8 AS INTEGER) AS ch,
               CASE WHEN doc_id % 2 = 0 THEN 16 ELSE 24 END AS bps,
               1000 + doc_id * 37 AS ts
        FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           CAST(sr AS INTEGER) AS sample_rate,
           CAST(ch AS INTEGER) AS channels,
           CAST(bps AS INTEGER) AS bps,
           CAST(ts AS BIGINT) AS total_samples,
           CAST(ts * 1000 // sr AS BIGINT) AS duration_ms,
           md5('flac-' || CAST(doc_id AS VARCHAR)) AS raw_md5
    FROM d
    """,
    doc="FLAC STREAMINFO triage, end to end: structurally real FLAC "
        "headers (magic + the 34-byte STREAMINFO bitfield + 0-2 "
        "PADDING blocks with correct last-block flags; closed-form "
        "rate/channels/bit-depth/sample-count rule, the embedded "
        "raw-PCM md5 itself md5-derived so SQL recomputes it) are "
        "built and parsed back by the pure-stdlib bitfield reader "
        "(operators/audio.py::parse_flac_streaminfo) — the "
        "pre-decode filter for the LOSSLESS-audio corpus (duration "
        "windows, hi-res routing, channel layout, the integrity "
        "digest). Completes the audio-container matrix: WAV decodes "
        "for real, MP3 walks frames, FLAC reads STREAMINFO — and as "
        "of r16 fully decodes too (multimodal_flac_pcm_roundtrip). "
        "Map-only",
)
def multimodal_flac_streaminfo(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import audio as audio_ops
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def build_batches(batches):
        import hashlib

        import pandas as pd

        from mongo2pq_spark.operators.audio import build_flac_stub

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                payloads.append(
                    build_flac_stub(
                        [44100, 48000, 96000, 192000][d % 4],
                        1 + d % 8,
                        16 if d % 2 == 0 else 24,
                        1000 + d * 37,
                        md5_raw=hashlib.md5(f"flac-{d}".encode()).digest(),
                        n_padding_blocks=d % 3,
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    files = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    return audio_ops.flac_metadata(files)


@register(
    "multimodal_flac_pcm_roundtrip",
    """
    WITH d AS (
        SELECT doc_id, 1 + doc_id % 2 AS channels,
               80 + (doc_id % 20) * 8 AS frames
        FROM documents WHERE doc_id < 200
    ),
    s AS (
        SELECT d.doc_id, d.channels, d.frames,
               ((31 * d.doc_id + 17 * i.i + 57 * c.i) % 2003) - 1001 AS v
        FROM d, generate_series(0, 1) c(i), generate_series(0, 231) i(i)
        WHERE c.i < d.channels AND i.i < d.frames
    )
    SELECT doc_id,
           CAST(max(channels) AS INTEGER) AS channels,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(max(frames) AS BIGINT) AS n_frames,
           CAST(max(frames) // 8 AS BIGINT) AS duration_ms,
           CAST(sum(v) AS BIGINT) AS sample_sum,
           CAST(max(abs(v)) AS INTEGER) AS peak_abs,
           true AS md5_ok
    FROM s GROUP BY doc_id
    """,
    doc="REAL FLAC decode, end to end (VERDICT r15 #7 — retires the "
        "lossless-audio FRAME-decode stub): the WAV roundtrip's "
        "deterministic int16 streams are ENCODED to spec-conformant "
        "FLAC (operators/flac.py — CONSTANT/FIXED/LPC subframes, "
        "rice/escape partitioned residuals, wasted bits, and per-doc "
        "rotation through all four stereo assignments incl. "
        "left/side, right/side and mid/side decorrelation at 17-bit "
        "side width; 64-sample blocks so every doc spans multiple "
        "frames with CRC-8/CRC-16 and sequence checks) and fully "
        "DECODED back inside Arrow-batched mapInPandas, emitting the "
        "same corpus-filter scalars plus md5_ok — the STREAMINFO "
        "raw-PCM md5 recomputed over the DECODED output, the in-band "
        "bit-exactness proof. The oracle recomputes everything from "
        "the generation rule alone, so a hash match proves rice + "
        "predictor + decorrelation decode = identity on executors. "
        "Map-only, no shuffle — the 100 TB lossless-audio corpus "
        "shape (remaining audio stub: lossy MP3 SAMPLE synthesis; "
        "its metadata/frame walk is real)",
)
def multimodal_flac_pcm_roundtrip(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import flac as flac_ops
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def build_batches(batches):
        import numpy as np
        import pandas as pd

        from mongo2pq_spark.operators.flac import encode_flac

        modes = ["left_side", "mid_side", "right_side", "auto"]
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                channels = 1 + d % 2
                frames = 80 + (d % 20) * 8
                i, c = np.meshgrid(
                    np.arange(frames), np.arange(channels), indexing="ij"
                )
                samples = (31 * d + 17 * i + 57 * c) % 2003 - 1001
                payloads.append(
                    encode_flac(
                        samples,
                        8000,
                        16,
                        block_size=64,
                        stereo_mode=(
                            modes[d % 4] if channels == 2
                            else "independent"
                        ),
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    files = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    return flac_ops.flac_pcm_stats(files)


@register(
    "multimodal_flac_wav_crosscodec",
    """
    WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 200),
    s AS (
        SELECT doc_id, i.i AS i,
               (1 + (doc_id % 2) * 3) *
               (((29 * (i.i + 1) * ((doc_id // 2) % 50 + 7)
                  + 37 * i.i) % 1801) - 900) AS v
        FROM d, generate_series(0, 60) i(i)
    ),
    h AS (
        SELECT a.doc_id,
               CAST(sum(CASE WHEN abs(b.v) > abs(a.v)
                             THEN CAST(1 AS BIGINT) << a.i
                             ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS afp
        FROM s a JOIN s b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        WHERE a.i < 60
        GROUP BY a.doc_id
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.afp, b.afp)) AS hamming
    FROM h a JOIN h b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.afp, b.afp)) <= 3
    """,
    doc="CROSS-CODEC audio near-dedup, WAV x FLAC (r16 — the audio "
        "sibling of multimodal_crosscodec_neardup): each base stream "
        "(indexed doc_id//2, 61 closed-form int16 frames) exists "
        "twice in the corpus — doc 2k as mono RIFF/WAVE at unit "
        "gain, doc 2k+1 as STEREO channel-duplicated FLAC at 4x "
        "gain (completely different bytes, containers, channel "
        "layouts AND loudness) — and audio_fingerprint now decodes "
        "BOTH through the magic-sniffing decode_audio_samples "
        "(FLAC via the full r16 codec, md5-verified). The envelope "
        "hash is gain- and channel-duplication-invariant, so every "
        "twin pair MUST land at Hamming 0; the oracle recomputes the "
        "hashes from the sample rule alone (gain cancels in the "
        "|v| comparisons) and takes brute-force pairs, so the value "
        "match proves FLAC decode ∘ fingerprint == WAV decode ∘ "
        "fingerprint — codec-invariant dedup identity, the property "
        "a re-encoded-audio crawl needs. Banding via the same "
        "audited pigeonhole equi-join, never all-pairs",
)
def multimodal_flac_wav_crosscodec(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import audio as audio_ops
    from mongo2pq_spark.operators.dedup import hamming_near_pairs
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def build_batches(batches):
        import numpy as np
        import pandas as pd

        from mongo2pq_spark.operators.audio import encode_wav
        from mongo2pq_spark.operators.flac import encode_flac

        i = np.arange(61)
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                gain = 1 + (d % 2) * 3
                v = gain * (
                    (29 * (i + 1) * ((d // 2) % 50 + 7) + 37 * i) % 1801
                    - 900
                )
                if d % 2 == 0:
                    payloads.append(encode_wav(v.astype("int16"), 8000))
                else:
                    stereo = np.repeat(v[:, None], 2, axis=1)
                    payloads.append(
                        encode_flac(stereo, 8000, 16, block_size=64)
                    )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    with_audio = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    fp = audio_ops.audio_fingerprint(with_audio)
    return hamming_near_pairs(fp, "afp", max_hamming=3, bits=60)


@register(
    "multimodal_wav_codec_matrix",
    """
    WITH base AS (
        SELECT doc_id, CAST(doc_id % 4 AS INTEGER) AS fmt, i.i AS i
        FROM documents, generate_series(0, 60) i(i)
        WHERE doc_id < 200
    ),
    s AS (
        SELECT doc_id, fmt, i,
               255 - ((7 * doc_id + 13 * i) % 256) AS u,
               ((u % 16) * 8 + 132) * (1 << ((u // 16) % 8)) AS t,
               xor((11 * doc_id + 29 * i) % 256, 85) AS a,
               CASE WHEN (a // 16) % 8 = 0 THEN (a % 16) * 16 + 8
                    ELSE ((a % 16) * 16 + 264)
                         * (1 << ((a // 16) % 8 - 1)) END AS amag,
               CASE WHEN fmt < 2
                    THEN ((31 * doc_id + 17 * i) % 2003) - 1001
                    WHEN fmt = 2 AND u >= 128 THEN 132 - t
                    WHEN fmt = 2 THEN t - 132
                    WHEN a >= 128 THEN amag
                    ELSE -amag END AS v
        FROM base
    )
    SELECT doc_id,
           CAST(1 AS INTEGER) AS channels,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(61 AS BIGINT) AS n_frames,
           CAST(7 AS BIGINT) AS duration_ms,
           CAST(sum(v) AS BIGINT) AS sample_sum,
           CAST(max(abs(v)) AS INTEGER) AS peak_abs
    FROM s GROUP BY doc_id
    """,
    doc="the WAV codec MATRIX (r16 — retires the float and BOTH "
        "G.711 decode stubs): one corpus mixing all four real WAV "
        "formats per doc_id%4 — int16 PCM, IEEE float32 (f = v/32768, decoded "
        "back to exactly v under the documented scale-32768 "
        "convention), and G.711 µ-law (bytes from a closed-form rule, "
        "decoded through the public companding formula — complement, "
        "4-bit mantissa, 3-bit segment exponent, 0x84 bias), and "
        "G.711 A-law (0x55 toggle, 13-bit segments — the European "
        "half); the oracle RESTATES both companding formulas in SQL "
        "(lateral aliases u/t and a/amag), so the value match proves "
        "the engine's tables ARE the G.711 curves — all flowing "
        "through ONE codec-dispatching "
        "wav_audio_stats with identical integer statistics columns. "
        "The telephony-corpus reality this models: a speech crawl "
        "ships µ-law, studio masters ship float, fixtures ship PCM, "
        "and the filter stage must treat them identically. Map-only; "
        "remaining WAV stub: ADPCM",
)
def multimodal_wav_codec_matrix(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import audio as audio_ops
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def build_batches(batches):
        import numpy as np
        import pandas as pd

        from mongo2pq_spark.operators.audio import (
            alaw_decode_table,
            encode_wav,
            mulaw_decode_table,
        )

        i = np.arange(61)
        tab_u = mulaw_decode_table()
        tab_a = alaw_decode_table()
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                if d % 4 < 2:
                    v = (31 * d + 17 * i) % 2003 - 1001
                    if d % 4 == 0:
                        payloads.append(
                            encode_wav(v.astype("int16"), 8000)
                        )
                    else:
                        payloads.append(
                            encode_wav(v / 32768.0, 8000, "float32")
                        )
                elif d % 4 == 2:
                    pcm = tab_u[(7 * d + 13 * i) % 256]
                    payloads.append(encode_wav(pcm, 8000, "mulaw"))
                else:
                    pcm = tab_a[(11 * d + 29 * i) % 256]
                    payloads.append(encode_wav(pcm, 8000, "alaw"))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    files = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    return audio_ops.wav_audio_stats(files)


@register(
    "multimodal_wav_pcm_widths",
    """
    WITH d AS (
        SELECT doc_id, CAST(doc_id % 3 AS INTEGER) AS v,
               200 + doc_id % 50 AS nf
        FROM documents WHERE doc_id < 180
    ),
    samp AS (
        SELECT d.doc_id, d.v, d.nf,
               CASE d.v
               WHEN 0 THEN
                   (997 * d.doc_id + 13 * i.i) % 16777216 - 8388608
               WHEN 1 THEN
                   (997 * d.doc_id + 13 * i.i) % 4294967296
                   - 2147483648
               ELSE (997 * d.doc_id + 13 * i.i) % 65536 - 32768
               END AS s
        FROM d, generate_series(0, 249) i(i)
        WHERE i.i < d.nf
    ),
    agg AS (
        SELECT doc_id, v, nf, SUM(s) AS ss, MAX(ABS(s)) AS pk
        FROM samp GROUP BY doc_id, v, nf
    )
    SELECT doc_id,
           list_extract(['pcm24', 'pcm32', 'float64'], v + 1) AS fmt,
           CAST(1 AS INTEGER) AS channels,
           CAST(list_extract([44100, 48000, 16000], v + 1)
                AS INTEGER) AS sample_rate,
           CAST(nf AS BIGINT) AS n_frames,
           CAST(nf * 1000 // list_extract([44100, 48000, 16000], v + 1)
                AS BIGINT) AS duration_ms,
           CAST(ss AS BIGINT) AS sample_sum,
           CAST(pk AS INTEGER) AS peak_abs
    FROM agg
    """,
    doc="the remaining real-world WAV sample widths decode (r17 "
        "session 2 — retires the 8/16-bit-only PCM boundary): "
        "per-doc fixtures rotate through 24-bit PCM (3-byte "
        "little-endian signed — the studio-master width), 32-bit "
        "integer PCM, and IEEE float64 (k/32768 decodes to exactly "
        "k under the documented scale-32768 convention) — samples a "
        "closed form of (doc_id, i) spanning the FULL signed domain "
        "of each width, variant-specific rates and frame counts "
        "proving geometry decode too. The oracle recomputes exact "
        "sums/peaks from the generation rule. No integer-PCM width "
        "remains stubbed; the one WAV refusal left is exotic "
        "format codes. Map-only through the shared codec-"
        "dispatching wav_audio_stats",
)
def multimodal_wav_pcm_widths(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import audio as audio_ops
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 180
    )

    def build_batches(batches):
        import numpy as np
        import pandas as pd

        from mongo2pq_spark.operators.audio import encode_wav

        rates = [44100, 48000, 16000]
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                v = d % 3
                nf = 200 + d % 50
                i = np.arange(nf, dtype="int64")
                base = 997 * d + 13 * i
                if v == 0:
                    s = base % (1 << 24) - (1 << 23)
                    p = encode_wav(s, rates[0], "pcm24")
                elif v == 1:
                    s = (base % (1 << 32) - (1 << 31)).astype("int32")
                    p = encode_wav(s, rates[1], "pcm32")
                else:
                    k = base % 65536 - 32768
                    p = encode_wav(k / 32768.0, rates[2], "float64")
                payloads.append(p)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    files = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    names = F.array(*[F.lit(s) for s in ["pcm24", "pcm32", "float64"]])
    return audio_ops.wav_audio_stats(files).select(
        "doc_id",
        F.element_at(
            names, (F.col("doc_id") % 3).cast("int") + 1
        ).alias("fmt"),
        "channels", "sample_rate", "n_frames", "duration_ms",
        "sample_sum", "peak_abs",
    )


def _ima_adpcm_oracle() -> str:
    """DuckDB mirror of the IMA-ADPCM decoder: the public algorithm
    restated as a RECURSIVE CTE — the step table as VALUES, the
    per-sample recursion carrying (predictor, step index, running
    sum, running peak) through the same delta reconstruction,
    clamps, and index walk the engine runs. The fixture is stated at
    the NIBBLE level (closed form), so the value match proves the
    engine's decode IS this algorithm, sample for sample — the
    strongest oracle a stateful codec admits."""
    from mongo2pq_spark.operators.audio import IMA_STEP_TABLE

    steps = ", ".join(
        f"({k}, {s})" for k, s in enumerate(IMA_STEP_TABLE)
    )
    return f"""
    WITH RECURSIVE st(k, s) AS (
        SELECT * FROM (VALUES {steps}) t(k, s)
    ),
    d AS (
        SELECT doc_id,
               CAST(((17 * doc_id) % 2003) - 1001 AS INTEGER) AS pred0,
               CAST(doc_id % 89 AS INTEGER) AS idx0
        FROM documents WHERE doc_id < 120
    ),
    dec AS (
        SELECT doc_id, 0 AS i, pred0 AS pred, idx0 AS idx,
               CAST(pred0 AS BIGINT) AS ssum,
               CAST(abs(pred0) AS INTEGER) AS pmax
        FROM d
        UNION ALL
        SELECT doc_id, i + 1, np,
               CAST(least(88, greatest(0, idx + itab)) AS INTEGER),
               ssum + np,
               CAST(greatest(pmax, abs(np)) AS INTEGER)
        FROM (
            SELECT *,
                   CAST(least(32767, greatest(-32768,
                        pred + CASE WHEN nib >= 8 THEN -dd
                                    ELSE dd END)) AS INTEGER) AS np
            FROM (
                SELECT dec.*,
                       (3 * dec.doc_id + 5 * dec.i) % 16 AS nib,
                       st.s // 8
                       + CASE WHEN nib % 2 = 1 THEN st.s // 4
                              ELSE 0 END
                       + CASE WHEN (nib // 2) % 2 = 1 THEN st.s // 2
                              ELSE 0 END
                       + CASE WHEN (nib // 4) % 2 = 1 THEN st.s
                              ELSE 0 END AS dd,
                       CASE nib % 8 WHEN 4 THEN 2 WHEN 5 THEN 4
                            WHEN 6 THEN 6 WHEN 7 THEN 8
                            ELSE -1 END AS itab
                FROM dec JOIN st ON st.k = dec.idx
                WHERE dec.i < 60
            ) q1
        ) q2
    )
    SELECT doc_id,
           CAST(1 AS INTEGER) AS channels,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(61 AS BIGINT) AS n_frames,
           CAST(7 AS BIGINT) AS duration_ms,
           CAST(ssum AS BIGINT) AS sample_sum,
           CAST(pmax AS INTEGER) AS peak_abs
    FROM dec WHERE i = 60
    """


@register(
    "multimodal_jpeg_subsampled_roundtrip",
    """
    SELECT doc_id,
           CAST(32 AS INTEGER) AS width,
           CAST(32 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS channels,
           CAST(3 * 256 * sum((7 * doc_id + 31 * mx.i + 57 * my.i)
                              % 256) AS BIGINT) AS pixel_sum,
           CAST(3072 AS BIGINT) AS n_pixels
    FROM documents,
         generate_series(0, 1) mx(i),
         generate_series(0, 1) my(i)
    WHERE doc_id < 150
    GROUP BY doc_id
    """,
    doc="CHROMA-SUBSAMPLED JPEG decode, end to end (r16 — retires "
        "the 4:4:4-only envelope; 4:2:0 is what camera/encoder "
        "output overwhelmingly ships): 32x32 RGB images built from "
        "2x2 grids of CONSTANT 16x16 achromatic macroblocks are "
        "encoded with the full interleaved-MCU layout — each doc "
        "alternating 4:2:0 (four Y blocks + box-downsampled Cb/Cr "
        "per MCU) and 4:2:2 per doc_id parity, SOF sampling factors "
        "and T.81 A.2.3 block order for real — and decoded back "
        "through the generalized MCU walk + box chroma upsample. "
        "Achromatic constant macroblocks survive RGB→YCbCr→"
        "downsample→DCT→upsample→RGB BIT-EXACTLY, so the oracle "
        "recomputes exact integer pixel sums from the generation "
        "rule alone: the hash match proves the subsampled scan "
        "layout, per-component block ordering, and chroma "
        "resampling are all decoded correctly. Map-only; progressive "
        "and restart-interval variants decode too as of r17 "
        "(multimodal_jpeg_progressive_roundtrip), 12-bit precision "
        "incl. color/progressive as of r18 — the one JPEG stub left "
        "is arithmetic coding (Table D.3 data dependency)",
)
def multimodal_jpeg_subsampled_roundtrip(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import jpeg as jpeg_ops
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 150
    )

    def build_batches(batches):
        import numpy as np
        import pandas as pd

        from mongo2pq_spark.operators.jpeg import encode_jpeg

        ones16 = np.ones((16, 16), dtype="uint8")
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                mac = np.array(
                    [
                        [(7 * d + 31 * mx + 57 * my) % 256
                         for mx in range(2)]
                        for my in range(2)
                    ],
                    dtype="uint8",
                )
                gray = np.kron(mac, ones16)
                rgb = np.stack([gray] * 3, axis=2)
                payloads.append(
                    encode_jpeg(
                        rgb,
                        subsampling="420" if d % 2 == 0 else "422",
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    files = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    return jpeg_ops.jpeg_pixel_stats(files)


@register(
    "multimodal_jpeg_progressive_roundtrip",
    """
    SELECT doc_id,
           CAST(32 AS INTEGER) AS width,
           CAST(32 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS channels,
           CAST(3 * 256 * sum((11 * doc_id + 37 * mx.i + 53 * my.i)
                              % 256) AS BIGINT) AS pixel_sum,
           CAST(3072 AS BIGINT) AS n_pixels
    FROM documents,
         generate_series(0, 1) mx(i),
         generate_series(0, 1) my(i)
    WHERE doc_id < 150
    GROUP BY doc_id
    """,
    doc="PROGRESSIVE JPEG decode, end to end (r17 — VERDICT r16 #6, "
        "the largest real-world JPEG tail after subsampling): 32x32 "
        "RGB images of constant achromatic 16x16 macroblocks are "
        "encoded three ways by doc_id residue — an SOF2 progressive "
        "scan script (interleaved DC first pass with successive "
        "approximation Al=1, per-component spectral-selection AC "
        "bands 1-5/6-63, AC refinement passes with EOB runs and "
        "correction bits, final DC refinement) at 4:2:0 and at "
        "4:4:4, and BASELINE with RESTART MARKERS (DRI + "
        "sequence-validated RSTn, DC predictors reset per interval). "
        "Successive approximation is exact once every pass lands, so "
        "constant macroblocks survive the whole pipeline BIT-EXACTLY "
        "whichever transport carried them — the oracle recomputes "
        "exact integer pixel sums from the generation rule alone, "
        "and a hash match proves the progressive coefficient "
        "accumulation, EOB-run bookkeeping, refinement bits, and "
        "restart segmentation all decode correctly. Map-only; "
        "12-bit precision incl. color/progressive decodes as of r18 "
        "— the one JPEG stub left is arithmetic coding",
)
def multimodal_jpeg_progressive_roundtrip(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import jpeg as jpeg_ops
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 150
    )

    def build_batches(batches):
        import numpy as np
        import pandas as pd

        from mongo2pq_spark.operators.jpeg import (
            encode_jpeg,
            encode_jpeg_progressive,
        )

        ones16 = np.ones((16, 16), dtype="uint8")
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                mac = np.array(
                    [
                        [(11 * d + 37 * mx + 53 * my) % 256
                         for mx in range(2)]
                        for my in range(2)
                    ],
                    dtype="uint8",
                )
                rgb = np.stack([np.kron(mac, ones16)] * 3, axis=2)
                if d % 3 == 0:
                    payloads.append(
                        encode_jpeg(rgb, restart_interval=1 + d % 7)
                    )
                elif d % 3 == 1:
                    payloads.append(
                        encode_jpeg_progressive(rgb, subsampling="420")
                    )
                else:
                    payloads.append(
                        encode_jpeg_progressive(rgb, subsampling="444")
                    )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    files = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    return jpeg_ops.jpeg_pixel_stats(files)


@register(
    "multimodal_gif_pixel_roundtrip",
    """
    SELECT doc_id,
           CAST(16 AS INTEGER) AS width,
           CAST(16 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS channels,
           CAST(sum((17 * k) % 256 + (29 * k) % 256 + (43 * k) % 256)
               AS BIGINT) AS pixel_sum,
           CAST(768 AS BIGINT) AS n_pixels
    FROM (
        SELECT doc_id,
               (doc_id + 3 * x.i + 5 * y.i) % 8 AS k
        FROM documents,
             generate_series(0, 15) x(i),
             generate_series(0, 15) y(i)
        WHERE doc_id < 150
    )
    GROUP BY doc_id
    """,
    doc="GIF pixel decode, end to end (r17 — the last library-free "
        "image stub retired; PNG/JPEG/BMP/GIF now all decode for "
        "real): 16x16 frames with a deterministic 8-color palette "
        "and index rule are LZW-encoded (real variable-width codes) "
        "and decoded back through operators/multimodal.py::"
        "decode_gif_pixels — sub-block reassembly, code-width "
        "growth, palette indexing — with per-doc variants: odd docs "
        "INTERLACED (the four-pass row reorder must invert exactly), "
        "every third doc carrying trailing animation frames (triage "
        "decodes frame 0). Palette indexing is exact, so the oracle "
        "states integer pixel sums closed-form from the palette and "
        "index rules alone. Map-only; GIF joins the magic dispatch, "
        "so dHash/pHash dedup now covers GIF corpora too",
)
def multimodal_gif_pixel_roundtrip(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators.multimodal import (
        decode_gif_pixels,
        pixel_stats_with,
    )
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 150
    )

    def build_batches(batches):
        import numpy as np
        import pandas as pd

        from mongo2pq_spark.operators.multimodal import build_gif_pixels

        pal = [
            ((17 * i) % 256, (29 * i) % 256, (43 * i) % 256)
            for i in range(8)
        ]
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                idx = (
                    (d + np.add.outer(
                        5 * np.arange(16), 3 * np.arange(16)
                    )) % 8
                ).astype("uint8")
                payloads.append(
                    build_gif_pixels(
                        idx,
                        pal,
                        interlace=d % 2 == 1,
                        trailing_frames=2 if d % 3 == 0 else 0,
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    files = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    return pixel_stats_with(decode_gif_pixels, files)


@register(
    "multimodal_gif_subframe_composite",
    """
    WITH d AS (
        SELECT doc_id,
               doc_id % 9 AS lf,
               doc_id % 7 AS tp,
               CAST(doc_id % 4 AS INTEGER) AS bg
        FROM documents WHERE doc_id < 200
    ),
    frame AS (
        SELECT d.doc_id,
               SUM((7 * ((d.doc_id + 2 * x.i + 3 * y.i) % 8) + 1) % 256
                 + (11 * ((d.doc_id + 2 * x.i + 3 * y.i) % 8) + 3) % 256
                 + (13 * ((d.doc_id + 2 * x.i + 3 * y.i) % 8) + 5) % 256)
                   AS fs
        FROM d, generate_series(0, 7) x(i), generate_series(0, 9) y(i)
        GROUP BY d.doc_id
    )
    SELECT d.doc_id,
           CAST(24 AS INTEGER) AS width,
           CAST(18 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS channels,
           CAST(frame.fs
                + (24 * 18 - 80)
                  * ((7 * d.bg + 1) % 256 + (11 * d.bg + 3) % 256
                     + (13 * d.bg + 5) % 256)
                AS BIGINT) AS pixel_sum
    FROM d JOIN frame ON frame.doc_id = d.doc_id
    """,
    doc="GIF sub-frame compositing (r17 session 2 — retires the "
        "last GIF decode refusal): 10×8 frames placed at per-doc "
        "(left, top) offsets on a 24×18 logical screen whose "
        "background color index varies per doc, odd docs ALSO "
        "interlaced — decode must fill the uncovered canvas with "
        "the header's background color and place the frame at its "
        "offset exactly (the banner/sprite shape real GIFs use). "
        "The oracle recomputes the canvas sum closed-form as frame "
        "sum + (screen − frame)·background from the palette rule "
        "alone, so a hash match proves the compositing geometry "
        "AND the background lookup. Frames past the screen edge "
        "fail typed. Map-only",
)
def multimodal_gif_subframe_composite(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators.multimodal import (
        decode_gif_pixels,
        pixel_stats_with,
    )
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def build_batches(batches):
        import numpy as np
        import pandas as pd

        from mongo2pq_spark.operators.multimodal import build_gif_pixels

        pal = [
            ((7 * k + 1) % 256, (11 * k + 3) % 256, (13 * k + 5) % 256)
            for k in range(8)
        ]
        y, x = np.meshgrid(np.arange(10), np.arange(8), indexing="ij")
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                idx = ((d + 2 * x + 3 * y) % 8).astype("uint8")
                payloads.append(
                    build_gif_pixels(
                        idx, pal,
                        interlace=d % 2 == 1,
                        screen=(24, 18),
                        offset=(d % 9, d % 7),
                        background=d % 4,
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    files = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    return pixel_stats_with(decode_gif_pixels, files).select(
        "doc_id", "width", "height", "channels", "pixel_sum"
    )


@register(
    "multimodal_jpeg12_roundtrip",
    """
    SELECT doc_id,
           CAST(24 AS INTEGER) AS width,
           CAST(24 AS INTEGER) AS height,
           CAST(1 AS INTEGER) AS channels,
           CAST(64 * sum((977 * doc_id + 1021 * x.i + 1063 * y.i)
                         % 4096) AS BIGINT) AS pixel_sum,
           CAST(576 AS BIGINT) AS n_pixels
    FROM documents,
         generate_series(0, 2) x(i),
         generate_series(0, 2) y(i)
    WHERE doc_id < 150
    GROUP BY doc_id
    """,
    doc="12-BIT extended-sequential JPEG decode (r17 — SOF1, the "
        "medical/scientific grayscale shape; retires the 12-bit "
        "precision stub for the shape it actually ships in): 24x24 "
        "grayscale images of constant 8x8 blocks with values across "
        "the FULL 0..4095 domain are encoded with the widened "
        "DC/AC tables (categories to 15, sizes to 14, declared in "
        "DHT), half the docs with restart markers layered on, and "
        "decoded back bit-exact — the oracle's closed-form pixel "
        "sums exceed any 8-bit-domain value, so a hash match proves "
        "the 2048 level shift, the wide-category Huffman decode, "
        "and the uint16 output path. 12-bit color and progressive "
        "decode too as of r18 (multimodal_jpeg12_color_roundtrip); "
        "the one JPEG stub left is arithmetic coding. Map-only",
)
def multimodal_jpeg12_roundtrip(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators.jpeg import decode_jpeg_pixels
    from mongo2pq_spark.operators.multimodal import pixel_stats_with
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 150
    )

    def build_batches(batches):
        import numpy as np
        import pandas as pd

        from mongo2pq_spark.operators.jpeg import encode_jpeg

        ones8 = np.ones((8, 8), dtype=int)
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                blocks = np.array(
                    [
                        [(977 * d + 1021 * bx + 1063 * by) % 4096
                         for bx in range(3)]
                        for by in range(3)
                    ]
                )
                img = np.kron(blocks, ones8).astype("uint16")
                payloads.append(
                    encode_jpeg(
                        img,
                        precision=12,
                        restart_interval=2 if d % 2 == 1 else None,
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    files = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    return pixel_stats_with(decode_jpeg_pixels, files)


@register(
    "multimodal_tiff_pixel_roundtrip",
    """
    SELECT doc_id,
           CAST(16 AS INTEGER) AS width,
           CAST(16 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS channels,
           CAST(sum((7 * doc_id + 11 * x.i + 13 * y.i + 17 * c.i)
                    % 256) AS BIGINT) AS pixel_sum,
           CAST(768 AS BIGINT) AS n_pixels
    FROM documents,
         generate_series(0, 15) x(i),
         generate_series(0, 15) y(i),
         generate_series(0, 2) c(i)
    WHERE doc_id < 150
    GROUP BY doc_id
    """,
    doc="TIFF joins the image matrix (r17 — the scanner/archive "
        "format; operators/tiff.py): 16x16 RGB rasters from a "
        "closed-form pixel rule are written strip-organized with "
        "per-doc variants — compression NONE / TIFF-LZW (the "
        "early-change variant) / LZW+horizontal-differencing "
        "predictor / PackBits RLE by doc_id%4, BIG-endian every "
        "third doc, per-doc RowsPerStrip (1..5), a second IFD page "
        "chained every seventh doc (decode reads page 1; metadata "
        "counts the chain) — and decoded back bit-exact through the "
        "IFD walk + strip reassembly. The oracle recomputes exact "
        "integer pixel sums from the rule alone, so the hash match "
        "proves LZW, PackBits, the predictor, both byte orders, and "
        "strip geometry all decode correctly. Tiles/CCITT/"
        "JPEG-in-TIFF are typed refusals. Map-only",
)
def multimodal_tiff_pixel_roundtrip(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import tiff as tiff_ops
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 150
    )

    def build_batches(batches):
        import numpy as np
        import pandas as pd

        from mongo2pq_spark.operators.tiff import build_tiff

        x = np.arange(16)
        y = np.arange(16)
        c = np.arange(3)
        base = (
            11 * x[None, :, None]
            + 13 * y[:, None, None]
            + 17 * c[None, None, :]
        )
        variants = [(1, 1), (5, 1), (5, 2), (32773, 1)]
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                img = ((7 * d + base) % 256).astype("uint8")
                comp, pred = variants[d % 4]
                payloads.append(
                    build_tiff(
                        img,
                        compression=comp,
                        predictor=pred,
                        rows_per_strip=1 + d % 5,
                        endian=">" if d % 3 == 0 else "<",
                        extra_pages=1 if d % 7 == 0 else 0,
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    files = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    return tiff_ops.tiff_pixel_stats(files)


@register(
    "multimodal_tiff_extended_matrix",
    """
    WITH d AS (
        SELECT doc_id, CAST(doc_id % 5 AS INTEGER) AS v
        FROM documents WHERE doc_id < 200
    ),
    dim AS (
        SELECT doc_id, v,
               list_extract([16, 37, 19, 16, 11], v + 1) AS wd,
               list_extract([16, 20, 16, 16, 12], v + 1) AS ht,
               list_extract([3, 1, 1, 1, 3], v + 1) AS ch
        FROM d
    ),
    s AS (
        SELECT dim.doc_id, dim.v, dim.wd, dim.ht, dim.ch,
               SUM(CASE dim.v
                   WHEN 0 THEN
                         (dim.doc_id + 13 * x.i + 29 * y.i) % 256
                       + (dim.doc_id + 13 * x.i + 29 * y.i + 31) % 256
                       + (dim.doc_id + 13 * x.i + 29 * y.i + 62) % 256
                   WHEN 1 THEN (dim.doc_id + 5 * x.i + 7 * y.i) % 256
                   WHEN 2 THEN (dim.doc_id + x.i + y.i) % 2
                   WHEN 3 THEN
                       (997 * dim.doc_id + 257 * x.i + 513 * y.i) % 65536
                   ELSE (991 * dim.doc_id + 101 * x.i + 211 * y.i) % 65536
                      + (991 * dim.doc_id + 101 * x.i + 211 * y.i
                         + 5001) % 65536
                      + (991 * dim.doc_id + 101 * x.i + 211 * y.i
                         + 10002) % 65536
                   END) AS ps
        FROM dim,
             generate_series(0, 36) x(i),
             generate_series(0, 19) y(i)
        WHERE x.i < dim.wd AND y.i < dim.ht
        GROUP BY dim.doc_id, dim.v, dim.wd, dim.ht, dim.ch
    )
    SELECT doc_id,
           list_extract(['deflate_pred', 'tiled_lzw', 'bilevel',
                         'gray16_be', 'rgb16'], v + 1) AS variant,
           CAST(wd AS INTEGER) AS width,
           CAST(ht AS INTEGER) AS height,
           CAST(ch AS INTEGER) AS channels,
           CAST(ps AS BIGINT) AS pixel_sum
    FROM s
    """,
    doc="the widened TIFF scope decodes for real (r17 session 2 — "
        "retires the tiled/Deflate/depth refusals): per-doc fixtures "
        "rotate through Deflate-compressed RGB with horizontal-"
        "differencing predictor (stdlib zlib), TILE-organized LZW "
        "grayscale with padded edge tiles (20×37 under 16×16 tiles — "
        "how large geo/scan rasters actually ship), 1-bit bilevel "
        "scans at an odd width (byte-aligned MSB-first rows), 16-bit "
        "big-endian grayscale under Deflate+predictor (mod-65536 "
        "differencing), and 16-bit RGB under LZW — each pixel a "
        "closed form of (doc_id, x, y, channel), variant-specific "
        "geometry proving dimension decode too. The oracle "
        "recomputes exact integer sums from the generation rule, so "
        "a hash match proves decode∘encode = identity across the "
        "widened space. JPEG-in-TIFF and CCITT fax stay the typed "
        "library-bound refusals. Map-only",
)
def multimodal_tiff_extended_matrix(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import tiff as tiff_ops
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def build_batches(batches):
        import numpy as np
        import pandas as pd

        from mongo2pq_spark.operators.tiff import build_tiff

        def grid(h, w):
            return np.meshgrid(
                np.arange(h), np.arange(w), indexing="ij"
            )

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                v = d % 5
                if v == 0:
                    y, x = grid(16, 16)
                    ch = np.arange(3)
                    img = (
                        (d + 13 * x[:, :, None] + 29 * y[:, :, None]
                         + 31 * ch) % 256
                    ).astype("uint8")
                    p = build_tiff(img, compression=8, predictor=2)
                elif v == 1:
                    y, x = grid(20, 37)
                    img = ((d + 5 * x + 7 * y) % 256).astype("uint8")
                    p = build_tiff(img, compression=5, tile=(16, 16))
                elif v == 2:
                    y, x = grid(16, 19)
                    img = ((d + x + y) % 2).astype("uint8")
                    p = build_tiff(img, compression=32773, bits=1)
                elif v == 3:
                    y, x = grid(16, 16)
                    img = (
                        (997 * d + 257 * x + 513 * y) % 65536
                    ).astype("uint16")
                    p = build_tiff(
                        img, compression=8, bits=16, predictor=2,
                        endian=">",
                    )
                else:
                    y, x = grid(12, 11)
                    ch = np.arange(3)
                    img = (
                        (991 * d + 101 * x[:, :, None]
                         + 211 * y[:, :, None] + 5001 * ch) % 65536
                    ).astype("uint16")
                    p = build_tiff(img, compression=5, bits=16)
                payloads.append(p)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    files = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    names = F.array(
        *[F.lit(s) for s in
          ["deflate_pred", "tiled_lzw", "bilevel", "gray16_be", "rgb16"]]
    )
    return tiff_ops.tiff_pixel_stats(files).select(
        "doc_id",
        F.element_at(
            names, (F.col("doc_id") % 5).cast("int") + 1
        ).alias("variant"),
        "width", "height", "channels", "pixel_sum",
    )


@register(
    "multimodal_tiff_ccitt_roundtrip",
    """
    WITH s AS (
        SELECT doc_id,
               SUM(CASE WHEN (doc_id + x.i // 4 + y.i // 3) % 4 = 0
                        THEN 0 ELSE 1 END) AS ps
        FROM documents,
             generate_series(0, 20) x(i),
             generate_series(0, 17) y(i)
        WHERE doc_id < 200
        GROUP BY doc_id
    )
    SELECT doc_id,
           list_extract(['mh_rle', 'g3_1d', 'g3_2d', 'g4'],
                        CAST(doc_id % 4 AS INTEGER) + 1) AS variant,
           CAST(21 AS INTEGER) AS width,
           CAST(18 AS INTEGER) AS height,
           CAST(1 AS INTEGER) AS channels,
           CAST(ps AS BIGINT) AS pixel_sum,
           CAST(378 AS BIGINT) AS n_pixels
    FROM s
    """,
    doc="CCITT fax TIFF decodes for real (r18 — retires the least "
        "library-bound refusal left in the image matrix; VERDICT r17 "
        "#5): 21×18 bilevel scans from a blocky closed-form ink rule "
        "are written per-doc through all four fax framings — "
        "compression 2 (MH RLE, byte-aligned rows), 3 with T4Options "
        "0 (G3 1-D, EOL-framed), 3 with T4Options 1 (G3 2-D, tag "
        "bits selecting MR lines against the previous row), and 4 "
        "(T.6 G4/MMR, imaginary white reference + EOFB) — with "
        "per-doc RowsPerStrip 1..5 proving per-strip coder restart, "
        "both byte orders, photometric 0 (min-is-white, the fax "
        "norm), and every seventh doc in FillOrder 2 (the LSB-first "
        "payload layout real fax files ship — bit-reversed per "
        "byte, same pixels, so the oracle is unchanged while the "
        "driver hash now covers both fill orders). "
        "operators/ccitt.py implements the ITU-T T.4/T.6 "
        "Huffman tables and pass/horizontal/vertical READ modes in "
        "pure stdlib, the style of the LZW/rice decoders. The oracle "
        "recomputes the white-pixel count closed-form, so the hash "
        "match proves decode∘encode = identity across all four "
        "codings. Scanned-document OCR corpora — the classic 100 TB "
        "ingestion source — are overwhelmingly G4-in-TIFF. Map-only",
)
def multimodal_tiff_ccitt_roundtrip(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import tiff as tiff_ops
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def build_batches(batches):
        import numpy as np
        import pandas as pd

        from mongo2pq_spark.operators.tiff import build_tiff

        y, x = np.meshgrid(
            np.arange(18), np.arange(21), indexing="ij"
        )
        variants = [(2, False), (3, False), (3, True), (4, False)]
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                ink = (
                    ((d + x // 4 + y // 3) % 4) == 0
                ).astype("uint8")
                comp, two_d = variants[d % 4]
                payloads.append(
                    build_tiff(
                        ink,
                        compression=comp,
                        bits=1,
                        rows_per_strip=1 + d % 5,
                        endian=">" if d % 3 == 0 else "<",
                        t4_2d=two_d,
                        fill_order=2 if d % 7 == 0 else 1,
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    files = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    names = F.array(
        *[F.lit(s) for s in ["mh_rle", "g3_1d", "g3_2d", "g4"]]
    )
    return tiff_ops.tiff_pixel_stats(files).select(
        "doc_id",
        F.element_at(
            names, (F.col("doc_id") % 4).cast("int") + 1
        ).alias("variant"),
        "width", "height", "channels", "pixel_sum", "n_pixels",
    )


@register(
    "multimodal_tiff_jpeg_roundtrip",
    """
    WITH s AS (
        SELECT doc_id,
               CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END
                    AS INTEGER) AS ch,
               SUM((7 * doc_id + 31 * mx.i + 57 * my.i) % 256)
                   AS mac_sum
        FROM documents,
             generate_series(0, 2) mx(i),
             generate_series(0, 3) my(i)
        WHERE doc_id < 200
        GROUP BY doc_id
    )
    SELECT doc_id,
           list_extract(['strips', 'tables_split', 'old_style'],
                        CAST(doc_id % 3 AS INTEGER) + 1) AS variant,
           CAST(24 AS INTEGER) AS width,
           CAST(32 AS INTEGER) AS height,
           ch AS channels,
           CAST(ch * 64 * mac_sum AS BIGINT) AS pixel_sum,
           CAST(ch * 768 AS BIGINT) AS n_pixels
    FROM s
    """,
    doc="JPEG-in-TIFF decodes for real (r18 — retires the last TIFF "
        "compression refusal): 24×32 rasters of constant 8×8 "
        "macroblocks (the construction that survives the DCT "
        "bit-exactly under the all-ones quantization table) are "
        "written per-doc through all three framings scanned archives "
        "ship — new-style compression 7 with complete per-strip "
        "interchange streams, compression 7 with DQT/DHT split into "
        "the shared JPEGTables tag 347 (the Tech Note 2 layout "
        "libtiff writes), and old-style compression 6 via "
        "JPEGInterchangeFormat 513/514 — alternating grayscale and "
        "achromatic-YCbCr RGB (photometric 6), 8- and 16-row strips "
        "proving per-strip stream restart, both byte orders. Strips "
        "feed operators/jpeg.py's baseline decoder after the tag-347 "
        "table merge; the oracle recomputes exact integer pixel sums "
        "from the macroblock rule. Map-only",
)
def multimodal_tiff_jpeg_roundtrip(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import tiff as tiff_ops
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def build_batches(batches):
        import numpy as np
        import pandas as pd

        from mongo2pq_spark.operators.tiff import build_tiff

        ones8 = np.ones((8, 8), dtype="uint8")
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                mac = np.array(
                    [
                        [(7 * d + 31 * mx + 57 * my) % 256
                         for mx in range(3)]
                        for my in range(4)
                    ],
                    dtype="uint8",
                )
                gray = np.kron(mac, ones8)
                img = (
                    gray if d % 2 == 0
                    else np.stack([gray] * 3, axis=2)
                )
                v = d % 3
                payloads.append(
                    build_tiff(
                        img,
                        compression=6 if v == 2 else 7,
                        rows_per_strip=8 if v == 0 else 16,
                        jpeg_tables=v == 1,
                        endian=">" if d % 5 == 0 else "<",
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    files = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    names = F.array(
        *[F.lit(s) for s in ["strips", "tables_split", "old_style"]]
    )
    return tiff_ops.tiff_pixel_stats(files).select(
        "doc_id",
        F.element_at(
            names, (F.col("doc_id") % 3).cast("int") + 1
        ).alias("variant"),
        "width", "height", "channels", "pixel_sum", "n_pixels",
    )


@register(
    "multimodal_jpeg12_color_roundtrip",
    """
    SELECT doc_id,
           list_extract(['seq_444', 'seq_420', 'prog_444',
                         'prog_420'],
                        CAST(doc_id % 4 AS INTEGER) + 1) AS variant,
           CAST(32 AS INTEGER) AS width,
           CAST(32 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS channels,
           CAST(3 * 256 * sum((997 * doc_id + 1303 * mx.i
                               + 2011 * my.i) % 4096)
                AS BIGINT) AS pixel_sum,
           CAST(3072 AS BIGINT) AS n_pixels
    FROM documents,
         generate_series(0, 1) mx(i),
         generate_series(0, 1) my(i)
    WHERE doc_id < 200
    GROUP BY doc_id
    """,
    doc="12-bit COLOR and PROGRESSIVE JPEG decode, end to end (r18 "
        "— retires the 12-bit color/progressive refusal named in "
        "VERDICT r17's tail list): 32×32 achromatic 12-bit RGB "
        "images from constant 16×16 macroblocks over the full "
        "0..4095 domain rotate per doc through extended-sequential "
        "SOF1 4:4:4 / 4:2:0 and progressive SOF2 4:4:4 / 4:2:0 — "
        "chroma centered at 2048, the widened T.81 Table F.1 "
        "category bounds (DC to 15, AC sizes to 14) in both the "
        "sequential and the EOBn progressive AC tables, interleaved "
        "MCU and spectral-selection scan layouts at 12-bit. "
        "Achromatic constants survive RGB→YCbCr→DCT→back "
        "bit-exactly at 12-bit too, so the oracle recomputes exact "
        "integer pixel sums (values beyond any 8-bit-domain sum "
        "prove the uint16 path). The one JPEG stub left is "
        "arithmetic coding. Map-only",
)
def multimodal_jpeg12_color_roundtrip(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import jpeg as jpeg_ops
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def build_batches(batches):
        import numpy as np
        import pandas as pd

        from mongo2pq_spark.operators.jpeg import (
            encode_jpeg,
            encode_jpeg_progressive,
        )

        ones16 = np.ones((16, 16), dtype="int32")
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                mac = np.array(
                    [
                        [(997 * d + 1303 * mx + 2011 * my) % 4096
                         for mx in range(2)]
                        for my in range(2)
                    ],
                    dtype="int32",
                )
                rgb = np.stack([np.kron(mac, ones16)] * 3, axis=2)
                v = d % 4
                sub = "420" if v % 2 else "444"
                enc = encode_jpeg_progressive if v >= 2 else encode_jpeg
                payloads.append(
                    enc(rgb, subsampling=sub, precision=12)
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    files = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    names = F.array(
        *[F.lit(s) for s in
          ["seq_444", "seq_420", "prog_444", "prog_420"]]
    )
    return jpeg_ops.jpeg_pixel_stats(files).select(
        "doc_id",
        F.element_at(
            names, (F.col("doc_id") % 4).cast("int") + 1
        ).alias("variant"),
        "width", "height", "channels", "pixel_sum", "n_pixels",
    )


@register(
    "multimodal_pdf_embedded_images",
    """
    WITH p0 AS (
        SELECT doc_id, 0 AS page_idx, 'DCTDecode' AS im_filter,
               32 AS w, 32 AS h, 3 AS c,
               3 * 256 * SUM((7 * doc_id + 31 * mx.i + 57 * my.i)
                             % 256) AS ps
        FROM documents,
             generate_series(0, 1) mx(i),
             generate_series(0, 1) my(i)
        WHERE doc_id < 150 GROUP BY doc_id
    ), p1 AS (
        SELECT doc_id, 1 AS page_idx, 'CCITTFaxDecode' AS im_filter,
               21 AS w, 18 AS h, 1 AS c,
               SUM(CASE WHEN (doc_id + x.i // 4 + y.i // 3) % 4 = 0
                        THEN 0 ELSE 1 END) AS ps
        FROM documents,
             generate_series(0, 20) x(i),
             generate_series(0, 17) y(i)
        WHERE doc_id < 150 GROUP BY doc_id
    ), p2 AS (
        SELECT doc_id, 2 AS page_idx, 'FlateDecode' AS im_filter,
               9 AS w, 7 AS h, 1 AS c,
               SUM((3 * doc_id + 5 * x.i + 11 * y.i) % 256) AS ps
        FROM documents,
             generate_series(0, 8) x(i),
             generate_series(0, 6) y(i)
        WHERE doc_id < 150 GROUP BY doc_id
    ), u AS (
        SELECT * FROM p0
        UNION ALL SELECT * FROM p1
        UNION ALL SELECT * FROM p2
    )
    SELECT doc_id, CAST(page_idx AS INTEGER) AS page_idx, im_filter,
           CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
           CAST(c AS INTEGER) AS channels,
           CAST(ps AS BIGINT) AS pixel_sum,
           CAST(h * w * c AS BIGINT) AS n_pixels
    FROM u
    """,
    doc="PDF embedded-IMAGE extraction, decoded end to end (r18 — "
        "the scanned-corpus payoff tying the codec families "
        "together): three-page PDF 1.5 fixtures (xref STREAMS, the "
        "modern layout) carry per-page /XObject /Image streams in "
        "exactly the filters scanned archives ship — /DCTDecode "
        "(achromatic constant-macroblock JPEG, alternating 4:4:4 / "
        "4:2:0), /CCITTFaxDecode (the ISO 32000 §7.4.6 /K "
        "convention rotating K=-1 G4 / K=0 pure 1-D with "
        "/EncodedByteAlign on even docs / K=4 mixed-mode, decoded "
        "by operators/ccitt.py), and /FlateDecode raw grayscale "
        "rasters. extract_pdf_images resolves images through the "
        "xref machinery (never by scanning for obj tokens) and "
        "returns the scalarized pixel-stats contract every codec "
        "family shares; the oracle recomputes all three pages' "
        "exact sums closed-form. JPX/JBIG2 are typed refusals. "
        "Map-only",
)
def multimodal_pdf_embedded_images(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import pdf as pdf_ops
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 150
    )

    def build_batches(batches):
        import zlib

        import numpy as np
        import pandas as pd

        from mongo2pq_spark.operators.ccitt import ccitt_encode_k
        from mongo2pq_spark.operators.jpeg import encode_jpeg
        from mongo2pq_spark.operators.pdf import (
            build_pdf_stub_xrefstream,
        )

        ones16 = np.ones((16, 16), dtype="uint8")
        yc, xc = np.meshgrid(
            np.arange(18), np.arange(21), indexing="ij"
        )
        yf, xf = np.meshgrid(
            np.arange(7), np.arange(9), indexing="ij"
        )
        for pdf_batch in batches:
            payloads = []
            for d in pdf_batch["doc_id"]:
                d = int(d)
                mac = np.array(
                    [
                        [(7 * d + 31 * mx + 57 * my) % 256
                         for mx in range(2)]
                        for my in range(2)
                    ],
                    dtype="uint8",
                )
                rgb = np.stack([np.kron(mac, ones16)] * 3, axis=2)
                jpg = encode_jpeg(
                    rgb, subsampling="420" if d % 2 else "444"
                )
                ink = (
                    ((d + xc // 4 + yc // 3) % 4) == 0
                ).astype("uint8")
                k = [-1, 0, 4][d % 3]
                align = k == 0 and d % 2 == 0
                fax = ccitt_encode_k(ink, k, byte_align=align)
                parms = (
                    f"<< /K {k} /Columns 21 /Rows 18"
                    f"{' /EncodedByteAlign true' if align else ''}"
                    " >>"
                ).encode()
                gray = ((3 * d + 5 * xf + 11 * yf) % 256).astype(
                    "uint8"
                )
                payloads.append(
                    build_pdf_stub_xrefstream(
                        3,
                        page_images=[
                            {
                                "filter": b"DCTDecode",
                                "data": jpg,
                                "width": 32, "height": 32, "bpc": 8,
                                "colorspace": b"DeviceRGB",
                            },
                            {
                                "filter": b"CCITTFaxDecode",
                                "data": fax,
                                "width": 21, "height": 18, "bpc": 1,
                                "colorspace": b"DeviceGray",
                                "parms": parms,
                            },
                            {
                                "filter": b"FlateDecode",
                                "data": zlib.compress(
                                    gray.tobytes(), 9
                                ),
                                "width": 9, "height": 7, "bpc": 8,
                                "colorspace": b"DeviceGray",
                            },
                        ],
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf_batch["doc_id"], "payload": payloads}
            )

    files = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    return pdf_ops.pdf_image_stats(files)


@register(
    "multimodal_webp_metadata",
    """
    WITH d AS (
        SELECT doc_id, doc_id % 3 AS v
        FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           list_extract(['lossy', 'lossless', 'extended'],
                        CAST(v AS INTEGER) + 1) AS variant,
           CAST(32 + doc_id % 100 AS INTEGER) AS width,
           CAST(24 + doc_id % 50 AS INTEGER) AS height,
           (v = 1 AND doc_id % 2 = 0)
               OR (v = 2 AND doc_id % 2 = 1) AS has_alpha,
           v = 2 AND doc_id % 2 = 0 AS animated,
           CAST(CASE WHEN v < 2 THEN 1
                     WHEN doc_id % 2 = 0 THEN 2 + 1 + doc_id % 4
                     ELSE 3 END AS INTEGER) AS n_chunks
    FROM d
    """,
    doc="WEBP container triage (r17 — web crawls ship webp "
        "everywhere now): per-doc fixtures across all three container "
        "variants — lossy VP8 (frame tag + 9D012A start code + "
        "14-bit dims), lossless VP8L (0x2F signature, bit-packed "
        "dims/alpha/version), extended VP8X (flags + 24-bit canvas, "
        "with ALPH chunks or ANIM/ANMF animation) — parsed back by "
        "the pure-stdlib walk (operators/multimodal.py::"
        "parse_webp_metadata). This is the resolution/alpha/animation "
        "filter a crawl pipeline runs on 100 % of its webp BEFORE "
        "any decode; the VP8 sample payload itself stays the "
        "documented library boundary (the H.264 posture — container "
        "real, codec swap). Oracle states every field closed-form. "
        "Map-only",
)
def multimodal_webp_metadata(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators.multimodal import webp_metadata
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def build_batches(batches):
        import pandas as pd

        from mongo2pq_spark.operators.multimodal import build_webp_stub

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 32 + d % 100, 24 + d % 50
                v = d % 3
                if v == 0:
                    p = build_webp_stub(w, h, "lossy")
                elif v == 1:
                    p = build_webp_stub(
                        w, h, "lossless", alpha=d % 2 == 0
                    )
                elif d % 2 == 0:
                    p = build_webp_stub(
                        w, h, "extended", n_anim_frames=1 + d % 4
                    )
                else:
                    p = build_webp_stub(w, h, "extended", alpha=True)
                payloads.append(p)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    files = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    return webp_metadata(files)


def _ima_adpcm_stereo_oracle() -> str:
    """The mono recursive-CTE mirror extended with a CHANNEL
    dimension: two independent state machines per doc (distinct
    closed-form headers and nibble streams per channel), aggregated
    to the stereo stats — proving the de-interleave feeds each
    channel exactly its own nibble stream."""
    from mongo2pq_spark.operators.audio import IMA_STEP_TABLE

    steps = ", ".join(
        f"({k}, {s})" for k, s in enumerate(IMA_STEP_TABLE)
    )
    return f"""
    WITH RECURSIVE st(k, s) AS (
        SELECT * FROM (VALUES {steps}) t(k, s)
    ),
    d AS (
        SELECT doc_id, c.i AS c,
               CAST(((17 * doc_id + 801 * c.i) % 2003) - 1001
                    AS INTEGER) AS pred0,
               CAST((doc_id + 31 * c.i) % 89 AS INTEGER) AS idx0
        FROM documents, generate_series(0, 1) c(i)
        WHERE doc_id < 100
    ),
    dec AS (
        SELECT doc_id, c, 0 AS i, pred0 AS pred, idx0 AS idx,
               CAST(pred0 AS BIGINT) AS ssum,
               CAST(abs(pred0) AS INTEGER) AS pmax
        FROM d
        UNION ALL
        SELECT doc_id, c, i + 1, np,
               CAST(least(88, greatest(0, idx + itab)) AS INTEGER),
               ssum + np,
               CAST(greatest(pmax, abs(np)) AS INTEGER)
        FROM (
            SELECT *,
                   CAST(least(32767, greatest(-32768,
                        pred + CASE WHEN nib >= 8 THEN -dd
                                    ELSE dd END)) AS INTEGER) AS np
            FROM (
                SELECT dec.*,
                       (3 * dec.doc_id + 5 * dec.i + 9 * dec.c)
                           % 16 AS nib,
                       st.s // 8
                       + CASE WHEN nib % 2 = 1 THEN st.s // 4
                              ELSE 0 END
                       + CASE WHEN (nib // 2) % 2 = 1 THEN st.s // 2
                              ELSE 0 END
                       + CASE WHEN (nib // 4) % 2 = 1 THEN st.s
                              ELSE 0 END AS dd,
                       CASE nib % 8 WHEN 4 THEN 2 WHEN 5 THEN 4
                            WHEN 6 THEN 6 WHEN 7 THEN 8
                            ELSE -1 END AS itab
                FROM dec JOIN st ON st.k = dec.idx
                WHERE dec.i < 56
            ) q1
        ) q2
    )
    SELECT doc_id,
           CAST(2 AS INTEGER) AS channels,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(57 AS BIGINT) AS n_frames,
           CAST(7 AS BIGINT) AS duration_ms,
           CAST(sum(ssum) AS BIGINT) AS sample_sum,
           CAST(max(pmax) AS INTEGER) AS peak_abs
    FROM dec WHERE i = 56 GROUP BY doc_id
    """


@register(
    "multimodal_wav_ima_adpcm_stereo",
    _ima_adpcm_stereo_oracle(),
    doc="STEREO IMA-ADPCM decode (r16 addendum — removes the mono-"
        "only envelope note): the standard stereo interleave (two "
        "4-byte channel headers, then alternating 4-byte/8-nibble "
        "groups per channel) is built from per-channel closed-form "
        "nibble streams and decoded on executors — the de-interleave "
        "must feed each channel's state machine exactly its own "
        "stream, in order, or the recursive-CTE oracle (the mono "
        "mirror extended with a channel dimension, aggregated to "
        "stereo stats) breaks. 7 group pairs per block, 57 frames. "
        "Map-only; the WAV matrix now has NO stubbed format and no "
        "envelope caveat beyond >2-channel ADPCM",
)
def multimodal_wav_ima_adpcm_stereo(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import audio as audio_ops
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 100
    )

    def build_batches(batches):
        import pandas as pd

        from mongo2pq_spark.operators.audio import build_ima_adpcm_wav

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                hdrs, groups = b"", []
                for c in (0, 1):
                    pred0 = ((17 * d + 801 * c) % 2003) - 1001
                    hdrs += pred0.to_bytes(2, "little", signed=True)
                    hdrs += bytes([(d + 31 * c) % 89, 0])
                    nibs = [
                        (3 * d + 5 * i + 9 * c) % 16 for i in range(56)
                    ]
                    groups.append(
                        bytes(
                            nibs[i] | (nibs[i + 1] << 4)
                            for i in range(0, 56, 2)
                        )
                    )
                body = b"".join(
                    groups[0][k:k + 4] + groups[1][k:k + 4]
                    for k in range(0, 28, 4)
                )
                payloads.append(
                    build_ima_adpcm_wav(hdrs + body, 8000, n_channels=2)
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    files = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    return audio_ops.wav_audio_stats(files)


@register(
    "multimodal_wav_ima_adpcm_roundtrip",
    _ima_adpcm_oracle(),
    doc="IMA-ADPCM WAV decode, end to end (r16 — the LAST WAV format "
        "stub retired, the matrix is now complete): closed-form "
        "nibble streams (60 codes per doc) under closed-form block "
        "headers (predictor, step index) are wrapped into "
        "spec-shaped format-0x11 containers (fmt extension with "
        "samples-per-block, fact chunk) and decoded on executors "
        "through the public IMA algorithm — step-table delta "
        "reconstruction, predictor clamp, index walk. The oracle "
        "RESTATES the whole algorithm as a DuckDB RECURSIVE CTE "
        "over the same nibble rule, so the value match proves the "
        "engine's stateful decode is the published one, sample for "
        "sample — the strongest proof a stateful codec admits (the "
        "u-law/A-law queries' formula-restatement trick, extended "
        "to recursion). Map-only; mono envelope (the speech/"
        "telephony corpora ADPCM ships), stereo interleave a typed "
        "refusal",
)
def multimodal_wav_ima_adpcm_roundtrip(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import audio as audio_ops
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 120
    )

    def build_batches(batches):
        import pandas as pd

        from mongo2pq_spark.operators.audio import build_ima_adpcm_wav

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                pred0 = ((17 * d) % 2003) - 1001
                nibs = [(3 * d + 5 * i) % 16 for i in range(60)]
                block = (
                    pred0.to_bytes(2, "little", signed=True)
                    + bytes([d % 89, 0])
                    + bytes(
                        nibs[i] | (nibs[i + 1] << 4)
                        for i in range(0, 60, 2)
                    )
                )
                payloads.append(build_ima_adpcm_wav(block, 8000))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    files = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    return audio_ops.wav_audio_stats(files)


@register(
    "multimodal_avi_mjpeg_frames",
    """
    WITH d AS (
        SELECT doc_id,
               3 + CAST(doc_id % 4 AS INTEGER) AS n,
               8 + CAST(doc_id % 5 AS INTEGER) AS fps
        FROM documents WHERE doc_id < 150
    ),
    fs AS (
        SELECT d.doc_id, d.n, d.fps, f.i AS f,
               64 * sum((7 * d.doc_id + 13 * f.i
                         + 17 * bx.i + 23 * by.i) % 256) AS fsum
        FROM d, generate_series(0, 6) f(i),
             generate_series(0, 1) bx(i), generate_series(0, 1) by(i)
        WHERE f.i < d.n
        GROUP BY d.doc_id, d.n, d.fps, f.i
    )
    SELECT doc_id,
           CAST(16 AS INTEGER) AS width,
           CAST(16 AS INTEGER) AS height,
           CAST(max(fps) AS INTEGER) AS fps,
           CAST(max(n) AS BIGINT) AS n_frames,
           CAST(max(n) AS BIGINT) AS n_keyframes,
           CAST(sum(fsum) AS BIGINT) AS pixel_sum,
           CAST(sum((f + 1) * fsum) AS BIGINT) AS order_sum
    FROM fs GROUP BY doc_id
    """,
    doc="REAL video FRAME decode, end to end (r16 — retires the "
        "video-decode stub for the one family that needs no codec "
        "library): per-doc MJPEG clips (3-7 deterministic 16x16 "
        "DC-block frames, fps 8-12) are assembled into structurally "
        "real AVI containers (operators/video.py::build_avi_mjpeg — "
        "RIFF hdrl/avih/strh/strf, word-aligned 00dc movi chunks, "
        "idx1 all-keyframe index) and every frame is DECODED back "
        "through the repo's real baseline-JPEG codec inside "
        "Arrow-batched mapInPandas, emitting container metadata + "
        "exact integer pixel sums + the frame-ORDER pin "
        "order_sum = sum((i+1)*frame_sum) — swapped frames break it "
        "even when the plain sum survives. DC-only blocks round-trip "
        "bit-exactly through the JPEG transform chain, so the oracle "
        "recomputes everything from the generation rule alone: the "
        "hash match proves container walk + per-frame decode + frame "
        "ordering = identity on executors. Compressed inter-frame "
        "codecs (H.264/VP9/AV1) remain the documented "
        "NotImplementedError boundary — their CONTAINERS still parse "
        "(MP4 box walk, AVI walk), the stages a mixed 100 TB corpus "
        "runs at 100%. Map-only, no shuffle",
)
def multimodal_avi_mjpeg_frames(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import video as video_ops
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 150
    )

    def build_batches(batches):
        import numpy as np
        import pandas as pd

        from mongo2pq_spark.operators.jpeg import encode_jpeg
        from mongo2pq_spark.operators.video import build_avi_mjpeg

        ones8 = np.ones((8, 8), dtype="uint8")
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                frames = []
                for f in range(3 + d % 4):
                    blocks = np.array(
                        [
                            [
                                (7 * d + 13 * f + 17 * bx + 23 * by) % 256
                                for bx in range(2)
                            ]
                            for by in range(2)
                        ],
                        dtype="uint8",
                    )
                    frames.append(encode_jpeg(np.kron(blocks, ones8)))
                payloads.append(
                    build_avi_mjpeg(frames, 16, 16, fps=8 + d % 5)
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    files = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    return video_ops.avi_frame_stats(files)


@register(
    "multimodal_bmp_pixel_roundtrip",
    """
    SELECT doc_id,
           CAST(7 AS INTEGER) AS width,
           CAST(6 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS channels,
           CAST(sum((11 * doc_id + 5 * x.i + 19 * y.i + 23 * ch.i) % 256)
                AS BIGINT) AS pixel_sum
    FROM documents,
         generate_series(0, 6) x(i),
         generate_series(0, 5) y(i),
         generate_series(0, 2) ch(i)
    WHERE doc_id < 200
    GROUP BY doc_id
    """,
    doc="REAL BMP pixel decode, end to end: deterministic 6×7×3 RGB "
        "pixels (closed-form rule) are ENCODED to uncompressed 24-bit "
        "BI_RGB bitmaps and DECODED back by the pure-stdlib codec — "
        "and the 7-pixel width forces a non-trivial 4-byte row pad "
        "while BMP's bottom-up row order and BGR byte order must both "
        "be undone, so a matching pixel sum proves the decoder "
        "handles the format's three quirks, not a raw memcpy. Third "
        "REAL image codec next to PNG and baseline JPEG; "
        "decode_image_pixels dispatches all three by magic, so the "
        "dHash/pHash/cell-feature machinery runs over BMP corpora "
        "unchanged. Map-only",
)
def multimodal_bmp_pixel_roundtrip(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def build_batches(batches):
        import numpy as np
        import pandas as pd

        from mongo2pq_spark.operators.multimodal import encode_bmp

        y, x, ch = np.meshgrid(
            np.arange(6), np.arange(7), np.arange(3), indexing="ij"
        )
        base = 5 * x + 19 * y + 23 * ch
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                arr = ((11 * int(d) + base) % 256).astype("uint8")
                payloads.append(encode_bmp(arr))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    with_bmp = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    return ops.bmp_pixel_stats(with_bmp).select(
        "doc_id", "width", "height", "channels", "pixel_sum"
    )


@register(
    "multimodal_bmp_variant_matrix",
    """
    WITH d AS (
        SELECT doc_id, CAST(doc_id % 5 AS INTEGER) AS v
        FROM documents WHERE doc_id < 200
    ),
    s AS (
        SELECT d.doc_id, d.v,
               SUM(CASE d.v
                   WHEN 0 THEN
                         (7 * ((d.doc_id + x.i // 4 + 2 * (y.i // 2)) % 32)
                          + 1) % 256
                       + (11 * ((d.doc_id + x.i // 4 + 2 * (y.i // 2)) % 32)
                          + 3) % 256
                       + (13 * ((d.doc_id + x.i // 4 + 2 * (y.i // 2)) % 32)
                          + 5) % 256
                   WHEN 1 THEN
                         (7 * ((d.doc_id + x.i // 4 + y.i // 3) % 16)
                          + 1) % 256
                       + (11 * ((d.doc_id + x.i // 4 + y.i // 3) % 16)
                          + 3) % 256
                       + (13 * ((d.doc_id + x.i // 4 + y.i // 3) % 16)
                          + 5) % 256
                   WHEN 2 THEN
                         (7 * ((d.doc_id + x.i + y.i) % 2) + 1) % 256
                       + (11 * ((d.doc_id + x.i + y.i) % 2) + 3) % 256
                       + (13 * ((d.doc_id + x.i + y.i) % 2) + 5) % 256
                   WHEN 3 THEN
                         8 * ((d.doc_id + 3 * x.i + 5 * y.i) % 32)
                       + ((d.doc_id + 3 * x.i + 5 * y.i) % 32) // 4
                       + 8 * ((d.doc_id + 3 * x.i + 5 * y.i + 7) % 32)
                       + ((d.doc_id + 3 * x.i + 5 * y.i + 7) % 32) // 4
                       + 8 * ((d.doc_id + 3 * x.i + 5 * y.i + 14) % 32)
                       + ((d.doc_id + 3 * x.i + 5 * y.i + 14) % 32) // 4
                   ELSE (d.doc_id + 13 * x.i + 29 * y.i) % 256
                      + (d.doc_id + 13 * x.i + 29 * y.i + 31) % 256
                      + (d.doc_id + 13 * x.i + 29 * y.i + 62) % 256
                   END) AS ps
        FROM d, generate_series(0, 15) x(i), generate_series(0, 15) y(i)
        GROUP BY d.doc_id, d.v
    )
    SELECT doc_id,
           list_extract(['pal8_rle', 'pal4_rle', 'pal1', 'rgb16_555',
                         'bgrx32'], v + 1) AS variant,
           CAST(16 AS INTEGER) AS width,
           CAST(16 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS channels,
           CAST(ps AS BIGINT) AS pixel_sum
    FROM s
    """,
    doc="the classic BMP variant space decodes for real (r17 — "
        "retires the 24-bit-BI_RGB-only boundary): per-doc 16×16 "
        "fixtures rotate through RLE8- and RLE4-compressed paletted "
        "bitmaps (blocky patterns so genuine runs are exercised; "
        "absolute/delta/early-EOF escapes covered by unit fixtures), "
        "1-bit paletted (MSB-first packing + 4-byte row pads), "
        "16-bit X1R5G5B5 (channels expanded (v<<3)|(v>>2)), and "
        "32-bit BGRX — each pixel a closed form of (doc_id, x, y), "
        "encoded by the variant writer and decoded back by the pure-"
        "stdlib decoder inside Arrow-batched mapInPandas. The oracle "
        "recomputes exact integer pixel sums from the generation "
        "rule, so a hash match proves decode∘encode = identity "
        "across the space — RLE run semantics, BGRX color tables, "
        "bottom-up order and all. BI_BITFIELDS masks remain the one "
        "refusal. Map-only",
)
def multimodal_bmp_variant_matrix(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def build_batches(batches):
        import numpy as np
        import pandas as pd

        from mongo2pq_spark.operators.multimodal import encode_bmp_variant

        y, x = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")

        def pal(n):
            k = np.arange(n)
            return np.stack(
                [(7 * k + 1) % 256, (11 * k + 3) % 256, (13 * k + 5) % 256],
                axis=1,
            ).astype("uint8")

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                v = d % 5
                if v == 0:
                    idx = ((d + x // 4 + 2 * (y // 2)) % 32).astype("uint8")
                    p = encode_bmp_variant(
                        idx, bpp=8, palette=pal(32), rle=True
                    )
                elif v == 1:
                    idx = ((d + x // 4 + y // 3) % 16).astype("uint8")
                    p = encode_bmp_variant(
                        idx, bpp=4, palette=pal(16), rle=True
                    )
                elif v == 2:
                    idx = ((d + x + y) % 2).astype("uint8")
                    p = encode_bmp_variant(idx, bpp=1, palette=pal(2))
                elif v == 3:
                    ch = np.arange(3)
                    c5 = (
                        (d + 3 * x[:, :, None] + 5 * y[:, :, None] + 7 * ch)
                        % 32
                    ).astype("uint8")
                    p = encode_bmp_variant(c5, bpp=16)
                else:
                    ch = np.arange(3)
                    rgb = (
                        (d + 13 * x[:, :, None] + 29 * y[:, :, None]
                         + 31 * ch) % 256
                    ).astype("uint8")
                    p = encode_bmp_variant(rgb, bpp=32)
                payloads.append(p)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    with_bmp = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    names = F.array(
        *[F.lit(s) for s in
          ["pal8_rle", "pal4_rle", "pal1", "rgb16_555", "bgrx32"]]
    )
    return ops.bmp_pixel_stats(with_bmp).select(
        "doc_id",
        F.element_at(
            names, (F.col("doc_id") % 5).cast("int") + 1
        ).alias("variant"),
        "width", "height", "channels", "pixel_sum",
    )


@register(
    "multimodal_bmp_bitfields_roundtrip",
    """
    SELECT doc_id,
           CAST(16 AS INTEGER) AS width,
           CAST(12 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS channels,
           CAST(sum(
                 8 * ((doc_id + 3 * x.i + 5 * y.i) % 32)
               + ((doc_id + 3 * x.i + 5 * y.i) % 32) // 4
               + 4 * ((doc_id + 7 * x.i + 11 * y.i) % 64)
               + ((doc_id + 7 * x.i + 11 * y.i) % 64) // 16
               + 8 * ((doc_id + 13 * x.i + 17 * y.i) % 32)
               + ((doc_id + 13 * x.i + 17 * y.i) % 32) // 4
           ) AS BIGINT) AS pixel_sum
    FROM documents,
         generate_series(0, 15) x(i),
         generate_series(0, 11) y(i)
    WHERE doc_id < 200
    GROUP BY doc_id
    """,
    doc="BI_BITFIELDS BMP decode (r17 session 2 — retires the last "
        "BMP refusal shape that occurs in practice): 16-bit R5G6B5 "
        "files — THE high-color format, framebuffer dumps and "
        "screenshot tools ship it — with explicit channel masks "
        "read from the header, channels recovered by mask "
        "shift/width extraction and expanded 5→8/6→8 by bit "
        "replication ((v<<3)|(v>>2), (v<<2)|(v>>4)). The oracle "
        "restates the replication arithmetic closed-form (8v + v/4, "
        "4v + v/16), so a hash match proves the mask walk AND the "
        "expansion. Zero/non-contiguous masks fail typed; only "
        "mask widths outside 4..8 and PNG-in-BMP remain refusals. "
        "Map-only",
)
def multimodal_bmp_bitfields_roundtrip(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def build_batches(batches):
        import numpy as np
        import pandas as pd

        from mongo2pq_spark.operators.multimodal import encode_bmp_variant

        y, x = np.meshgrid(np.arange(12), np.arange(16), indexing="ij")
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                arr = np.stack(
                    [
                        (d + 3 * x + 5 * y) % 32,
                        (d + 7 * x + 11 * y) % 64,
                        (d + 13 * x + 17 * y) % 32,
                    ],
                    axis=2,
                )
                payloads.append(
                    encode_bmp_variant(
                        arr, bpp=16,
                        bitfields=(0xF800, 0x07E0, 0x001F),
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    with_bmp = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    return ops.bmp_pixel_stats(with_bmp).select(
        "doc_id", "width", "height", "channels", "pixel_sum"
    )


@register(
    "multimodal_ico_manifest",
    """
    WITH e AS (
        SELECT doc_id,
               CAST(j.i AS INTEGER) AS img_idx,
               CAST((doc_id + j.i) % 3 AS INTEGER) AS kind
        FROM documents, generate_series(0, 2) j(i)
        WHERE doc_id < 200 AND j.i < 1 + doc_id % 3
    ),
    s AS (
        SELECT e.doc_id, e.img_idx, e.kind,
               SUM(CASE e.kind
                   WHEN 0 THEN
                       (e.doc_id + 2 * x.i + 3 * y.i + e.img_idx) % 256
                     + (e.doc_id + 2 * x.i + 3 * y.i + e.img_idx + 5)
                       % 256
                     + (e.doc_id + 2 * x.i + 3 * y.i + e.img_idx + 10)
                       % 256
                   WHEN 1 THEN
                       (7 * e.doc_id + 13 * x.i + 29 * y.i + e.img_idx)
                       % 256
                     + (7 * e.doc_id + 13 * x.i + 29 * y.i + e.img_idx
                        + 31) % 256
                     + (7 * e.doc_id + 13 * x.i + 29 * y.i + e.img_idx
                        + 62) % 256
                   ELSE
                       (7 * ((e.doc_id + e.img_idx + x.i + 2 * y.i)
                             % 16) + 1) % 256
                     + (11 * ((e.doc_id + e.img_idx + x.i + 2 * y.i)
                              % 16) + 3) % 256
                     + (13 * ((e.doc_id + e.img_idx + x.i + 2 * y.i)
                              % 16) + 5) % 256
                   END) AS ps
        FROM e, generate_series(0, 7) x(i), generate_series(0, 7) y(i)
        GROUP BY e.doc_id, e.img_idx, e.kind
    )
    SELECT doc_id, img_idx,
           list_extract(['bmp', 'png', 'bmp'], kind + 1) AS fmt,
           CAST(8 AS INTEGER) AS width,
           CAST(8 AS INTEGER) AS height,
           CAST(list_extract([24, 32, 8], kind + 1)
                AS INTEGER) AS bitcount,
           CAST(ps AS BIGINT) AS pixel_sum
    FROM s
    """,
    doc="ICO (favicon) containers decode end to end (r17 session 2 "
        "— a web crawl meets this format on effectively every "
        "host): per-doc icons carry 1-3 directory entries mixing "
        "header-less 24-bit BMP (doubled-height XOR+AND layout "
        "re-headered and halved back), embedded whole PNG, and "
        "8-bit paletted BMP — every entry DECODED through the "
        "existing PNG/BMP codecs with its exact pixel sum, so the "
        "oracle's closed-form per-entry sums prove the directory "
        "walk, the magic dispatch, AND the decode. Map-only "
        "explode, the archive-manifest scale shape",
)
def multimodal_ico_manifest(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import multimodal as mm
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def build_batches(batches):
        import numpy as np
        import pandas as pd

        from mongo2pq_spark.operators.multimodal import build_ico_stub

        y, x = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
        ch = np.arange(3)
        pal16 = np.stack(
            [
                (7 * np.arange(16) + 1) % 256,
                (11 * np.arange(16) + 3) % 256,
                (13 * np.arange(16) + 5) % 256,
            ],
            axis=1,
        ).astype("uint8")
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                entries = []
                for i in range(1 + d % 3):
                    kind = (d + i) % 3
                    if kind == 0:
                        rgb = (
                            (d + 2 * x[:, :, None] + 3 * y[:, :, None]
                             + i + 5 * ch) % 256
                        ).astype("uint8")
                        entries.append(("bmp24", rgb))
                    elif kind == 1:
                        rgb = (
                            (7 * d + 13 * x[:, :, None]
                             + 29 * y[:, :, None] + i + 31 * ch) % 256
                        ).astype("uint8")
                        entries.append(("png", rgb))
                    else:
                        idx = ((d + i + x + 2 * y) % 16).astype("uint8")
                        entries.append(("bmp8", idx, pal16))
                payloads.append(build_ico_stub(entries))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    files = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    return mm.ico_manifest(files)


@register(
    "multimodal_gif_metadata",
    """
    WITH d AS (
        SELECT doc_id,
               16 + doc_id % 48 AS w,
               9 + doc_id % 27 AS h,
               1 + doc_id % 6 AS nf,
               doc_id % 5 = 0 AS loopf
        FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           '89a' AS version,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(nf AS INTEGER) AS n_frames,
           nf > 1 AS animated,
           loopf AS loop_forever,
           CAST(10 * nf * (nf + 1) / 2 AS BIGINT) AS duration_cs
    FROM d
    """,
    doc="GIF structure triage, end to end: structurally real GIFs "
        "(global color table, NETSCAPE loop extension on every 5th "
        "doc, per-frame graphic-control delays, LZW data whose filler "
        "DELIBERATELY contains the 0x2C image-descriptor byte) are "
        "built and walked back by the pure-stdlib block parser "
        "(operators/multimodal.py::parse_gif_metadata) — frame "
        "counting must follow the length-prefixed sub-block chains, "
        "marker-scanning would overcount on the planted 0x2C bytes. "
        "Static-vs-animated routing + loop + total duration, the "
        "pre-decode filter for a GIF corpus; LZW pixel decode stays "
        "the documented stub. Map-only",
)
def multimodal_gif_metadata(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def build_batches(batches):
        import pandas as pd

        from mongo2pq_spark.operators.multimodal import build_gif_stub

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                payloads.append(
                    build_gif_stub(
                        16 + d % 48,
                        9 + d % 27,
                        1 + d % 6,
                        loop=d % 5 == 0,
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    files = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    return ops.gif_metadata(files)


@register(
    "multimodal_mp3_id3_tags",
    """
    WITH d AS (
        SELECT doc_id, 10 + doc_id % 20 AS nf,
               list_extract([44100, 48000, 32000],
                            1 + CAST(doc_id % 3 AS INTEGER)) AS sr
        FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           'Track ' || CAST(doc_id AS VARCHAR) AS title,
           'Artist ' || CAST(doc_id % 12 AS VARCHAR) AS artist,
           CASE WHEN doc_id % 4 = 0
                THEN 'Album ' || CAST(doc_id % 9 AS VARCHAR)
                ELSE '' END AS album,
           CAST(nf AS BIGINT) AS n_frames,
           CAST(nf * 1152 * 1000 // sr AS BIGINT) AS duration_ms
    FROM d
    """,
    doc="MP3 tag triage, end to end: REAL ID3v2.3 tags (10-byte "
        "frame headers, big-endian sizes, ISO-8859-1 text frames — "
        "TIT2/TPE1, TALB on every 4th doc) are grafted onto real "
        "MPEG-1 frame streams, then both layers are parsed back: the "
        "tag walker extracts title/artist/album (the metadata dedup "
        "keys a music corpus clusters on) while the frame walker "
        "skips the tag and counts frames — proving the two parsers "
        "agree on the tag boundary. The oracle recomputes every "
        "field closed-form. Map-only",
)
def multimodal_mp3_id3_tags(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import audio as audio_ops
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def build_batches(batches):
        import pandas as pd

        from mongo2pq_spark.operators.audio import (
            build_id3v2,
            build_mp3_stub,
        )

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                frames = {
                    "TIT2": f"Track {d}",
                    "TPE1": f"Artist {d % 12}",
                }
                if d % 4 == 0:
                    frames["TALB"] = f"Album {d % 9}"
                nf = 10 + d % 20
                payloads.append(
                    build_id3v2(frames)
                    + build_mp3_stub(
                        [1 + d % 14] * nf,
                        d % 3,
                        [(d + i) % 2 for i in range(nf)],
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    files = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    return audio_ops.mp3_id3_tags(files)


@register(
    "multimodal_crosscodec_neardup",
    """
    SELECT CAST(g.i AS BIGINT) AS grp,
           CAST(2 * g.i AS BIGINT) AS id_png,
           CAST(2 * g.i + 1 AS BIGINT) AS id_bmp,
           CAST(0 AS INTEGER) AS hamming
    FROM generate_series(0, 39) g(i)
    """,
    doc="cross-codec composition proof for the image-dedup machinery: "
        "40 distinct closed-form 6×11 RGB images are each encoded "
        "TWICE — once as PNG, once as BMP (both lossless) — decoded "
        "through decode_image_pixels' magic dispatch, dHashed, and "
        "fed to the generic Hamming banding. Every PNG copy must "
        "pair with exactly its BMP twin at distance 0: a single bit "
        "of disagreement anywhere in EITHER codec's decode, the luma "
        "resample, or the banding breaks the pairing, so the trivial-"
        "looking oracle (the 40 expected pairs) is load-bearing — it "
        "asserts byte-identical pixel recovery across two independent "
        "codec implementations. The within-group filter keeps "
        "accidental cross-group near-misses out of scope (they are "
        "the OTHER dhash queries' subject)",
)
def multimodal_crosscodec_neardup(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import multimodal as mm
    from mongo2pq_spark.operators.dedup import hamming_near_pairs
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 80
    )

    def build_batches(batches):
        import numpy as np
        import pandas as pd

        from mongo2pq_spark.operators.multimodal import (
            encode_bmp,
            encode_png,
        )

        y, x, ch = np.meshgrid(
            np.arange(6), np.arange(11), np.arange(3), indexing="ij"
        )
        base = 3 * x + 7 * y + 11 * ch
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                g = d // 2
                img = ((17 * g + base) % 256).astype("uint8")
                payloads.append(
                    encode_png(img) if d % 2 == 0 else encode_bmp(img)
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    imgs = docs.mapInPandas(build_batches, "doc_id bigint, payload binary")
    fps = mm.image_dhash(imgs)
    pairs = hamming_near_pairs(
        fps, "dhash", id_col="doc_id", max_hamming=0, bits=60
    )
    return (
        pairs.filter(
            (F.col("doc_a") / 2).cast("bigint")
            == (F.col("doc_b") / 2).cast("bigint")
        )
        .select(
            (F.col("doc_a") / 2).cast("bigint").alias("grp"),
            F.col("doc_a").alias("id_png"),
            F.col("doc_b").alias("id_bmp"),
            F.col("hamming").cast("int").alias("hamming"),
        )
    )


@register(
    "multimodal_jpeg_exif",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'little' ELSE 'big' END
               AS endian,
           CAST(1 + doc_id % 8 AS INTEGER) AS orientation,
           CASE WHEN doc_id % 5 = 0 THEN 'LG'
                ELSE 'Maker' || CAST(doc_id % 7 AS VARCHAR) END AS make,
           'Cam ' || CAST(doc_id AS VARCHAR) AS model,
           CAST(320 + (doc_id % 10) * 32 AS INTEGER) AS exif_width,
           CAST(240 + (doc_id % 10) * 24 AS INTEGER) AS exif_height
    FROM documents WHERE doc_id < 200
    """,
    doc="EXIF provenance extraction, end to end: REAL Exif APP1 "
        "segments — TIFF IFD0 with inline SHORT tags (orientation, "
        "dimensions) and ASCII tags in BOTH TIFF 6.0 storage classes "
        "(every 5th doc gets a <=4-byte make 'LG\\0' stored INLINE in "
        "the value field, the rest out-of-line via value offsets; "
        "ADVICE r11 fix — inline ASCII used to be misread as an "
        "offset), byte order ALTERNATING II/MM per doc so both "
        "endiannesses are proven — are built into JPEG wrappers and "
        "walked back by the pure-stdlib marker+IFD parser "
        "(operators/multimodal.py::parse_jpeg_exif). Camera make/"
        "model/orientation are the provenance keys an image corpus "
        "clusters and dedups on BEFORE any pixel work. The oracle "
        "recomputes every field closed-form. Map-only",
)
def multimodal_jpeg_exif(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.deploy import ensure_shipped
    from mongo2pq_spark.operators import multimodal as mm
    from mongo2pq_spark.sources.registry import read_sf_table

    ensure_shipped(spark)
    docs = read_sf_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def build_batches(batches):
        import pandas as pd

        from mongo2pq_spark.operators.multimodal import build_exif_jpeg

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                payloads.append(
                    build_exif_jpeg(
                        1 + d % 8,
                        "LG" if d % 5 == 0 else f"Maker{d % 7}",
                        f"Cam {d}",
                        320 + (d % 10) * 32,
                        240 + (d % 10) * 24,
                        big_endian=d % 2 == 1,
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    files = docs.mapInPandas(
        build_batches, "doc_id bigint, payload binary"
    )
    return mm.jpeg_exif(files)


@register(
    "multimodal_wds_samples",
    """
    SELECT 'doc' || CAST(doc_id AS VARCHAR) AS sample_key,
           CAST(2 AS BIGINT) AS n_parts,
           'meta,txt' AS part_exts,
           md5('meta:' || md5('lang=' || lang || ';source=' || source)
               || '|' ||
               'txt:' || md5(text)) AS sample_md5
    FROM documents
    """,
    doc="WebDataset SAMPLE grouping over the native tar-shard source "
        "(r13 — the wds data model's second half): each document is "
        "written as TWO tar members (doc<N>.txt = text bytes, "
        "doc<N>.meta = 'lang=..;source=..' bytes) across 4 shards, "
        "read back via spark.read.format('tarshards') (one partition "
        "per shard), and re-aligned into one row per sample keyed by "
        "the name prefix before the first dot — part count, sorted "
        "extension list, and an order-insensitive whole-sample digest "
        "(ext-sorted ext:md5(payload) pairs). The oracle states all "
        "three from the original table, so the sink framing, the "
        "native parse AND the grouping must be value-lossless; the "
        "digest is the sample-level dedup/snapshot-diff identity key. "
        "Scale: map-only member projection, ONE shuffle on the unique "
        "sample key (parts-per-sample bounded by modality count)",
)
def multimodal_wds_samples(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.sources.registry import read_sf_table
    from mongo2pq_spark.sources.staging import generation_tmp_dir
    from mongo2pq_spark.sources.tarshards import register_tarshards

    register_tarshards(spark)
    docs = read_sf_table(spark, sf_dir, "documents")
    key = F.concat(F.lit("doc"), F.col("doc_id").cast("string"))
    members = docs.select(
        F.concat(key, F.lit(".txt")).alias("name"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    ).unionByName(
        docs.select(
            F.concat(key, F.lit(".meta")).alias("name"),
            F.encode(
                F.concat(
                    F.lit("lang="),
                    F.col("lang"),
                    F.lit(";source="),
                    F.col("source"),
                ),
                "UTF-8",
            ).alias("payload"),
        )
    )
    outdir = generation_tmp_dir(sf_dir, "el_wds_samples_out")
    # wds contract: a sample's parts sit ADJACENT in ONE shard —
    # partition by the sample key and sort members within the shard
    # (this is how a real wds writer shards; loaders regroup
    # sequentially). The grouping operator itself never relies on it.
    (
        members.repartition(4, F.regexp_extract("name", r"^([^.]*)", 1))
        .sortWithinPartitions("name")
        .write.format("tarshards")
        .mode("overwrite")
        .save(outdir)
    )
    back = spark.read.format("tarshards").load(outdir)
    return ops.wds_group_samples(back)


_WDS_SAMPLE_MD5 = (
    "md5('meta:' || md5('lang=' || lang || ';source=' || source)"
    " || '|' || 'txt:' || md5({text}))"
)


@register(
    "multimodal_wds_snapshot_diff",
    f"""
    SELECT 'doc' || CAST(doc_id AS VARCHAR) AS sample_key,
           CASE WHEN doc_id % 7 = 0 THEN 'removed'
                WHEN doc_id % 5 = 0 THEN 'changed'
                ELSE 'unchanged' END AS status,
           {_WDS_SAMPLE_MD5.format(text='text')} AS old_md5,
           CASE WHEN doc_id % 7 = 0 THEN NULL
                WHEN doc_id % 5 = 0
                THEN {_WDS_SAMPLE_MD5.format(text="text || ' [v2]'")}
                ELSE {_WDS_SAMPLE_MD5.format(text='text')}
           END AS new_md5
    FROM documents
    UNION ALL
    SELECT 'doc' || CAST(doc_id + 10000 AS VARCHAR) AS sample_key,
           'added' AS status,
           NULL AS old_md5,
           {_WDS_SAMPLE_MD5.format(text='text')} AS new_md5
    FROM documents WHERE doc_id < 30
    """,
    doc="sample-level snapshot diff between two tar-shard GENERATIONS "
        "(r13 — wds generation management): generation A is every "
        "document as a two-part sample; generation B removes "
        "doc_id%7==0, rewrites the text part of doc_id%5==0 "
        "(removal wins on overlap), and adds 30 fresh sample keys. "
        "Both generations are WRITTEN as sample-key-partitioned "
        "shards, READ BACK through the native tarshards source, "
        "grouped into samples and full-outer-joined on the sample "
        "key — every sample classified added/removed/changed/"
        "unchanged by the order-insensitive whole-sample digest "
        "(any part's bytes flip it). The oracle states key, status "
        "and BOTH digests closed-form from the source table, so the "
        "sink framing, the native parse, the grouping AND the diff "
        "classification must all be value-exact. Scale: two single-"
        "shuffle groupings + one digest-width equi-join; 'added'+"
        "'changed' is the incremental processing set, 'removed' "
        "drives retention deletes",
)
def multimodal_wds_snapshot_diff(spark, sf_dir):
    from pyspark.sql import functions as F

    from mongo2pq_spark.sources.registry import read_sf_table
    from mongo2pq_spark.sources.staging import generation_tmp_dir
    from mongo2pq_spark.sources.tarshards import register_tarshards

    register_tarshards(spark)
    docs = read_sf_table(spark, sf_dir, "documents")

    def members(df):
        key = F.concat(F.lit("doc"), F.col("doc_id").cast("string"))
        meta = F.concat(
            F.lit("lang="), F.col("lang"),
            F.lit(";source="), F.col("source"),
        )
        return df.select(
            F.concat(key, F.lit(".txt")).alias("name"),
            F.encode(F.col("text"), "UTF-8").alias("payload"),
        ).unionByName(
            df.select(
                F.concat(key, F.lit(".meta")).alias("name"),
                F.encode(meta, "UTF-8").alias("payload"),
            )
        )

    gen_a = members(docs)
    changed = docs.filter(F.col("doc_id") % 7 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.col("text"), F.lit(" [v2]")),
        ).otherwise(F.col("text")),
    )
    added = docs.filter(F.col("doc_id") < 30).withColumn(
        "doc_id", F.col("doc_id") + 10000
    )
    gen_b = members(changed.unionByName(added))

    key_of = F.regexp_extract("name", r"^([^.]*)", 1)
    roots = {}
    for gen, m in (("a", gen_a), ("b", gen_b)):
        out = generation_tmp_dir(sf_dir, f"el_wds_diff_{gen}_out")
        (
            m.repartition(4, key_of)
            .sortWithinPartitions("name")
            .write.format("tarshards")
            .mode("overwrite")
            .save(out)
        )
        roots[gen] = out
    return ops.wds_snapshot_diff(
        spark.read.format("tarshards").load(roots["a"]),
        spark.read.format("tarshards").load(roots["b"]),
    )
