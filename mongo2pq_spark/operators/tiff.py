"""Baseline TIFF codec in pure stdlib + numpy — the scanner/archive
image format (scanned-document corpora, geo rasters, medical exports)
joining the PNG/JPEG/BMP/GIF matrix: IFD metadata walk (both byte
orders, multi-page chains) and REAL pixel decode for the compressions
scanned output actually uses — uncompressed (1), LZW (5, the
early-change TIFF variant, with the horizontal-differencing
predictor), and PackBits RLE (32773).

Scope (fail-loud outside it): 8 bits per sample, 1 (grayscale) or 3
(RGB) samples per pixel, photometric 0/1/2 (white-is-zero inverts),
strip-organized (tiles are the typed refusal), first page decoded
(multi-page files report ``n_pages`` in metadata — the triage
contract the GIF/AVI decoders share). JPEG-in-TIFF (compression 6/7)
and CCITT fax codings raise ``NotImplementedError``.

Reference parity note: the reference engine (Rahlir/mongo2pq) has no
image handling at all — this module is part of the mandated
large-scale multimodal extension scope, like operators/jpeg.py.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame

TIFF_MAGICS = (b"II*\x00", b"MM\x00*")


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW (TIFF6 §13): 8-bit symbols, Clear=256,
    EOI=257, MSB-first bit packing, EARLY code-width change (both
    sides switch one code sooner than GIF — the documented TIFF
    quirk), reset well before the 12-bit table edge."""
    clear, eoi = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    def fresh():
        return {bytes([i]): i for i in range(256)}, 258, 9

    table, next_code, width = fresh()
    emit(clear, width)
    prefix = b""
    for b in bytes(data):
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width):  # early change
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
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _tiff_lzw_decode(data: bytes, n_out: int) -> bytes:
    """Mirror of the encoder / libtiff semantics: width grows at
    table size 2^width − 1 (the decoder's dictionary lags the
    encoder's by one entry, so early change lands one sooner here
    too). Typed ``ValueError`` on bad codes/truncation/overrun."""
    clear, eoi = 256, 257
    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None
    bitpos = 0
    total_bits = len(data) * 8

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while True:
        if bitpos + width > total_bits:
            raise ValueError("truncated TIFF LZW stream (no EOI)")
        byte0 = bitpos // 8
        chunk = int.from_bytes(
            data[byte0:byte0 + 3].ljust(3, b"\x00"), "big"
        )
        code = (chunk >> (24 - (bitpos % 8) - width)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= 256:
                raise ValueError(
                    f"first TIFF LZW code after clear is {code}"
                )
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError(
                f"TIFF LZW code {code} beyond table {len(table)}"
            )
        out += entry
        if prev is not None and len(table) < 4094:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1
        prev = entry
        if len(out) > n_out:
            raise ValueError(
                f"TIFF LZW strip decodes past its {n_out} bytes"
            )
    if len(out) != n_out:
        raise ValueError(
            f"TIFF LZW strip decodes {len(out)} of {n_out} bytes"
        )
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """PackBits RLE (TIFF6 §9): runs of 3+ as (257−n, byte), literal
    spans otherwise — the classic scanner compression."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit_start = i
        i += run
        while i < n and i - lit_start < 128:
            run = 1
            while (
                i + run < n and run < 3 and data[i + run] == data[i]
            ):
                run += 1
            if run >= 3:
                break
            i += 1
        out += bytes([i - lit_start - 1]) + data[lit_start:i]
    return bytes(out)


def _packbits_decode(data: bytes, n_out: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < n_out:
        h = data[i]
        i += 1
        if h < 128:  # literal run of h+1
            if i + h + 1 > len(data):
                raise ValueError("truncated PackBits literal")
            out += data[i:i + h + 1]
            i += h + 1
        elif h > 128:  # repeat next byte 257-h times
            if i >= len(data):
                raise ValueError("truncated PackBits run")
            out += bytes([data[i]]) * (257 - h)
            i += 1
        # h == 128: no-op per spec
    if len(out) != n_out:
        raise ValueError(
            f"PackBits strip decodes {len(out)} of {n_out} bytes"
        )
    return bytes(out)


def build_tiff(
    arr,
    compression: int = 1,
    predictor: int = 1,
    rows_per_strip: int | None = None,
    endian: str = "<",
    extra_pages: int = 0,
) -> bytes:
    """Fixture writer: (h, w) grayscale or (h, w, 3) RGB uint8 array
    → baseline strip-organized TIFF in either byte order, with
    compression 1 (none), 5 (LZW; ``predictor=2`` adds horizontal
    differencing), or 32773 (PackBits). ``extra_pages`` chains
    additional IFDs reusing the same strips (multi-page triage
    fixtures)."""
    import numpy as np

    a = np.ascontiguousarray(arr, dtype="uint8")
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 3):
        raise ValueError(f"expected (h,w) or (h,w,3), got {a.shape}")
    h, w, spp = a.shape
    if compression not in (1, 5, 32773):
        raise ValueError(f"fixture compression {compression}")
    if predictor == 2 and compression != 5:
        raise ValueError("predictor 2 is an LZW option")
    rps = rows_per_strip or max(1, h // 3)
    strips = []
    for y0 in range(0, h, rps):
        rows = a[y0:y0 + rps]
        if predictor == 2:
            rows = rows.astype(np.int16)
            rows = np.concatenate(
                [rows[:, :1, :], np.diff(rows, axis=1)], axis=1
            ).astype("uint8")  # mod-256 horizontal differencing
        raw = rows.tobytes()
        if compression == 5:
            strips.append(_tiff_lzw_encode(raw))
        elif compression == 32773:
            strips.append(_packbits_encode(raw))
        else:
            strips.append(raw)

    e = endian
    out = bytearray()
    out += (b"II*\x00" if e == "<" else b"MM\x00*")
    out += b"\x00\x00\x00\x00"  # first-IFD offset patched below
    strip_offsets = []
    for s in strips:
        strip_offsets.append(len(out))
        out += s

    def entry(tag, typ, count, value):
        return struct.pack(e + "HHI", tag, typ, count) + value

    n_strips = len(strips)
    ifd_offsets = []
    for page in range(1 + extra_pages):
        # out-of-line arrays for this IFD
        extra = bytearray()
        extra_at = {}

        def arr_value(key, fmt, values, base):
            data = b"".join(struct.pack(e + fmt, v) for v in values)
            if len(data) <= 4:
                return data.ljust(4, b"\x00")
            extra_at[key] = base + len(extra)
            extra.extend(data)
            return None  # patched after layout

        entries = []
        ifd_at_guess = len(out)
        n_entries = 8 + (1 if spp == 3 else 0) + (
            1 if predictor == 2 else 0
        )
        ifd_len = 2 + 12 * n_entries + 4
        extra_base = ifd_at_guess + ifd_len

        def add(tag, typ, count, fmt, values):
            inline = arr_value((tag, page), fmt, values, extra_base)
            if inline is None:
                inline = struct.pack(e + "I", extra_at[(tag, page)])
            entries.append(entry(tag, typ, count, inline))

        add(256, 3, 1, "H", [w])
        add(257, 3, 1, "H", [h])
        add(258, 3, spp, "H", [8] * spp)
        add(259, 3, 1, "H", [compression])
        add(262, 3, 1, "H", [2 if spp == 3 else 1])
        add(273, 4, n_strips, "I", strip_offsets)
        if spp == 3:
            add(277, 3, 1, "H", [spp])
        add(278, 3, 1, "H", [rps])
        add(279, 4, n_strips, "I", [len(s) for s in strips])
        if predictor == 2:
            add(317, 3, 1, "H", [predictor])
        entries.sort(key=lambda b: struct.unpack(e + "H", b[:2])[0])
        ifd_offsets.append(len(out))
        out += struct.pack(e + "H", len(entries))
        out += b"".join(entries)
        out += b"\x00\x00\x00\x00"  # next-IFD link patched below
        out += extra
    # patch the IFD chain
    struct.pack_into(e + "I", out, 4, ifd_offsets[0])
    for i in range(len(ifd_offsets) - 1):
        at = ifd_offsets[i]
        n = struct.unpack(e + "H", out[at:at + 2])[0]
        struct.pack_into(e + "I", out, at + 2 + 12 * n, ifd_offsets[i + 1])
    return bytes(out)


def _walk_ifds(payload: bytes):
    """Yield (endian, {tag: (type, count, values)}) per IFD in chain
    order; values resolved through inline/offset layout for SHORT/
    LONG types (what the baseline tags use)."""
    if payload[:4] not in TIFF_MAGICS:
        raise ValueError("not a TIFF payload")
    e = "<" if payload[:2] == b"II" else ">"
    (ifd_at,) = struct.unpack(e + "I", payload[4:8])
    seen = set()
    while ifd_at:
        if ifd_at in seen:
            raise ValueError("TIFF IFD chain cycle")
        seen.add(ifd_at)
        if ifd_at + 2 > len(payload):
            raise ValueError("truncated TIFF IFD")
        (n,) = struct.unpack(e + "H", payload[ifd_at:ifd_at + 2])
        tags = {}
        for k in range(n):
            at = ifd_at + 2 + 12 * k
            if at + 12 > len(payload):
                raise ValueError("truncated TIFF IFD entry")
            tag, typ, count = struct.unpack(
                e + "HHI", payload[at:at + 8]
            )
            if typ == 3:
                size, fmt = 2, "H"
            elif typ == 4:
                size, fmt = 4, "I"
            else:
                tags[tag] = (typ, count, None)
                continue
            total = size * count
            if total <= 4:
                raw = payload[at + 8:at + 8 + total]
            else:
                (off,) = struct.unpack(
                    e + "I", payload[at + 8:at + 12]
                )
                raw = payload[off:off + total]
                if len(raw) < total:
                    raise ValueError(
                        f"TIFF tag {tag} values beyond payload"
                    )
            tags[tag] = (
                typ,
                count,
                list(struct.unpack(e + fmt * count, raw)),
            )
        next_at = ifd_at + 2 + 12 * n
        if next_at + 4 > len(payload):
            raise ValueError("truncated TIFF next-IFD link")
        (ifd_at,) = struct.unpack(
            e + "I", payload[next_at:next_at + 4]
        )
        yield e, tags


def _tag1(tags, tag, default=None):
    t = tags.get(tag)
    if t is None or t[2] is None:
        return default
    return t[2][0]


def parse_tiff_metadata(payload: bytes) -> dict:
    """Triage walk: ``{endian, width, height, bits_per_sample,
    samples_per_pixel, compression, n_pages}`` (first page's shape,
    full chain counted) — the pre-decode filter shared with
    GIF/PDF/MP4 triage."""
    first = None
    n_pages = 0
    for e, tags in _walk_ifds(payload):
        n_pages += 1
        if first is None:
            first = (e, tags)
    if first is None:
        raise ValueError("TIFF has no IFDs")
    e, tags = first
    width = _tag1(tags, 256)
    height = _tag1(tags, 257)
    if width is None or height is None:
        raise ValueError("TIFF IFD lacks width/height")
    return {
        "endian": "little" if e == "<" else "big",
        "width": int(width),
        "height": int(height),
        "bits_per_sample": int(_tag1(tags, 258, 1)),
        "samples_per_pixel": int(_tag1(tags, 277, 1)),
        "compression": int(_tag1(tags, 259, 1)),
        "n_pages": n_pages,
    }


def decode_tiff_pixels(payload: bytes):
    """Decode the FIRST page to ``(h, w, c, uint8 ndarray)`` (c = 1
    or 3): strips reassembled per RowsPerStrip, compression 1 /
    LZW (+predictor 2 undifferencing) / PackBits, photometric 0
    inverted to the standard black-is-zero convention. Typed
    refusals for tiles, JPEG-in-TIFF, CCITT, and non-8-bit depths."""
    import numpy as np

    for e, tags in _walk_ifds(payload):
        break
    else:
        raise ValueError("TIFF has no IFDs")
    if 322 in tags or 323 in tags:
        raise NotImplementedError(
            "tiled TIFF unsupported (strip organization only)"
        )
    w = _tag1(tags, 256)
    h = _tag1(tags, 257)
    if w is None or h is None:
        raise ValueError("TIFF IFD lacks width/height")
    spp = int(_tag1(tags, 277, 1))
    bits = tags.get(258, (3, 1, [8]))[2] or [8]
    if spp not in (1, 3) or any(b != 8 for b in bits):
        raise NotImplementedError(
            f"{bits}-bit x{spp} TIFF unsupported (8-bit gray/RGB)"
        )
    comp = int(_tag1(tags, 259, 1))
    if comp in (2, 3, 4):
        raise NotImplementedError("CCITT fax TIFF is the library swap")
    if comp in (6, 7):
        raise NotImplementedError(
            "JPEG-in-TIFF unsupported here (extract the JPEG stream "
            "for operators/jpeg.py instead)"
        )
    if comp not in (1, 5, 32773):
        raise NotImplementedError(f"TIFF compression {comp}")
    photometric = int(_tag1(tags, 262, 1))
    if photometric not in (0, 1, 2):
        raise NotImplementedError(
            f"TIFF photometric {photometric} unsupported"
        )
    predictor = int(_tag1(tags, 317, 1))
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor}")
    rps = int(_tag1(tags, 278, h))
    offsets = tags.get(273, (4, 0, []))[2] or []
    counts = tags.get(279, (4, 0, []))[2] or []
    if not offsets or len(offsets) != len(counts):
        raise ValueError("TIFF strip offsets/counts missing/mismatched")
    expect_strips = -(-h // rps)
    if len(offsets) != expect_strips:
        raise ValueError(
            f"TIFF declares {len(offsets)} strips for {expect_strips}"
        )
    rows = bytearray()
    for i, (off, cnt) in enumerate(zip(offsets, counts)):
        strip = payload[off:off + cnt]
        if len(strip) < cnt:
            raise ValueError(f"TIFF strip {i} beyond payload")
        n_rows = min(rps, h - i * rps)
        n_out = n_rows * w * spp
        if comp == 5:
            raw = _tiff_lzw_decode(strip, n_out)
        elif comp == 32773:
            raw = _packbits_decode(strip, n_out)
        else:
            if len(strip) != n_out:
                raise ValueError(
                    f"uncompressed strip {i} is {len(strip)}B, "
                    f"needs {n_out}"
                )
            raw = strip
        rows += raw
    arr = np.frombuffer(bytes(rows), dtype="uint8").reshape(h, w, spp)
    if predictor == 2:
        arr = np.cumsum(arr.astype(np.int64), axis=1).astype("uint8")
    if photometric == 0:  # white-is-zero → invert to black-is-zero
        arr = (255 - arr.astype(np.int16)).astype("uint8")
    return h, w, spp, arr


TIFF_META_SCHEMA = (
    "doc_id bigint, endian string, width int, height int, "
    "bits_per_sample int, samples_per_pixel int, compression int, "
    "n_pages int"
)


def tiff_metadata(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched TIFF triage — map-only, the metadata-walk scale
    shape shared by GIF/MP3/MP4/PDF/FLAC."""
    from mongo2pq_spark.deploy import ensure_shipped

    ensure_shipped(df.sparkSession)

    def parse_batches(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                m = parse_tiff_metadata(bytes(payload))
                m["doc_id"] = doc_id
                rows.append(m)
            yield pd.DataFrame(rows)

    return df.mapInPandas(parse_batches, TIFF_META_SCHEMA)


def tiff_pixel_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched REAL TIFF pixel decode via the shared
    ``pixel_stats_with`` harness."""
    from mongo2pq_spark.operators.multimodal import pixel_stats_with

    return pixel_stats_with(decode_tiff_pixels, df, id_col, payload_col)
