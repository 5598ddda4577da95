"""PDF (ISO 32000) metadata triage in pure stdlib — the
document-modality sibling of the MP4 box walk and MP3 frame walk:
version, object count, page count, encryption flag, and the Info
title, extracted by a REAL cross-reference-table walk with no
rendering library. This is the filter stage a document pipeline runs
on 100 % of a PDF corpus (page-count windows, encrypted-document
routing, scanned-vs-digital triage) before any text extraction.

Scope: classic cross-reference TABLES (the `xref` keyword) AND
PDF 1.5+ cross-reference STREAMS (r17 — VERDICT r16 #4: modern
writers ship compressed xref + object streams almost universally,
and the machinery is pure stdlib ``zlib``): /XRef streams with
FlateDecode and the PNG row predictors real writers emit
(/Predictor 10–15), /Index subsections, /Prev incremental-update
chains (newest entry wins), type-2 entries resolved through
FlateDecode'd /ObjStm object streams. Corrupt structure raises
``ValueError``; exotic filters (non-Flate) raise
``NotImplementedError``. Encrypted documents are REPORTED
(``encrypted=True``) but their strings are never decrypted — so
``title`` is None there.

The parser resolves objects THROUGH the xref offsets (never by
scanning for ``obj`` tokens), which the corrupted-offset unit test
pins: breaking one xref entry must break the parse.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_OBJ_RE = re.compile(rb"^\s*(\d+)\s+(\d+)\s+obj\b")


def build_pdf_stub(
    n_pages: int,
    title: str | None = None,
    encrypted: bool = False,
    pad: int = 0,
) -> bytes:
    """Minimal structurally real PDF: catalog → pages tree → ``n_pages``
    page objects (+ optional Info with /Title and a dummy /Encrypt
    dict), a correct xref TABLE with byte-exact offsets, and a
    trailer. ``pad`` inserts a comment of that many bytes after the
    header so every object offset shifts per document — a parser that
    ignored the xref could not stay correct across pads."""
    objs: list[bytes] = []
    kids = " ".join(f"{3 + i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    for _ in range(n_pages):
        objs.append(b"<< /Type /Page /Parent 2 0 R >>")
    extra = []
    if title is not None:
        objs.append(f"<< /Title ({title}) >>".encode())
        extra.append(f"/Info {len(objs)} 0 R")
    if encrypted:
        objs.append(b"<< /Filter /Standard /V 1 >>")
        extra.append(f"/Encrypt {len(objs)} 0 R")

    out = bytearray(b"%PDF-1.4\n")
    if pad:
        out += b"%" + b"p" * pad + b"\n"
    offsets = [0]  # object 0 is the free-list head
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    trailer = f"<< /Size {len(objs) + 1} /Root 1 0 R "
    trailer += " ".join(extra)
    trailer += " >>"
    out += b"trailer\n" + trailer.encode()
    out += f"\nstartxref\n{xref_at}\n%%EOF\n".encode()
    return bytes(out)


def _png_predict_up(rows: list[bytes]) -> bytes:
    """PNG Predictor-12 (Up) encoder for the fixture writer: each
    row is emitted as filter byte 2 + (row − previous row) mod 256 —
    the predictor real PDF writers overwhelmingly use for xref
    streams."""
    out = bytearray()
    prev = bytes(len(rows[0])) if rows else b""
    for row in rows:
        out.append(2)
        out += bytes((row[i] - prev[i]) & 0xFF for i in range(len(row)))
        prev = row
    return bytes(out)


def build_pdf_stub_xrefstream(
    n_pages: int,
    title: str | None = None,
    encrypted: bool = False,
    pad: int = 0,
    page_texts: list[bytes] | None = None,
    page_images: list[dict | None] | None = None,
) -> bytes:
    """Minimal structurally real PDF **1.5**: catalog, pages tree and
    Info live INSIDE a FlateDecode'd object stream (/ObjStm, type-2
    xref entries), page objects are direct (type 1), and the
    cross-reference is a /XRef STREAM — FlateDecode + PNG Up
    predictor (/Predictor 12), W [1 2 1], an /Index with two
    subsections — exactly the layout modern writers emit (ISO 32000
    §7.5.7/§7.5.8). ``pad`` shifts every offset as in the classic
    builder, so an offset-ignoring parser cannot stay correct.
    ``page_texts`` (optional, one content-stream body per page, raw
    operator bytes) attaches FlateDecode'd /Contents streams — the
    text-extraction fixture surface. ``page_images`` (r18, optional,
    one entry or None per page) attaches an /XObject /Image to the
    page's /Resources: each entry is a dict with ``filter`` (name
    bytes, e.g. b"DCTDecode"), ``data`` (the already-encoded stream
    bytes), ``width``/``height``/``bpc``, ``colorspace`` (name
    bytes) and optional ``parms`` (a /DecodeParms dict literal) —
    the embedded-image extraction fixture surface."""
    import zlib

    out = bytearray(b"%PDF-1.5\n")
    if pad:
        out += b"%" + b"p" * pad + b"\n"
    if page_texts is not None and len(page_texts) != n_pages:
        raise ValueError("page_texts length must equal n_pages")
    if page_images is not None and len(page_images) != n_pages:
        raise ValueError("page_images length must equal n_pages")

    kids = " ".join(f"{3 + i} 0 R" for i in range(n_pages))
    in_stream: list[tuple[int, bytes]] = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()),
    ]
    next_num = 3 + n_pages
    content_refs: dict[int, int] = {}
    if page_texts is not None:
        for i in range(n_pages):
            content_refs[3 + i] = next_num
            next_num += 1
    image_refs: dict[int, int] = {}
    if page_images is not None:
        for i in range(n_pages):
            if page_images[i] is not None:
                image_refs[3 + i] = next_num
                next_num += 1
    info_ref = None
    if title is not None:
        info_ref = next_num
        in_stream.append((info_ref, f"<< /Title ({title}) >>".encode()))
        next_num += 1
    encrypt_ref = None
    direct_offsets: dict[int, int] = {}
    for i in range(n_pages):
        direct_offsets[3 + i] = len(out)
        contents = (
            f" /Contents {content_refs[3 + i]} 0 R"
            if content_refs
            else ""
        )
        resources = (
            f" /Resources << /XObject << /Im0 {image_refs[3 + i]} "
            "0 R >> >>"
            if 3 + i in image_refs
            else ""
        )
        out += (
            f"{3 + i} 0 obj\n<< /Type /Page /Parent 2 0 R"
            f"{contents}{resources} >>\nendobj\n"
        ).encode()
    for i in range(n_pages):
        if 3 + i not in image_refs:
            continue
        spec = page_images[i]
        num = image_refs[3 + i]
        parms = spec.get("parms", b"")
        parms_part = (
            b" /DecodeParms " + parms if parms else b""
        )
        direct_offsets[num] = len(out)
        out += (
            (
                f"{num} 0 obj\n<< /Type /XObject /Subtype /Image "
                f"/Width {spec['width']} /Height {spec['height']} "
                f"/BitsPerComponent {spec['bpc']} "
            ).encode()
            + b"/ColorSpace /" + spec["colorspace"]
            + b" /Filter /" + spec["filter"]
            + parms_part
            + f" /Length {len(spec['data'])} >>\nstream\n".encode()
            + spec["data"]
            + b"\nendstream\nendobj\n"
        )
    for i in range(n_pages):
        if not content_refs:
            break
        num = content_refs[3 + i]
        data = zlib.compress(page_texts[i], 9)
        direct_offsets[num] = len(out)
        out += (
            f"{num} 0 obj\n<< /Filter /FlateDecode "
            f"/Length {len(data)} >>\nstream\n"
        ).encode() + data + b"\nendstream\nendobj\n"
    if encrypted:
        # the encryption dict shall NOT live in an object stream
        encrypt_ref = next_num
        next_num += 1
        direct_offsets[encrypt_ref] = len(out)
        out += (
            f"{encrypt_ref} 0 obj\n<< /Filter /Standard /V 1 >>\nendobj\n"
        ).encode()

    # the object stream: header = N (objnum, offset) pairs, then the
    # member bodies at /First + offset
    objstm_num = next_num
    xref_num = next_num + 1
    header_parts, bodies, rel = [], [], 0
    for num, body in in_stream:
        header_parts.append(f"{num} {rel}")
        bodies.append(body)
        rel += len(body) + 1
    hdr = (" ".join(header_parts) + "\n").encode()
    stm_plain = hdr + b"\n".join(bodies) + b"\n"
    stm_data = zlib.compress(stm_plain, 9)
    direct_offsets[objstm_num] = len(out)
    out += (
        f"{objstm_num} 0 obj\n<< /Type /ObjStm /N {len(in_stream)} "
        f"/First {len(hdr)} /Filter /FlateDecode "
        f"/Length {len(stm_data)} >>\nstream\n"
    ).encode() + stm_data + b"\nendstream\nendobj\n"

    # xref stream: W [1 2 1]; PNG Up predictor over 4-byte rows
    size = xref_num + 1
    xref_at = len(out)

    def row(t: int, f2: int, f3: int) -> bytes:
        if f2 > 0xFFFF:
            raise ValueError("fixture offset exceeds the 2-byte W field")
        return bytes([t]) + f2.to_bytes(2, "big") + bytes([f3])

    rows = [row(0, 0, 255)]  # object 0: free-list head
    for num in range(1, size):
        stm_idx = next(
            (i for i, (n, _) in enumerate(in_stream) if n == num), None
        )
        if stm_idx is not None:
            rows.append(row(2, objstm_num, stm_idx))
        elif num == xref_num:
            rows.append(row(1, xref_at, 0))
        else:
            rows.append(row(1, direct_offsets[num], 0))
    # two /Index subsections over a contiguous range (the predictor
    # still runs over the WHOLE stream, per spec) — exercises the
    # multi-subsection parse
    split = max(1, size // 2)
    xdata = zlib.compress(_png_predict_up(rows), 9)
    extra = ""
    if info_ref is not None:
        extra += f" /Info {info_ref} 0 R"
    if encrypt_ref is not None:
        extra += f" /Encrypt {encrypt_ref} 0 R"
    out += (
        f"{xref_num} 0 obj\n<< /Type /XRef /Size {size} "
        f"/W [1 2 1] /Index [0 {split} {split} {size - split}] "
        f"/Root 1 0 R{extra} /Filter /FlateDecode "
        f"/DecodeParms << /Predictor 12 /Columns 4 >> "
        f"/Length {len(xdata)} >>\nstream\n"
    ).encode() + xdata + b"\nendstream\nendobj\n"
    out += f"startxref\n{xref_at}\n%%EOF\n".encode()
    return bytes(out)


def append_pdf_retitle_update(payload: bytes, new_title: str) -> bytes:
    """Fixture helper: append an INCREMENTAL UPDATE (ISO 32000
    §7.5.6) that replaces the Info object — a new direct Info object
    plus a new xref stream whose /Prev points at the previous one.
    The parser must prefer the NEWEST entry for the Info number, so
    the returned document reports ``new_title``."""
    import re as _re
    import zlib

    sm = None
    for sm in _re.finditer(rb"startxref\s+(\d+)\s+%%EOF", payload):
        pass
    if sm is None:
        raise ValueError("no startxref to update")
    prev_at = int(sm.group(1))
    d, _ = _obj_dict_and_stream(payload, prev_at)
    info_ref = _dict_ref(d, rb"/Info")
    size = int(_re.search(rb"/Size\s+(\d+)", d).group(1))
    if info_ref is None:
        raise ValueError("document has no /Info to retitle")
    # required trailer entries repeat in every update's trailer —
    # dropping /Encrypt here would un-encrypt the document
    encrypt_ref = _dict_ref(d, rb"/Encrypt")
    carry = (
        f" /Encrypt {encrypt_ref} 0 R" if encrypt_ref is not None else ""
    )
    out = bytearray(payload)
    new_info_at = len(out)
    out += (
        f"{info_ref} 0 obj\n<< /Title ({new_title}) >>\nendobj\n"
    ).encode()
    xref_at = len(out)
    rowbytes = (
        bytes([1]) + new_info_at.to_bytes(2, "big") + bytes([0])
    )
    xdata = zlib.compress(_png_predict_up([rowbytes]), 9)
    out += (
        f"{size} 0 obj\n<< /Type /XRef /Size {size} "
        f"/W [1 2 1] /Index [{info_ref} 1] /Prev {prev_at} "
        f"/Root 1 0 R /Info {info_ref} 0 R{carry} /Filter /FlateDecode "
        f"/DecodeParms << /Predictor 12 /Columns 4 >> "
        f"/Length {len(xdata)} >>\nstream\n"
    ).encode() + xdata + b"\nendstream\nendobj\n"
    out += f"startxref\n{xref_at}\n%%EOF\n".encode()
    return bytes(out)


def _read_obj(payload: bytes, offset: int) -> bytes:
    """Read the object body starting at a byte offset from the xref:
    validate the ``N G obj`` header AT THAT OFFSET, return the bytes
    up to ``endobj``."""
    m = _OBJ_RE.match(payload[offset:offset + 64])
    if not m:
        raise ValueError(f"no object header at xref offset {offset}")
    start = offset + m.end()
    end = payload.find(b"endobj", start)
    if end < 0:
        raise ValueError(f"object at {offset} has no endobj")
    return payload[start:end]


def _dict_ref(body: bytes, key: bytes) -> int | None:
    m = re.search(key + rb"\s+(\d+)\s+\d+\s+R", body)
    return int(m.group(1)) if m else None


def _dict_int(body: bytes, key: bytes) -> int | None:
    m = re.search(key + rb"\s+(\d+)", body)
    return int(m.group(1)) if m else None


def _balanced_dict(payload: bytes, start: int) -> tuple[bytes, int]:
    """The ``<< ... >>`` dict starting at/after ``start`` (nesting
    balanced); returns (dict bytes incl. delimiters, end offset)."""
    ds = payload.find(b"<<", start)
    if ds < 0:
        raise ValueError("expected a dictionary")
    depth, i = 0, ds
    while i < len(payload) - 1:
        two = payload[i:i + 2]
        if two == b"<<":
            depth += 1
            i += 2
        elif two == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return payload[ds:i], i
        else:
            i += 1
    raise ValueError("unterminated dictionary")


def _obj_dict_and_stream(
    payload: bytes, offset: int
) -> tuple[bytes, bytes]:
    """Stream object at a byte offset: validate the ``N G obj``
    header, return (dict bytes, RAW stream bytes per the direct
    /Length). The xref-stream /Length is required direct by spec;
    an indirect one here is a typed refusal."""
    m = _OBJ_RE.match(payload[offset:offset + 64])
    if not m:
        raise ValueError(f"no object header at xref offset {offset}")
    d, dend = _balanced_dict(payload, offset + m.end())
    if re.search(rb"/Length\s+\d+\s+\d+\s+R", d):
        raise NotImplementedError(
            "indirect /Length on a stream object"
        )
    length = _dict_int(d, rb"/Length")
    if length is None:
        raise ValueError("stream object lacks /Length")
    sm = re.compile(rb"stream(\r\n|\n)").match(payload, dend)
    if sm is None:
        sm = re.compile(rb"\s*stream(\r\n|\n)").match(payload, dend)
    if sm is None:
        raise ValueError("dict not followed by a stream keyword")
    data = payload[sm.end():sm.end() + length]
    if len(data) < length:
        raise ValueError("truncated stream data")
    after = payload[sm.end() + length:sm.end() + length + 16]
    if b"endstream" not in after:
        raise ValueError("/Length does not reach endstream")
    return d, data


def _png_unpredict(data: bytes, columns: int) -> bytes:
    """Reverse the PNG row predictors (/Predictor 10–15; the filter
    byte per row selects None/Sub/Up/Average/Paeth) at one byte per
    pixel — the xref-stream shape (/Colors 1, /BitsPerComponent 8)."""
    row_len = columns + 1
    if row_len <= 1 or len(data) % row_len:
        raise ValueError(
            f"predictor data length {len(data)} not a multiple of "
            f"row length {row_len}"
        )
    out = bytearray()
    prev = bytearray(columns)
    for r in range(len(data) // row_len):
        ft = data[r * row_len]
        row = bytearray(data[r * row_len + 1:(r + 1) * row_len])
        for i in range(columns):
            a = row[i - 1] if i else 0
            b = prev[i]
            c = prev[i - 1] if i else 0
            if ft == 0:
                pass
            elif ft == 1:
                row[i] = (row[i] + a) & 0xFF
            elif ft == 2:
                row[i] = (row[i] + b) & 0xFF
            elif ft == 3:
                row[i] = (row[i] + (a + b) // 2) & 0xFF
            elif ft == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
            else:
                raise ValueError(f"unknown PNG filter type {ft}")
        out += row
        prev = row
    return bytes(out)


def _decode_stream(d: bytes, data: bytes) -> bytes:
    """Apply /Filter (+/DecodeParms) to raw stream bytes. Scope:
    no filter, or FlateDecode with optional PNG predictors — the
    xref/object-stream reality; anything else is the typed
    library-swap refusal."""
    import zlib

    fm = re.search(rb"/Filter\s*/(\w+)", d)
    if fm is None:
        return data
    if fm.group(1) != b"FlateDecode":
        raise NotImplementedError(
            f"stream filter {fm.group(1).decode()} (FlateDecode is "
            "the xref/object-stream reality; others are the library "
            "swap)"
        )
    try:
        data = zlib.decompress(data)
    except zlib.error as exc:
        raise ValueError(f"corrupt FlateDecode stream: {exc}") from exc
    pred = _dict_int(d, rb"/Predictor")
    if pred is None or pred == 1:
        return data
    if pred == 2:
        raise NotImplementedError("TIFF predictor 2 unsupported")
    if not 10 <= pred <= 15:
        raise ValueError(f"unknown /Predictor {pred}")
    colors = _dict_int(d, rb"/Colors")
    bpc = _dict_int(d, rb"/BitsPerComponent")
    if (colors not in (None, 1)) or (bpc not in (None, 8)):
        raise NotImplementedError(
            "PNG predictor with /Colors != 1 or /BitsPerComponent "
            "!= 8 (not an xref-stream shape)"
        )
    columns = _dict_int(d, rb"/Columns") or 1
    return _png_unpredict(data, columns)


def _parse_xref_stream(payload: bytes, offset: int):
    """One /XRef stream: returns (entries, dict bytes, prev offset).
    entries: objnum → ('d', byte offset) | ('s', objstm num, idx)."""
    d, raw = _obj_dict_and_stream(payload, offset)
    tm = re.search(rb"/Type\s*/(\w+)", d)
    if tm is None or tm.group(1) != b"XRef":
        raise ValueError(
            f"startxref object at {offset} is not /Type /XRef"
        )
    size = _dict_int(d, rb"/Size")
    wm = re.search(rb"/W\s*\[([^\]]*)\]", d)
    if size is None or wm is None:
        raise ValueError("xref stream lacks /Size or /W")
    w = [int(x) for x in wm.group(1).split()]
    if len(w) != 3 or any(x < 0 for x in w) or sum(w) == 0:
        raise ValueError(f"bad /W {w}")
    im = re.search(rb"/Index\s*\[([^\]]*)\]", d)
    idx = (
        [int(x) for x in im.group(1).split()]
        if im
        else [0, size]
    )
    if len(idx) % 2:
        raise ValueError("odd /Index")
    data = _decode_stream(d, raw)
    entry_len = sum(w)
    need = sum(c for _, c in zip(idx[::2], idx[1::2])) * entry_len
    if len(data) < need:
        raise ValueError(
            f"xref stream data {len(data)}B < declared entries {need}B"
        )
    entries: dict[int, tuple] = {}
    pos = 0
    for first, count in zip(idx[::2], idx[1::2]):
        for k in range(count):
            fields = []
            for width in w:
                fields.append(
                    int.from_bytes(data[pos:pos + width], "big")
                    if width
                    else None
                )
                pos += width
            t = fields[0] if w[0] else 1  # absent type defaults to 1
            if t == 1:
                entries[first + k] = ("d", fields[1])
            elif t == 2:
                entries[first + k] = ("s", fields[1], fields[2] or 0)
            elif t != 0:
                raise ValueError(f"unknown xref entry type {t}")
    return entries, d, _dict_int(d, rb"/Prev")


def _xref_stream_chain(payload: bytes, xref_at: int):
    """Walk /Prev incremental-update chains from the newest stream;
    the FIRST (newest) entry per object number wins. Returns
    (entries, the newest stream's dict — the trailer surrogate)."""
    entries: dict[int, tuple] = {}
    trailer = None
    seen: set[int] = set()
    at: int | None = xref_at
    while at is not None:
        if at in seen:
            raise ValueError("xref /Prev cycle")
        seen.add(at)
        e, d, prev = _parse_xref_stream(payload, at)
        if trailer is None:
            trailer = d
        for k, v in e.items():
            entries.setdefault(k, v)
        at = prev
    return entries, trailer


def _objstm_member(payload: bytes, entries: dict, num: int, idx: int) -> bytes:
    """Resolve a type-2 xref entry: decompress the owning /ObjStm,
    parse its N (objnum, offset) header pairs, slice member ``idx``."""
    ent = entries.get(num)
    if ent is None or ent[0] != "d":
        raise ValueError(
            f"object stream {num} is missing or itself in a stream"
        )
    d, raw = _obj_dict_and_stream(payload, ent[1])
    tm = re.search(rb"/Type\s*/(\w+)", d)
    if tm is None or tm.group(1) != b"ObjStm":
        raise ValueError(f"object {num} is not /Type /ObjStm")
    n = _dict_int(d, rb"/N")
    first = _dict_int(d, rb"/First")
    if n is None or first is None:
        raise ValueError("/ObjStm lacks /N or /First")
    data = _decode_stream(d, raw)
    header = data[:first].split()
    if len(header) < 2 * n:
        raise ValueError("/ObjStm header shorter than /N pairs")
    if not 0 <= idx < n:
        raise ValueError(f"object-stream index {idx} outside 0..{n - 1}")
    rel = int(header[2 * idx + 1])
    end = int(header[2 * idx + 3]) if idx + 1 < n else len(data) - first
    return data[first + rel:first + end]


def _classic_xref(payload: bytes, xref_at: int):
    """Classic ``xref`` TABLE walk: returns (entries in the unified
    objnum → ('d', offset) shape, trailer dict bytes)."""
    pos = xref_at + 4
    entries: dict[int, tuple] = {}
    while True:
        sub = re.match(rb"\s*(\d+)\s+(\d+)\s*", payload[pos:pos + 48])
        if not sub:
            break
        first, count = int(sub.group(1)), int(sub.group(2))
        pos += sub.end()
        for k in range(count):
            entry = payload[pos:pos + 20]
            if len(entry) < 18:
                raise ValueError("truncated xref entry")
            off, _gen, kind = entry[:10], entry[11:16], entry[17:18]
            if kind not in (b"n", b"f"):
                raise ValueError(f"bad xref entry kind {kind!r}")
            if kind == b"n":
                entries[first + k] = ("d", int(off))
            pos += 20
        if payload[pos:pos + 7].lstrip().startswith(b"trailer"):
            break
    tm = re.search(rb"trailer\s*<<", payload[pos:])
    if not tm:
        raise ValueError("xref has no trailer")
    trailer, _ = _balanced_dict(payload, pos + tm.end() - 2)
    return entries, trailer


def _resolve_xref(payload: bytes):
    """Shared front half of every PDF reader here: header version,
    startxref dispatch (classic table vs 1.5+ stream), unified entry
    map, trailer dict, and an object loader that resolves both
    direct and object-stream-resident objects. Returns
    (version, entries, trailer, load_fn)."""
    m = re.match(rb"%PDF-(\d+\.\d+)", payload[:16])
    if not m:
        raise ValueError("not a PDF (no %PDF header)")
    version = m.group(1).decode()
    tail = payload[-256:]
    sm = re.search(rb"startxref\s+(\d+)\s+%%EOF", tail)
    if not sm:
        raise ValueError("no startxref/%%EOF trailer")
    xref_at = int(sm.group(1))
    if payload[xref_at:xref_at + 4] == b"xref":
        entries, trailer = _classic_xref(payload, xref_at)
    elif _OBJ_RE.match(payload[xref_at:xref_at + 64]):
        # PDF 1.5+ cross-reference STREAM (r17 — VERDICT r16 #4)
        entries, trailer = _xref_stream_chain(payload, xref_at)
    else:
        raise ValueError(f"startxref {xref_at} does not point at xref")

    def _load(ref: int) -> bytes:
        ent = entries.get(ref)
        if ent is None:
            raise ValueError(f"xref has no entry for object {ref}")
        if ent[0] == "d":
            return _read_obj(payload, ent[1])
        return _objstm_member(payload, entries, ent[1], ent[2])

    return version, entries, trailer, _load


def parse_pdf_metadata(payload: bytes) -> dict:
    """Parse ``{version, n_objects, n_pages, encrypted, title}`` via
    the cross-reference machinery — classic tables or 1.5+ xref
    STREAMS (object-stream members resolved through /ObjStm). See
    module docstring for scope."""
    version, entries, trailer, _load = _resolve_xref(payload)
    size = re.search(rb"/Size\s+(\d+)", trailer)
    root_ref = _dict_ref(trailer, rb"/Root")
    if size is None or root_ref is None:
        raise ValueError("trailer lacks /Size or /Root")
    encrypted = _dict_ref(trailer, rb"/Encrypt") is not None

    catalog = _load(root_ref)
    pages_ref = _dict_ref(catalog, rb"/Pages")
    if pages_ref is None:
        raise ValueError("catalog has no /Pages")
    pages = _load(pages_ref)
    cm = re.search(rb"/Count\s+(\d+)", pages)
    if not cm:
        raise ValueError("pages tree has no /Count")

    title = None
    if not encrypted:
        info_ref = _dict_ref(trailer, rb"/Info")
        if info_ref is not None:
            info = _load(info_ref)
            t = re.search(rb"/Title\s*\(([^)]*)\)", info)
            if t:
                title = t.group(1).decode("latin-1")
    return {
        "version": version,
        "n_objects": int(size.group(1)) - 1,  # minus the free head
        "n_pages": int(cm.group(1)),
        "encrypted": encrypted,
        "title": title,
    }


def _pdf_string_at(data: bytes, i: int) -> tuple[bytes, int]:
    """Read a PDF literal string starting at ``data[i] == '('``:
    balanced unescaped parens, the standard escapes, octal escapes
    (ISO 32000 §7.3.4.2). Returns (bytes, next index)."""
    simple = {
        ord("n"): 10, ord("r"): 13, ord("t"): 9,
        ord("b"): 8, ord("f"): 12,
    }
    depth, out, j = 1, bytearray(), i + 1
    n = len(data)
    while j < n and depth:
        c = data[j]
        if c == 0x5C:  # backslash
            j += 1
            if j >= n:
                break
            e = data[j]
            if e in simple:
                out.append(simple[e])
                j += 1
            elif 0x30 <= e <= 0x37:
                o, k = 0, 0
                while k < 3 and j < n and 0x30 <= data[j] <= 0x37:
                    o = o * 8 + data[j] - 0x30
                    j += 1
                    k += 1
                out.append(o & 0xFF)
            elif e in (10, 13):  # line continuation
                j += 1
                if e == 13 and j < n and data[j] == 10:
                    j += 1
            else:  # \( \) \\ and any other: the char itself
                out.append(e)
                j += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            j += 1
        elif c == 0x29:
            depth -= 1
            if depth:
                out.append(c)
            j += 1
        else:
            out.append(c)
            j += 1
    if depth:
        raise ValueError("unterminated PDF string")
    return bytes(out), j


_CS_TOKEN = re.compile(rb"[A-Za-z'\"][A-Za-z0-9*'\"]*")


def _text_from_content(data: bytes) -> str:
    """Extract shown text from one page's (decoded) content stream:
    ``Tj``/``'``/``\"`` literal strings and ``TJ`` arrays (kerning
    numbers skipped) accumulate onto the current line; ``Td``/``TD``/
    ``T*``/``'``/``\"`` start a new line. Bytes decode latin-1 — the
    identity for the fixture surface; real font /Encoding maps and
    hex CIDs are the documented out-of-scope tail (a triage-grade
    extractor, same posture as html_extract_text)."""
    lines = [bytearray()]
    pending: list[bytes] = []
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        if c == 0x28:  # literal string
            s, i = _pdf_string_at(data, i)
            pending.append(s)
        elif c == 0x25:  # comment to EOL
            while i < n and data[i] not in (10, 13):
                i += 1
        elif c == 0x3C and data[i + 1:i + 2] != b"<":  # hex string
            end = data.find(b">", i)
            if end < 0:
                raise ValueError("unterminated hex string")
            hx = re.sub(rb"\s", b"", data[i + 1:end])
            if len(hx) % 2:
                hx += b"0"
            pending.append(bytes.fromhex(hx.decode("ascii")))
            i = end + 1
        else:
            m = _CS_TOKEN.match(data, i)
            if not m:
                i += 1
                continue
            tok = m.group(0)
            i = m.end()
            if tok in (b"Td", b"TD", b"T*"):
                lines.append(bytearray())
            elif tok in (b"'", b'"') or tok.startswith((b"'", b'"')):
                lines.append(bytearray())
                for s in pending:
                    lines[-1] += s
                pending = []
            elif tok in (b"Tj", b"TJ"):
                for s in pending:
                    lines[-1] += s
                pending = []
            elif tok in (b"BT", b"ET"):
                pending = []
            # other operators (Tf, Tm, cm, re, ...) just consume
    text_lines = [
        ln.decode("latin-1") for ln in lines
    ]
    # drop leading/trailing empty lines from positioning-only ops
    while text_lines and not text_lines[0]:
        text_lines.pop(0)
    while text_lines and not text_lines[-1]:
        text_lines.pop()
    return "\n".join(text_lines)


def extract_pdf_text(payload: bytes) -> list[dict]:
    """Per-page text extraction — the document-pipeline payoff stage
    after triage: resolve the pages tree through the xref machinery
    (classic or 1.5+ streams), FlateDecode each page's /Contents
    (single ref or array), and lex the shown-text operators. Returns
    ``[{page_idx, text, n_chars}]``; pages without /Contents yield
    empty text. Encrypted documents raise ``ValueError`` (strings
    are never decrypted here — same contract as the title field)."""
    _version, _entries, trailer, _load = _resolve_xref(payload)
    if _dict_ref(trailer, rb"/Encrypt") is not None:
        raise ValueError(
            "encrypted PDF: content streams are never decrypted here"
        )
    root_ref = _dict_ref(trailer, rb"/Root")
    if root_ref is None:
        raise ValueError("trailer lacks /Root")
    catalog = _load(root_ref)
    pages_ref = _dict_ref(catalog, rb"/Pages")
    if pages_ref is None:
        raise ValueError("catalog has no /Pages")
    pages = _load(pages_ref)
    km = re.search(rb"/Kids\s*\[([^\]]*)\]", pages)
    if km is None:
        raise ValueError("pages tree has no /Kids")
    kid_refs = [
        int(x) for x in re.findall(rb"(\d+)\s+\d+\s+R", km.group(1))
    ]
    out = []
    for page_idx, ref in enumerate(kid_refs):
        page = _load(ref)
        cm = re.search(rb"/Contents\s*\[([^\]]*)\]", page)
        if cm is not None:
            crefs = [
                int(x)
                for x in re.findall(rb"(\d+)\s+\d+\s+R", cm.group(1))
            ]
        else:
            cref = _dict_ref(page, rb"/Contents")
            crefs = [cref] if cref is not None else []
        data = bytearray()
        for cr in crefs:
            ent = _entries.get(cr)
            if ent is None or ent[0] != "d":
                raise ValueError(
                    f"content stream {cr} missing or in an object "
                    "stream (stream objects cannot live there)"
                )
            d, raw = _obj_dict_and_stream(payload, ent[1])
            data += _decode_stream(d, raw)
            data += b"\n"  # streams concatenate with a separator
        text = _text_from_content(bytes(data))
        out.append(
            {"page_idx": page_idx, "text": text, "n_chars": len(text)}
        )
    return out


def _parms_int(parms: bytes, key: bytes, default: int) -> int:
    m = re.search(key + rb"\s+(-?\d+)", parms)
    return int(m.group(1)) if m else default


def extract_pdf_images(payload: bytes) -> list[dict]:
    """Per-page embedded-image extraction (r18) — the scanned-corpus
    payoff stage after text extraction: resolve each page's
    /Resources /XObject image through the xref machinery (classic or
    1.5+ streams) and DECODE it through the in-repo codec families —
    /DCTDecode via operators/jpeg.py (baseline / progressive /
    12-bit), /CCITTFaxDecode via operators/ccitt.py with the ISO
    32000 §7.4.6 /K convention (K<0 pure 2-D G4, K=0 pure 1-D, K>0
    mixed; /EncodedByteAlign honored; /BlackIs1 is parsed-and-
    ignored because T.4/T.6 runs carry the white/black semantics —
    the normalized output is always black=0/white=1), /FlateDecode
    raw gray/RGB rasters via stdlib zlib. Scanned-document corpora
    ship exactly these three. Returns ``[{page_idx, im_filter,
    width, height, channels, pixel_sum, n_pixels}]`` (pixel stats,
    the scalarized contract every codec query shares).
    ``NotImplementedError`` on JPXDecode/JBIG2Decode;
    ``ValueError`` on structural corruption."""
    import zlib

    import numpy as np

    _version, entries, trailer, _load = _resolve_xref(payload)
    if _dict_ref(trailer, rb"/Encrypt") is not None:
        raise ValueError(
            "encrypted PDF: image streams are never decrypted here"
        )
    root_ref = _dict_ref(trailer, rb"/Root")
    if root_ref is None:
        raise ValueError("trailer lacks /Root")
    pages_ref = _dict_ref(_load(root_ref), rb"/Pages")
    if pages_ref is None:
        raise ValueError("catalog has no /Pages")
    km = re.search(rb"/Kids\s*\[([^\]]*)\]", _load(pages_ref))
    if km is None:
        raise ValueError("pages tree has no /Kids")
    kid_refs = [
        int(x) for x in re.findall(rb"(\d+)\s+\d+\s+R", km.group(1))
    ]
    out = []
    for page_idx, ref in enumerate(kid_refs):
        page = _load(ref)
        rm = re.search(
            rb"/XObject\s*<<([^>]*(?:>(?!>)[^>]*)*)>>", page
        )
        if rm is None:
            continue
        for img_ref in re.findall(rb"(\d+)\s+\d+\s+R", rm.group(1)):
            ent = entries.get(int(img_ref))
            if ent is None or ent[0] != "d":
                raise ValueError(
                    f"image object {int(img_ref)} missing or in an "
                    "object stream (stream objects cannot live there)"
                )
            d, raw = _obj_dict_and_stream(payload, ent[1])
            if re.search(rb"/Subtype\s*/Image\b", d) is None:
                continue
            w = _dict_int(d, rb"/Width")
            h = _dict_int(d, rb"/Height")
            if w is None or h is None:
                raise ValueError("image XObject lacks /Width//Height")
            fm = re.search(rb"/Filter\s*/(\w+)", d)
            fname = fm.group(1).decode() if fm else "none"
            pm = re.search(
                rb"/DecodeParms\s*<<([^>]*(?:>(?!>)[^>]*)*)>>", d
            )
            parms = pm.group(1) if pm else b""
            if fname == "DCTDecode":
                from mongo2pq_spark.operators.jpeg import (
                    decode_jpeg_pixels,
                )

                jh, jw, jc, arr = decode_jpeg_pixels(raw)
                if (jh, jw) != (h, w):
                    raise ValueError(
                        f"JPEG is {jh}x{jw}, dict says {h}x{w}"
                    )
            elif fname == "CCITTFaxDecode":
                from mongo2pq_spark.operators.ccitt import (
                    ccitt_decode_k,
                )

                k = _parms_int(parms, rb"/K", 0)
                cols = _parms_int(parms, rb"/Columns", 1728)
                if cols != w:
                    raise ValueError(
                        f"/Columns {cols} differs from /Width {w}"
                    )
                align = (
                    re.search(
                        rb"/EncodedByteAlign\s+true", parms
                    )
                    is not None
                )
                packed = ccitt_decode_k(raw, w, h, k, byte_align=align)
                bits = np.unpackbits(
                    np.frombuffer(packed, dtype="uint8").reshape(
                        h, (w + 7) // 8
                    ),
                    axis=1,
                )[:, :w]
                arr = (1 - bits)[:, :, None]  # black=0/white=1
                jc = 1
            elif fname in ("FlateDecode", "none"):
                plain = zlib.decompress(raw) if fname != "none" else raw
                jc = (
                    3
                    if re.search(rb"/DeviceRGB\b", d) is not None
                    else 1
                )
                if len(plain) != h * w * jc:
                    raise ValueError(
                        f"raster is {len(plain)}B for {h}x{w}x{jc}"
                    )
                arr = np.frombuffer(plain, dtype="uint8").reshape(
                    h, w, jc
                )
            else:
                raise NotImplementedError(
                    f"image filter {fname} (DCTDecode/CCITTFaxDecode/"
                    "FlateDecode decode here; JPX/JBIG2 are the "
                    "library-bound tails)"
                )
            out.append(
                {
                    "page_idx": page_idx,
                    "im_filter": fname,
                    "width": int(w),
                    "height": int(h),
                    "channels": int(jc),
                    "pixel_sum": int(
                        np.asarray(arr, dtype=np.int64).sum()
                    ),
                    "n_pixels": int(h * w * jc),
                }
            )
    return out


PDF_IMAGE_SCHEMA = (
    "doc_id bigint, page_idx int, im_filter string, width int, "
    "height int, channels int, pixel_sum bigint, n_pixels bigint"
)


def pdf_image_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched embedded-image extraction over a payload column
    — map-only, the same scale shape as every codec family."""
    from mongo2pq_spark.deploy import ensure_shipped

    ensure_shipped(df.sparkSession)

    def parse_batches(batches):
        import pandas as pd

        for pdf_batch in batches:
            rows = []
            for doc_id, payload in zip(
                pdf_batch[id_col], pdf_batch[payload_col]
            ):
                for rec in extract_pdf_images(bytes(payload)):
                    rec["doc_id"] = doc_id
                    rows.append(rec)
            yield pd.DataFrame(rows)

    return df.mapInPandas(parse_batches, PDF_IMAGE_SCHEMA)


PDF_TEXT_SCHEMA = (
    "doc_id bigint, page_idx int, n_chars int, text string"
)


def pdf_page_texts(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched per-page PDF text extraction: one input file row
    → one output row per page. Map-only, cost ∝ total payload bytes —
    the WARC-explode scale shape."""
    from mongo2pq_spark.deploy import ensure_shipped

    ensure_shipped(df.sparkSession)

    def parse_batches(batches):
        import pandas as pd

        for pdf_batch in batches:
            rows = []
            for doc_id, payload in zip(
                pdf_batch[id_col], pdf_batch[payload_col]
            ):
                for page in extract_pdf_text(bytes(payload)):
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "page_idx": page["page_idx"],
                            "n_chars": page["n_chars"],
                            "text": page["text"],
                        }
                    )
            yield pd.DataFrame(rows)

    return df.mapInPandas(parse_batches, PDF_TEXT_SCHEMA)


PDF_META_SCHEMA = (
    "doc_id bigint, version string, n_objects int, n_pages int, "
    "encrypted boolean, title string"
)


def pdf_metadata(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched PDF triage: page counts / encryption routing /
    object inventory for every file, no rendering. Map-only, cost ∝
    total payload bytes — the MP4-metadata scale shape."""
    from mongo2pq_spark.deploy import ensure_shipped

    ensure_shipped(df.sparkSession)

    def parse_batches(batches):
        import pandas as pd

        for pdf_batch in batches:
            rows = []
            for doc_id, payload in zip(
                pdf_batch[id_col], pdf_batch[payload_col]
            ):
                m = parse_pdf_metadata(bytes(payload))
                m["doc_id"] = doc_id
                rows.append(m)
            yield pd.DataFrame(rows)

    return df.mapInPandas(parse_batches, PDF_META_SCHEMA)
