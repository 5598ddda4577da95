"""PDF (ISO 32000) metadata triage in pure stdlib — the
document-modality sibling of the MP4 box walk and MP3 frame walk:
version, object count, page count, encryption flag, and the Info
title, extracted by a REAL cross-reference-table walk with no
rendering library. This is the filter stage a document pipeline runs
on 100 % of a PDF corpus (page-count windows, encrypted-document
routing, scanned-vs-digital triage) before any text extraction.

Scope: classic cross-reference TABLES (the `xref` keyword), the
format every pre-1.5 writer and most modern writers still emit.
PDF 1.5+ cross-reference STREAMS (compressed xref) raise
``NotImplementedError`` — decoding them needs the object-stream /
FlateDecode machinery that is the documented library swap, exactly
like the lossy-audio/video-frame decoders. Corrupt structure raises
``ValueError``. Encrypted documents are REPORTED (``encrypted=True``)
but their strings are never decrypted — so ``title`` is None there.

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


def parse_pdf_metadata(payload: bytes) -> dict:
    """Parse ``{version, n_objects, n_pages, encrypted, title}`` via
    the cross-reference table. See module docstring for scope."""
    m = re.match(rb"%PDF-(\d+\.\d+)", payload[:16])
    if not m:
        raise ValueError("not a PDF (no %PDF header)")
    version = m.group(1).decode()
    tail = payload[-256:]
    sm = re.search(rb"startxref\s+(\d+)\s+%%EOF", tail)
    if not sm:
        raise ValueError("no startxref/%%EOF trailer")
    xref_at = int(sm.group(1))
    if payload[xref_at:xref_at + 4] != b"xref":
        if _OBJ_RE.match(payload[xref_at:xref_at + 64]):
            raise NotImplementedError(
                "cross-reference STREAM (PDF 1.5+) not implemented — "
                "classic xref tables only; the stream decoder is the "
                "documented library swap"
            )
        raise ValueError(f"startxref {xref_at} does not point at xref")
    pos = xref_at + 4
    offsets: dict[int, int] = {}
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
                offsets[first + k] = int(off)
            pos += 20
        if payload[pos:pos + 7].lstrip().startswith(b"trailer"):
            break
    tm = re.search(rb"trailer\s*<<", payload[pos:])
    if not tm:
        raise ValueError("xref has no trailer")
    tstart = pos + tm.end() - 2
    tend = payload.find(b">>", tstart)
    # nested dicts don't occur in our trailer scope; balance anyway
    depth, i = 0, tstart
    while i < len(payload) - 1:
        if payload[i:i + 2] == b"<<":
            depth += 1
            i += 2
        elif payload[i:i + 2] == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                tend = i
                break
        else:
            i += 1
    trailer = payload[tstart:tend]
    size = re.search(rb"/Size\s+(\d+)", trailer)
    root_ref = _dict_ref(trailer, rb"/Root")
    if size is None or root_ref is None:
        raise ValueError("trailer lacks /Size or /Root")
    encrypted = _dict_ref(trailer, rb"/Encrypt") is not None

    def _offset(ref: int) -> int:
        if ref not in offsets:
            raise ValueError(f"xref has no entry for object {ref}")
        return offsets[ref]

    catalog = _read_obj(payload, _offset(root_ref))
    pages_ref = _dict_ref(catalog, rb"/Pages")
    if pages_ref is None:
        raise ValueError("catalog has no /Pages")
    pages = _read_obj(payload, _offset(pages_ref))
    cm = re.search(rb"/Count\s+(\d+)", pages)
    if not cm:
        raise ValueError("pages tree has no /Count")

    title = None
    if not encrypted:
        info_ref = _dict_ref(trailer, rb"/Info")
        if info_ref is not None:
            info = _read_obj(payload, _offset(info_ref))
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
