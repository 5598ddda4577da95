"""WARC (ISO 28500) container parsing in pure stdlib — the container
CommonCrawl actually ships, completing the web-ingestion chain:
WARC record walk → HTTP response split → HTML body →
``html_extract_text``. Like the MP4/MP3/PDF walks, this is the
triage/extraction stage a crawl pipeline runs on 100 % of its corpus.

Record framing is walked by ``Content-Length`` — never by scanning
for the next ``WARC/`` magic, because response BODIES legally contain
that byte sequence (a crawled page ABOUT the WARC format). The
embedded-magic unit test pins this.

Scope: WARC/1.0 and 1.1 records with plain (identity) payloads; the
HTTP split handles identity bodies. ``Transfer-Encoding: chunked``
and compressed HTTP bodies raise ``NotImplementedError`` (the
dechunk/inflate step is the library swap); structural corruption —
bad magic, missing Content-Length, truncated payload, broken record
separator — raises ``ValueError``. Whole-file .warc.gz is handled
OUTSIDE this parser by the ingestion layer (gzip is a transparent
codec there), so the parser sees plain bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_CRLF = b"\r\n"


def build_warc_stub(records: list[dict]) -> bytes:
    """Fixture writer: each record dict has ``warc_type``, ``uri``,
    ``date``, and for responses ``status``, ``content_type`` and
    ``body`` (bytes). Produces byte-exact Content-Length framing."""
    out = bytearray()
    for i, r in enumerate(records):
        if r["warc_type"] == "response":
            http = (
                f"HTTP/1.1 {r['status']} OK\r\n"
                f"Content-Type: {r['content_type']}\r\n\r\n"
            ).encode() + r["body"]
            payload = http
            ctype = 'application/http; msgtype=response'
        else:
            payload = r.get("body", b"")
            ctype = r.get("content_type", "application/warc-fields")
        hdr = (
            "WARC/1.0\r\n"
            f"WARC-Type: {r['warc_type']}\r\n"
            f"WARC-Target-URI: {r['uri']}\r\n"
            f"WARC-Date: {r['date']}\r\n"
            f"WARC-Record-ID: <urn:uuid:rec-{i}>\r\n"
            f"Content-Type: {ctype}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode()
        out += hdr + payload + _CRLF + _CRLF
    return bytes(out)


def parse_warc_records(payload: bytes) -> list[dict]:
    """Walk a WARC file's records via Content-Length framing. Returns
    one dict per record: ``{rec_idx, warc_type, target_uri, warc_date,
    content_length, http_status, http_content_type, body}`` — the
    http_* fields and the split body only for response records (the
    raw payload is the body for every other type)."""
    records = []
    pos = 0
    end = len(payload)
    idx = 0
    while pos < end:
        if not payload[pos:pos + 5] == b"WARC/":
            raise ValueError(f"no WARC magic at byte {pos}")
        hdr_end = payload.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            raise ValueError(f"record at {pos} has no header terminator")
        headers: dict[str, str] = {}
        lines = payload[pos:hdr_end].split(_CRLF)
        version = lines[0].decode("latin-1")
        if version not in ("WARC/1.0", "WARC/1.1"):
            raise NotImplementedError(
                f"unsupported WARC version {version!r}"
            )
        for line in lines[1:]:
            k, _, v = line.partition(b":")
            headers[k.decode("latin-1").strip().lower()] = (
                v.decode("latin-1").strip()
            )
        if "content-length" not in headers:
            raise ValueError(f"record at {pos} lacks Content-Length")
        clen = int(headers["content-length"])
        body_start = hdr_end + 4
        body_end = body_start + clen
        if body_end + 4 > end:
            raise ValueError(f"record at {pos} truncated")
        if payload[body_end:body_end + 4] != _CRLF + _CRLF:
            raise ValueError(
                f"record at {pos} missing the CRLFCRLF separator"
            )
        raw = payload[body_start:body_end]
        rec = {
            "rec_idx": idx,
            "warc_type": headers.get("warc-type", ""),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_length": clen,
            "http_status": None,
            "http_content_type": None,
            "body": raw,
        }
        if rec["warc_type"] == "response" and raw[:5] == b"HTTP/":
            split = raw.find(_CRLF + _CRLF)
            if split < 0:
                raise ValueError(
                    f"response record at {pos} has no HTTP header end"
                )
            http_lines = raw[:split].split(_CRLF)
            status_parts = http_lines[0].split()
            if len(status_parts) < 2 or not status_parts[1].isdigit():
                raise ValueError(
                    f"response record at {pos} has a bad status line"
                )
            hh = {}
            for line in http_lines[1:]:
                k, _, v = line.partition(b":")
                hh[k.decode("latin-1").strip().lower()] = (
                    v.decode("latin-1").strip()
                )
            if "chunked" in hh.get("transfer-encoding", "").lower():
                raise NotImplementedError(
                    "chunked HTTP transfer encoding not implemented "
                    "(the dechunk step is the library swap)"
                )
            if hh.get("content-encoding", "identity").lower() not in (
                "identity", ""
            ):
                raise NotImplementedError(
                    "compressed HTTP bodies not implemented "
                    "(the inflate step is the library swap)"
                )
            rec["http_status"] = int(status_parts[1])
            rec["http_content_type"] = hh.get("content-type")
            rec["body"] = raw[split + 4:]
        records.append(rec)
        pos = body_end + 4
        idx += 1
    return records


WARC_SCHEMA = (
    "doc_id bigint, rec_idx int, warc_type string, target_uri string, "
    "warc_date string, content_length bigint, http_status int, "
    "http_content_type string, body binary"
)


def warc_records(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched WARC explode: one input file row → one output row
    per record. Map-only; at corpus scale parallelism comes from the
    file sharding CommonCrawl already provides (~1 GB segments, one
    task each — the same posture as the gzip-JSONL note)."""
    from mongo2pq_spark.deploy import ensure_shipped

    ensure_shipped(df.sparkSession)

    def parse_batches(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                for rec in parse_warc_records(bytes(payload)):
                    rec["doc_id"] = doc_id
                    rows.append(rec)
            yield pd.DataFrame(rows)

    return df.mapInPandas(parse_batches, WARC_SCHEMA)
