"""MP4 / ISO-BMFF container metadata parsing in pure stdlib — the
REAL half of the video modality's pipeline posture.

A video pipeline's cheap, universal stage — filter by duration,
resolution, track layout BEFORE paying for any frame decode — needs
only the container's box tree, no codec. This module implements that
stage for ISO-BMFF (MP4/MOV/3GP): a generic length-prefixed box walk
(64-bit ``largesize`` supported) extracting the ``ftyp`` brand,
``mvhd`` timescale/duration (versions 0 and 1), track count, handler
types, and the video track's ``tkhd`` 16.16 fixed-point dimensions.
FRAME decode stays a documented stub (H.264/AV1/HEVC decoders are
codec libraries absent from this container) — the same split as
images before round 9: header/metadata REAL, pixel decode stubbed,
with ``parse_image_dimensions`` as the precedent.

``build_mp4_stub`` writes a minimal-but-well-formed
ftyp+moov(mvhd+trak(tkhd+mdia(hdlr))) tree so fixtures and oracles
can round-trip through the parser; the parser itself walks ANY
conforming box tree, so real camera/encoder output parses too.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _expand_stsc_runs(
    runs: list[tuple[int, int]], n_samples: int
) -> list[int]:
    """Expand stsc (first_chunk, samples_per_chunk) runs into a
    per-chunk sample-count list covering exactly ``n_samples``.
    ValueError when the runs cannot tile the sample count — the same
    consistency rule the parser enforces."""
    if not runs or runs[0][0] != 1:
        raise ValueError("stsc runs must start at chunk 1")
    firsts = [fc for fc, _ in runs]
    if firsts != sorted(firsts) or len(set(firsts)) != len(firsts):
        raise ValueError("stsc first_chunk values must strictly increase")
    counts: list[int] = []
    remaining = n_samples
    for i, (fc, spc) in enumerate(runs):
        if spc <= 0:
            raise ValueError("samples_per_chunk must be positive")
        if i + 1 < len(runs):
            n_chunks = runs[i + 1][0] - fc
            need = n_chunks * spc
            if need > remaining:
                raise ValueError("stsc runs overrun the sample count")
            counts.extend([spc] * n_chunks)
            remaining -= need
        else:
            if remaining % spc:
                raise ValueError(
                    "trailing samples do not fill whole chunks"
                )
            counts.extend([spc] * (remaining // spc))
            remaining = 0
    return counts


def build_mp4_stub(
    duration_ms: int,
    width: int,
    height: int,
    n_audio_tracks: int = 0,
    timescale: int = 1000,
    brand: bytes = b"isom",
    sample_sizes: list[int] | None = None,
    sample_delta: int = 512,
    keyframe_every: int = 8,
    stsc_runs: list[tuple[int, int]] | None = None,
    chunk_gap: int = 8,
) -> bytes:
    """Minimal well-formed ISO-BMFF tree: ftyp + moov(mvhd + one video
    trak + ``n_audio_tracks`` audio traks). Durations are expressed in
    ``timescale`` units (default 1000 → milliseconds).

    With ``sample_sizes``, the video trak gains real sample tables
    (mdia/minf/stbl): one-entry ``stts`` (every sample lasts
    ``sample_delta`` units), a variable-size ``stsz`` listing
    ``sample_sizes`` verbatim, and an ``stss`` marking samples
    1, 1+k, 1+2k, … (1-based, k = ``keyframe_every``) as sync
    samples.

    With ``stsc_runs`` (``[(first_chunk, samples_per_chunk), …]``,
    1-based, first entry must start at chunk 1), the file additionally
    gains a real chunk layout: an ``stsc`` with exactly those runs, an
    ``stco`` of absolute file offsets, and an ``mdat`` whose chunks are
    laid out in order with ``chunk_gap`` dead bytes before every chunk
    after the first — so sample byte ranges are only recoverable by
    actually walking stsc+stco (a flat prefix-sum over stsz would land
    mid-gap). Sample payload bytes are a deterministic fill; only their
    SIZES carry information."""
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0x200) + brand)
    duration = duration_ms * timescale // 1000
    chunk_sizes: list[int] = []
    if stsc_runs is not None:
        if sample_sizes is None:
            raise ValueError("stsc_runs requires sample_sizes")
        chunk_sizes = _expand_stsc_runs(stsc_runs, len(sample_sizes))
    mvhd = _box(
        b"mvhd",
        struct.pack(">B3x", 0)  # version 0
        + struct.pack(">IIII", 0, 0, timescale, duration)
        + b"\x00" * 80,  # rate/volume/matrix/predefined/next_track_id
    )

    def trak(
        track_id: int,
        handler: bytes,
        w: int,
        h: int,
        stco_offsets: list[int] | None = None,
    ) -> bytes:
        tkhd = _box(
            b"tkhd",
            struct.pack(">B3x", 0)
            + struct.pack(">IIIxxxxI", 0, 0, track_id, duration)
            + b"\x00" * 52  # reserved/layer/group/volume/matrix
            + struct.pack(">II", w << 16, h << 16),
        )
        hdlr = _box(
            b"hdlr", struct.pack(">I", 0) + b"\x00" * 4 + handler + b"\x00" * 13
        )
        mdia = hdlr
        if handler == b"vide" and sample_sizes is not None:
            n = len(sample_sizes)
            stts = _box(
                b"stts",
                struct.pack(">I", 0)  # version/flags
                + struct.pack(">III", 1, n, sample_delta),
            )
            stsz = _box(
                b"stsz",
                struct.pack(">I", 0)
                + struct.pack(">II", 0, n)  # variable sizes
                + b"".join(struct.pack(">I", s) for s in sample_sizes),
            )
            syncs = list(range(1, n + 1, keyframe_every))
            stss = _box(
                b"stss",
                struct.pack(">I", 0)
                + struct.pack(">I", len(syncs))
                + b"".join(struct.pack(">I", s) for s in syncs),
            )
            stbl = stts + stsz + stss
            if stco_offsets is not None:
                stsc = _box(
                    b"stsc",
                    struct.pack(">I", 0)
                    + struct.pack(">I", len(stsc_runs))
                    + b"".join(
                        struct.pack(">III", fc, spc, 1)
                        for fc, spc in stsc_runs
                    ),
                )
                stco = _box(
                    b"stco",
                    struct.pack(">I", 0)
                    + struct.pack(">I", len(stco_offsets))
                    + b"".join(
                        struct.pack(">I", o) for o in stco_offsets
                    ),
                )
                stbl += stsc + stco
            mdia += _box(b"minf", _box(b"stbl", stbl))
        return _box(b"trak", tkhd + _box(b"mdia", mdia))

    def assemble(stco_offsets: list[int] | None) -> bytes:
        traks = trak(1, b"vide", width, height, stco_offsets)
        for i in range(n_audio_tracks):
            traks += trak(2 + i, b"soun", 0, 0)
        return ftyp + _box(b"moov", mvhd + traks)

    if stsc_runs is None:
        return assemble(None)
    # two-pass: moov size is independent of the OFFSET VALUES (stco is
    # fixed-width), so assemble once with zeros to learn where mdat's
    # data starts, then re-assemble with the real chunk offsets
    header_len = len(assemble([0] * len(chunk_sizes)))
    mdat_data_start = header_len + 8
    offsets, rel, s = [], 0, 0
    for c, n_in_chunk in enumerate(chunk_sizes):
        if c:
            rel += chunk_gap
        offsets.append(mdat_data_start + rel)
        rel += sum(sample_sizes[s:s + n_in_chunk])
        s += n_in_chunk
    # deterministic non-zero fill, period-256 pattern (37 is odd so the
    # LCG cycles all 256 values) — content is never read back, only
    # sample SIZES carry information
    pattern = bytes((i * 37 + 11) & 0xFF for i in range(256))
    mdat_payload = (pattern * (rel // 256 + 1))[:rel]
    return assemble(offsets) + _box(b"mdat", mdat_payload)


def _walk_boxes(data: bytes, pos: int, end: int):
    """Yield (type, payload_start, payload_end) for each box in
    data[pos:end]; raises ValueError on malformed sizes."""
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos:pos + 4])
        btype = data[pos + 4:pos + 8]
        header = 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("truncated largesize box header")
            (size,) = struct.unpack(">Q", data[pos + 8:pos + 16])
            header = 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < header or pos + size > end:
            raise ValueError(f"malformed box size {size} for {btype!r}")
        yield btype, pos + header, pos + size
        pos += size


#: minimum payload bytes of each sample-table box BEFORE its variable
#: table: version/flags + entry count (stsz adds the fixed-size field).
#: Boxes not listed are skipped, whatever their size — an empty `free`
#: in stbl is valid padding, not corruption.
_STBL_HEADER_BYTES = {
    b"stts": 8,
    b"stsz": 12,
    b"stss": 8,
    b"stsc": 8,
    b"stco": 8,
    b"co64": 8,
}


def parse_mp4_metadata(payload: bytes) -> dict:
    """Parse an ISO-BMFF payload's metadata: ``{brand, timescale,
    duration_ms, n_tracks, n_video_tracks, n_audio_tracks,
    video_width, video_height}`` (dims from the first video track;
    None when absent). ``ValueError`` on non-BMFF or malformed
    payloads — this parser never needs a codec, so there is no
    NotImplementedError envelope here."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload (no leading ftyp)")
    meta = {
        "brand": payload[8:12].decode("latin-1"),
        "timescale": None,
        "duration_ms": None,
        "n_tracks": 0,
        "n_video_tracks": 0,
        "n_audio_tracks": 0,
        "video_width": None,
        "video_height": None,
    }
    for btype, start, end in _walk_boxes(payload, 0, len(payload)):
        if btype != b"moov":
            continue
        for mtype, mstart, mend in _walk_boxes(payload, start, end):
            if mtype == b"mvhd":
                version = payload[mstart]
                if version == 1:
                    ts, dur = struct.unpack(
                        ">IQ", payload[mstart + 20:mstart + 32]
                    )
                else:
                    ts, dur = struct.unpack(
                        ">II", payload[mstart + 12:mstart + 20]
                    )
                meta["timescale"] = ts
                meta["duration_ms"] = dur * 1000 // ts if ts else None
            elif mtype == b"trak":
                meta["n_tracks"] += 1
                width = height = None
                handler = None
                for ttype, tstart, tend in _walk_boxes(payload, mstart, mend):
                    if ttype == b"tkhd":
                        # v0 tkhd payload is 84 bytes, v1 is 96; a
                        # shorter box would make the from-the-end read
                        # below reach back into sibling bytes and
                        # decode garbage dimensions — fail loud instead
                        if tend - tstart < 84:
                            raise ValueError(
                                f"tkhd box too short ({tend - tstart} bytes)"
                            )
                        # width/height are the LAST 8 bytes, 16.16
                        # fixed point, at the same offset-from-end in
                        # both tkhd versions
                        w_fp, h_fp = struct.unpack(
                            ">II", payload[tend - 8:tend]
                        )
                        width, height = w_fp >> 16, h_fp >> 16
                    elif ttype == b"mdia":
                        for dtype, dstart, dend in _walk_boxes(
                            payload, tstart, tend
                        ):
                            if dtype == b"hdlr":
                                if dend - dstart < 12:
                                    raise ValueError(
                                        f"hdlr box too short "
                                        f"({dend - dstart} bytes)"
                                    )
                                handler = payload[dstart + 8:dstart + 12]
                if handler == b"vide":
                    meta["n_video_tracks"] += 1
                    if meta["video_width"] is None:
                        meta["video_width"] = width
                        meta["video_height"] = height
                elif handler == b"soun":
                    meta["n_audio_tracks"] += 1
    if meta["timescale"] is None:
        raise ValueError("ISO-BMFF payload has no moov/mvhd")
    return meta


MP4_META_SCHEMA = (
    "doc_id bigint, brand string, duration_ms bigint, n_tracks int, "
    "n_video_tracks int, n_audio_tracks int, video_width int, "
    "video_height int"
)


def mp4_metadata(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched REAL container-metadata extraction over MP4
    payloads — the stage that filters a video corpus by duration /
    resolution / track layout before any (stubbed) frame decode.
    Map-only, cost ∝ total payload bytes."""
    from mongo2pq_spark.deploy import ensure_shipped

    ensure_shipped(df.sparkSession)

    def parse_batches(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                m = parse_mp4_metadata(bytes(payload))
                rows.append(
                    {
                        "doc_id": doc_id,
                        "brand": m["brand"],
                        "duration_ms": m["duration_ms"],
                        "n_tracks": m["n_tracks"],
                        "n_video_tracks": m["n_video_tracks"],
                        "n_audio_tracks": m["n_audio_tracks"],
                        "video_width": m["video_width"],
                        "video_height": m["video_height"],
                    }
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(parse_batches, MP4_META_SCHEMA)


def parse_mp4_sample_stats(payload: bytes) -> dict:
    """Parse the FIRST video track's sample tables (mdia/minf/stbl):
    ``{n_samples, total_sample_bytes, n_keyframes, duration_units}``.

    This is the pre-decode stage below ``parse_mp4_metadata``: sample
    counts and byte totals (stsz), per-sample timing (stts), and sync-
    sample density (stss) answer bitrate / fps / keyframe-interval
    triage questions for 100 % of a video corpus with zero codec work.
    Per ISO-BMFF, an ABSENT stss means every sample is a sync sample.
    ``ValueError`` on payloads without a video stbl or with malformed
    tables — triage over a real corpus wraps this in the same typed
    fail-loud envelope as every codec path."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload (no leading ftyp)")

    def u32s(base: int, count: int, box_end: int) -> list[int]:
        end = base + 4 * count
        if end > box_end:
            # bound by the ENCLOSING box, not the payload: a lying
            # entry count must not silently read the next box's bytes
            # as table entries
            raise ValueError("sample table truncated")
        return list(
            struct.unpack(f">{count}I", payload[base:end])
        ) if count else []

    for btype, start, end in _walk_boxes(payload, 0, len(payload)):
        if btype != b"moov":
            continue
        for mtype, mstart, mend in _walk_boxes(payload, start, end):
            if mtype != b"trak":
                continue
            handler = None
            stbl_span = None
            for ttype, tstart, tend in _walk_boxes(payload, mstart, mend):
                if ttype != b"mdia":
                    continue
                for dtype, dstart, dend in _walk_boxes(
                    payload, tstart, tend
                ):
                    if dtype == b"hdlr":
                        if dend - dstart < 12:
                            raise ValueError("hdlr box too short")
                        handler = payload[dstart + 8:dstart + 12]
                    elif dtype == b"minf":
                        for ntype, nstart, nend in _walk_boxes(
                            payload, dstart, dend
                        ):
                            if ntype == b"stbl":
                                stbl_span = (nstart, nend)
            if handler != b"vide" or stbl_span is None:
                continue
            n_samples = total_bytes = duration_units = None
            n_keyframes = None
            for stype, sstart, send in _walk_boxes(payload, *stbl_span):
                # bound the fixed HEADER reads by the box itself, and
                # only for the table boxes parsed here — a benign
                # short box (an empty `free`) must pass through, and a
                # truncated table header must never read the next
                # box's bytes as its fields
                need = _STBL_HEADER_BYTES.get(stype)
                if need is not None and send - sstart < need:
                    raise ValueError(f"{stype!r} box too short")
                if stype == b"stts":
                    (n_entries,) = struct.unpack(
                        ">I", payload[sstart + 4:sstart + 8]
                    )
                    flat = u32s(sstart + 8, 2 * n_entries, send)
                    n_stts = sum(flat[0::2])
                    duration_units = sum(
                        c * d for c, d in zip(flat[0::2], flat[1::2])
                    )
                    if n_samples is None:
                        n_samples = n_stts
                    elif n_samples != n_stts:
                        raise ValueError("stts/stsz sample-count mismatch")
                elif stype == b"stsz":
                    fixed, count = struct.unpack(
                        ">II", payload[sstart + 4:sstart + 12]
                    )
                    if fixed:
                        total_bytes = fixed * count
                    else:
                        total_bytes = sum(u32s(sstart + 12, count, send))
                    if n_samples is None:
                        n_samples = count
                    elif n_samples != count:
                        raise ValueError("stts/stsz sample-count mismatch")
                elif stype == b"stss":
                    (n_keyframes,) = struct.unpack(
                        ">I", payload[sstart + 4:sstart + 8]
                    )
            if n_samples is None or total_bytes is None:
                raise ValueError("video stbl missing stts/stsz")
            return {
                "n_samples": n_samples,
                "total_sample_bytes": total_bytes,
                # absent stss ⇒ every sample is sync (ISO 14496-12)
                "n_keyframes": (
                    n_samples if n_keyframes is None else n_keyframes
                ),
                "duration_units": duration_units,
            }
    raise ValueError("no video track with sample tables")


MP4_SAMPLE_SCHEMA = (
    "doc_id bigint, n_samples bigint, total_sample_bytes bigint, "
    "n_keyframes bigint, duration_units bigint, keyframe_ratio double"
)


def mp4_sample_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched REAL sample-table extraction over MP4 payloads —
    bitrate / fps / keyframe-density triage for a video corpus with
    zero codec work. Map-only, cost ∝ total payload bytes."""
    from mongo2pq_spark.deploy import ensure_shipped

    ensure_shipped(df.sparkSession)

    def parse_batches(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                m = parse_mp4_sample_stats(bytes(payload))
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_samples": m["n_samples"],
                        "total_sample_bytes": m["total_sample_bytes"],
                        "n_keyframes": m["n_keyframes"],
                        "duration_units": m["duration_units"],
                        "keyframe_ratio": round(
                            m["n_keyframes"] / m["n_samples"], 6
                        )
                        if m["n_samples"]
                        else 0.0,
                    }
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(parse_batches, MP4_SAMPLE_SCHEMA)


def parse_mp4_sample_ranges(payload: bytes) -> list[dict]:
    """Resolve every sample of the FIRST video track to its byte range:
    ``[{sample_idx (1-based), n_bytes, rel_offset, is_sync}, …]`` with
    ``rel_offset`` relative to the start of the ``mdat`` payload.

    This is the read PLAN a frame extractor executes — the step between
    sample-table triage (``parse_mp4_sample_stats``) and the (stubbed)
    codec: walk the ``stsc`` chunk runs against the ``stco``/``co64``
    chunk offsets, accumulate ``stsz`` sizes within each chunk, and
    mark sync samples from ``stss`` (absent ⇒ every sample is sync,
    ISO 14496-12). With these ranges a pipeline slices exactly the
    keyframe bytes out of a 100 TB corpus without touching the rest.

    Offsets are validated to land inside ``mdat``; sample-count
    mismatches between stsz and the stsc×stco expansion, truncated
    tables, or a missing chunk layout all raise ``ValueError`` — the
    typed fail-loud envelope of every codec-adjacent path."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload (no leading ftyp)")

    mdat_span = None
    moov_span = None
    for btype, start, end in _walk_boxes(payload, 0, len(payload)):
        if btype == b"mdat" and mdat_span is None:
            mdat_span = (start, end)
        elif btype == b"moov":
            moov_span = (start, end)
    if moov_span is None:
        raise ValueError("ISO-BMFF payload has no moov")

    def u32s(base: int, count: int, box_end: int) -> list[int]:
        end = base + 4 * count
        if end > box_end:
            raise ValueError("sample table truncated")
        return list(
            struct.unpack(f">{count}I", payload[base:end])
        ) if count else []

    for mtype, mstart, mend in _walk_boxes(payload, *moov_span):
        if mtype != b"trak":
            continue
        handler = None
        stbl_span = None
        for ttype, tstart, tend in _walk_boxes(payload, mstart, mend):
            if ttype != b"mdia":
                continue
            for dtype, dstart, dend in _walk_boxes(payload, tstart, tend):
                if dtype == b"hdlr":
                    if dend - dstart < 12:
                        raise ValueError("hdlr box too short")
                    handler = payload[dstart + 8:dstart + 12]
                elif dtype == b"minf":
                    for ntype, nstart, nend in _walk_boxes(
                        payload, dstart, dend
                    ):
                        if ntype == b"stbl":
                            stbl_span = (nstart, nend)
        if handler != b"vide" or stbl_span is None:
            continue

        sizes: list[int] | None = None
        stsc: list[tuple[int, int]] | None = None
        chunk_offsets: list[int] | None = None
        syncs: set[int] | None = None
        for stype, sstart, send in _walk_boxes(payload, *stbl_span):
            # same per-type header bounding as parse_mp4_sample_stats:
            # short UNKNOWN boxes pass, short TABLE boxes fail loud
            need = _STBL_HEADER_BYTES.get(stype)
            if need is not None and send - sstart < need:
                raise ValueError(f"{stype!r} box too short")
            if stype == b"stsz":
                fixed, count = struct.unpack(
                    ">II", payload[sstart + 4:sstart + 12]
                )
                sizes = (
                    [fixed] * count
                    if fixed
                    else u32s(sstart + 12, count, send)
                )
            elif stype == b"stsc":
                (n_entries,) = struct.unpack(
                    ">I", payload[sstart + 4:sstart + 8]
                )
                flat = u32s(sstart + 8, 3 * n_entries, send)
                stsc = list(zip(flat[0::3], flat[1::3]))
            elif stype == b"stco":
                (n_chunks,) = struct.unpack(
                    ">I", payload[sstart + 4:sstart + 8]
                )
                chunk_offsets = u32s(sstart + 8, n_chunks, send)
            elif stype == b"co64":
                (n_chunks,) = struct.unpack(
                    ">I", payload[sstart + 4:sstart + 8]
                )
                end = sstart + 8 + 8 * n_chunks
                if end > send:
                    raise ValueError("sample table truncated")
                chunk_offsets = list(
                    struct.unpack(
                        f">{n_chunks}Q", payload[sstart + 8:end]
                    )
                ) if n_chunks else []
            elif stype == b"stss":
                (n_syncs,) = struct.unpack(
                    ">I", payload[sstart + 4:sstart + 8]
                )
                syncs = set(u32s(sstart + 8, n_syncs, send))

        if sizes is None:
            raise ValueError("video stbl missing stsz")
        if stsc is None or chunk_offsets is None:
            raise ValueError("video stbl has no chunk layout (stsc+stco)")
        if not stsc or stsc[0][0] != 1:
            raise ValueError("stsc runs must start at chunk 1")

        # expand stsc runs against the stco chunk count
        per_chunk: list[int] = []
        for i, (fc, spc) in enumerate(stsc):
            last = (
                stsc[i + 1][0] - 1
                if i + 1 < len(stsc)
                else len(chunk_offsets)
            )
            if fc > last:
                raise ValueError("stsc first_chunk beyond chunk count")
            per_chunk.extend([spc] * (last - fc + 1))
        if sum(per_chunk) != len(sizes):
            raise ValueError("stsc×stco expansion does not match stsz")

        # only once the tables are consistent does resolving ranges
        # require the media data itself
        if mdat_span is None:
            raise ValueError("ISO-BMFF payload has no mdat")
        mstart_data, mend_data = mdat_span
        out: list[dict] = []
        idx = 0
        for chunk_off, n_in_chunk in zip(chunk_offsets, per_chunk):
            intra = 0
            for _ in range(n_in_chunk):
                idx += 1
                size = sizes[idx - 1]
                abs_off = chunk_off + intra
                if abs_off < mstart_data or abs_off + size > mend_data:
                    raise ValueError(
                        f"sample {idx} byte range escapes mdat"
                    )
                out.append(
                    {
                        "sample_idx": idx,
                        "n_bytes": size,
                        "rel_offset": abs_off - mstart_data,
                        "is_sync": syncs is None or idx in syncs,
                    }
                )
                intra += size
        return out
    raise ValueError("no video track with sample tables")


MP4_RANGE_SCHEMA = (
    "doc_id bigint, sample_idx bigint, n_bytes bigint, rel_offset bigint"
)


def mp4_keyframe_ranges(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched keyframe read-plan extraction: one row per SYNC
    sample with its exact byte range inside ``mdat`` — what a
    keyframe-thumbnail / scene-sample stage feeds to its (stubbed)
    frame decoder, computed for 100 % of a corpus with zero codec
    work. Map-only, cost ∝ total payload bytes; output rows ∝
    keyframes, a ~k-fold reduction before any pixel work."""
    from mongo2pq_spark.deploy import ensure_shipped

    ensure_shipped(df.sparkSession)

    def parse_batches(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                for s in parse_mp4_sample_ranges(bytes(payload)):
                    if s["is_sync"]:
                        rows.append(
                            {
                                "doc_id": doc_id,
                                "sample_idx": s["sample_idx"],
                                "n_bytes": s["n_bytes"],
                                "rel_offset": s["rel_offset"],
                            }
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_idx", "n_bytes", "rel_offset"
                ],
            )

    return df.mapInPandas(parse_batches, MP4_RANGE_SCHEMA)


# =====================================================================
# AVI / Motion-JPEG: REAL video FRAME decode (r16)
# =====================================================================
#
# MJPEG is the one video family that needs no codec library — every
# frame is a complete baseline JPEG, and operators/jpeg.py already
# decodes it. Container + frames, both directions:
#
# - ``build_avi_mjpeg``: RIFF 'AVI ' writer — LIST hdrl (avih + strl
#   with 'vids'/'MJPG' strh + BITMAPINFOHEADER strf), LIST movi with
#   word-aligned ``00dc`` frame chunks, idx1 keyframe index (every
#   MJPEG frame is a keyframe — what makes MJPEG the frame-sampling-
#   friendly archival format).
# - ``parse_avi``: structural walk with fail-loud cross-checks
#   (avih/strh/idx1/movi frame counts must agree; the stream must be
#   vids/MJPG — compressed inter-frame codecs (H.264/VP9/AV1) remain
#   the documented library-swap ``NotImplementedError``, the same
#   boundary parse_mp4_metadata above draws).
# - ``decode_avi_mjpeg_frames``: every frame through the real JPEG
#   decoder, in container order.
#
# Scale shape: ``avi_frame_stats`` is Arrow-batched mapInPandas —
# map-only, no shuffle, cost ∝ total payload bytes, the same executor
# contract as the PNG/JPEG/WAV/FLAC codecs. The module docstring's
# "FRAME decode stays a documented stub" now scopes to compressed
# inter-frame codecs only.

_AVIIF_KEYFRAME = 0x10


def build_avi_mjpeg(
    frames: "list[bytes]",
    width: int,
    height: int,
    fps: int = 12,
) -> bytes:
    """Assemble complete baseline-JPEG frames into a structurally
    real AVI: one 'vids'/'MJPG' stream, word-aligned ``00dc`` movi
    chunks, idx1 marking every frame AVIIF_KEYFRAME. Frame bytes are
    NOT re-encoded — MJPEG is JPEG-per-frame by definition."""
    if not frames:
        raise ValueError("an AVI needs at least one frame")
    if fps <= 0:
        raise ValueError("fps must be positive")
    for f in frames:
        if f[:2] != b"\xff\xd8":
            raise ValueError("MJPEG frame without JPEG SOI marker")

    def chunk(ckid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return ckid + struct.pack("<I", len(body)) + body + pad

    def lst(four: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", four + body)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        0,                 # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        0x10,              # AVIF_HASINDEX
        len(frames),       # dwTotalFrames
        0,                 # dwInitialFrames
        1,                 # dwStreams
        0,                 # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,        # dwReserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<10I4H",
            0, 0, 0,            # flags, priority+language, initial
            1,                  # dwScale
            fps,                # dwRate (fps = rate/scale)
            0,                  # dwStart
            len(frames),        # dwLength (in frames)
            0,                  # dwSuggestedBufferSize
            0xFFFFFFFF,         # dwQuality (default)
            0,                  # dwSampleSize (0: variable)
            0, 0, width, height,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_chunks, idx, offset = [], [], 4  # offset counts from 'movi'
    for f in frames:
        c = chunk(b"00dc", f)
        movi_chunks.append(c)
        idx.append(
            b"00dc" + struct.pack("<III", _AVIIF_KEYFRAME, offset, len(f))
        )
        offset += len(c)
    movi = lst(b"movi", b"".join(movi_chunks))
    idx1 = chunk(b"idx1", b"".join(idx))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi(payload: bytes) -> dict:
    """Structural AVI walk: returns ``{width, height, fps, n_frames,
    n_keyframes, handler, frames: [bytes, ...]}`` with every header /
    index / chunk count cross-checked. ``ValueError`` on structure;
    ``NotImplementedError`` for non-MJPG video handlers (compressed
    inter-frame codecs are the documented library swap — their
    CONTAINER still parses, so triage/dedup pipelines run on 100 % of
    a mixed corpus)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    (riff_len,) = struct.unpack("<I", payload[4:8])
    if riff_len + 8 > len(payload):
        raise ValueError("truncated AVI (RIFF length exceeds payload)")

    avih = None
    strh = None
    frames: list[bytes] = []
    idx_entries = 0

    def walk(pos: int, end: int) -> None:
        nonlocal avih, strh, idx_entries
        while pos + 8 <= end:
            ckid = payload[pos:pos + 4]
            (length,) = struct.unpack("<I", payload[pos + 4:pos + 8])
            body_start = pos + 8
            body_end = body_start + length
            if body_end > end:
                raise ValueError(f"truncated AVI chunk {ckid!r}")
            if ckid == b"LIST":
                walk(body_start + 4, body_end)
            elif ckid == b"avih":
                avih = struct.unpack("<14I", payload[body_start:body_start + 56])
            elif ckid == b"strh":
                # strl lists appear in stream order, so the FIRST strh
                # is stream 0's — keeping the last one misreported a
                # multi-stream AVI (MJPEG video + audio) as "first
                # stream is not video" with the AUDIO stream's fccType
                # even though stream 0 was decodable (ADVICE r16).
                # Later streams' data chunks (01wb, ...) are already
                # skipped; only 00dc (stream 0 video) is collected.
                if strh is None:
                    strh = payload[body_start:body_start + 56]
            elif ckid == b"00dc":
                frames.append(payload[body_start:body_end])
            elif ckid == b"idx1":
                if length % 16:
                    raise ValueError("idx1 length not a multiple of 16")
                # count stream 0's VIDEO entries only: a multi-stream
                # file's idx1 legitimately interleaves audio entries,
                # which must not trip the frame-count cross-check
                idx_entries = sum(
                    1
                    for off in range(body_start, body_end, 16)
                    if payload[off:off + 4] == b"00dc"
                )
            pos = body_end + (length & 1)  # chunks are word-aligned

    walk(12, 8 + riff_len)
    if avih is None or strh is None:
        raise ValueError("AVI missing avih/strh header")
    fcc_type, handler = strh[0:4], strh[4:8]
    if fcc_type != b"vids":
        raise ValueError(f"first stream is not video ({fcc_type!r})")
    if handler not in (b"MJPG", b"mjpg"):
        raise NotImplementedError(
            f"video handler {handler!r}: only MJPEG frames decode "
            "here — compressed inter-frame codecs (H.264/VP9/AV1) "
            "are the documented library swap"
        )
    scale, rate = struct.unpack("<II", strh[20:28])
    if scale == 0 or rate == 0:
        raise ValueError("strh declares zero scale/rate")
    n_frames = avih[4]
    if len(frames) != n_frames:
        raise ValueError(
            f"avih declares {n_frames} frames, movi carries {len(frames)}"
        )
    if idx_entries and idx_entries != n_frames:
        raise ValueError(
            f"idx1 carries {idx_entries} entries for {n_frames} frames"
        )
    return {
        "width": avih[8],
        "height": avih[9],
        "fps": rate // scale,
        "n_frames": n_frames,
        "n_keyframes": idx_entries,
        "handler": handler.decode("ascii"),
        "frames": frames,
    }


def decode_avi_mjpeg_frames(payload: bytes):
    """Full video decode: every MJPEG frame through the real JPEG
    decoder (operators/jpeg.py), yielded in container order as
    ``(frame_index, height x width [x channels] uint8 ndarray)``.
    Dimensions are cross-checked against the container header."""
    from mongo2pq_spark.operators.jpeg import decode_jpeg_pixels

    meta = parse_avi(payload)
    for i, blob in enumerate(meta["frames"]):
        height, width, _channels, arr = decode_jpeg_pixels(blob)
        if height != meta["height"] or width != meta["width"]:
            raise ValueError(
                f"frame {i} decodes {(height, width)}, container "
                f"says {(meta['height'], meta['width'])}"
            )
        yield i, arr


AVI_STATS_SCHEMA = (
    "doc_id bigint, width int, height int, fps int, n_frames bigint, "
    "n_keyframes bigint, pixel_sum bigint, order_sum bigint"
)


def avi_frame_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched REAL video decode to corpus-filter scalars:
    container metadata + every frame's exact integer pixel sum, plus
    ``order_sum = Σ (i+1)·frame_sum(i)`` — the frame-ORDER pin an
    oracle can state closed-form (two swapped frames change it even
    when the plain sum survives). Map-only, no shuffle."""
    from mongo2pq_spark.deploy import ensure_shipped

    ensure_shipped(df.sparkSession)

    def stat_batches(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload)
                meta = parse_avi(payload)
                psum = osum = 0
                for i, arr in decode_avi_mjpeg_frames(payload):
                    s = int(arr.astype("int64").sum())
                    psum += s
                    osum += (i + 1) * s
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": meta["width"],
                        "height": meta["height"],
                        "fps": meta["fps"],
                        "n_frames": meta["n_frames"],
                        "n_keyframes": meta["n_keyframes"],
                        "pixel_sum": psum,
                        "order_sum": osum,
                    }
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(stat_batches, AVI_STATS_SCHEMA)
