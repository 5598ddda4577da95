"""Baseline JPEG codec in pure stdlib + numpy — a REAL pixel codec,
retiring the decode stub for baseline JPEG exactly the way the PNG
codec (``operators/multimodal.py``) retired it for PNG: reference
implementation, correctness and testability over throughput, with a
codec-library swap documented as the production path behind the same
function contract.

Scope (fail-loud outside it):

- ``encode_jpeg``: baseline sequential DCT, 8-bit, grayscale or
  YCbCr 4:4:4, 4:2:2, 4:4:0 or 4:2:0 (chroma subsampling decodes
  for real as of r16; box upsample). The Huffman tables are our own
  canonical fixed-length layouts and are DECLARED in the stream's DHT
  segments — any conforming decoder reads tables from DHT, so the
  output is standards-compliant without transcribing the Annex K
  defaults (which are only *typical*, never required).
- ``decode_jpeg_pixels``: parses DQT/SOF0/DHT/SOS generically (so it
  also decodes third-party baseline streams, whatever tables they
  declare), Huffman-decodes the entropy stream with 0xFF00
  unstuffing, dequantizes, inverse-DCTs, and color-converts.
  ``NotImplementedError`` on progressive/extended SOFs, 12-bit
  precision, arithmetic coding, and restart
  intervals; ``ValueError`` on corrupt payloads — the same typed-error
  contract as the PNG decoder.

Exactness property the registered roundtrip query leans on: an image
whose 8×8 blocks are each CONSTANT is DC-only — with an all-ones
quantization table the FDCT/quantize/IDCT chain reproduces it
bit-exactly (AC terms are ~1e-16 float noise that rounds to zero), so
a closed-form SQL oracle can pin the full encode→decode pipeline.
General images round-trip within a small rounding tolerance (the
per-coefficient quantization round composes through the IDCT and, for
color, the YCbCr matrix: ≤2 grayscale, ≤3 RGB — property-tested),
covered by unit tests.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame

JPEG_MAGIC = b"\xff\xd8"


def _zigzag_order():
    """The standard zigzag scan as (y, x) pairs, generated from the
    construction rule (anti-diagonals, alternating direction) rather
    than transcribed."""
    order = []
    for s in range(15):
        diag = [(y, s - y) for y in range(8) if 0 <= s - y < 8]
        order.extend(diag[::-1] if s % 2 == 0 else diag)
    return order


_ZIGZAG = _zigzag_order()

#: our canonical Huffman layouts (declared in DHT; see module doc):
#: DC — 12 categories, all 4-bit codes; AC — 162 symbols, all 8-bit
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_VALS = list(range(12))
_AC_BITS = [0] * 7 + [162] + [0] * 8
_AC_VALS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]


def _build_codes(bits, vals):
    """Canonical Huffman code assignment (JPEG B.2.4.2): symbol →
    (code, length)."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return codes


def _build_decode_map(bits, vals):
    """(length, code) → symbol, for the bit-serial decoder."""
    return {
        (length, code): sym
        for sym, (code, length) in _build_codes(bits, vals).items()
    }


def _dct_matrix():
    import numpy as np

    m = np.empty((8, 8))
    m[0, :] = 1.0 / np.sqrt(8.0)
    for u in range(1, 8):
        for x in range(8):
            m[u, x] = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return m


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, length: int) -> None:
        for i in reversed(range(length)):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.buf.append(self._acc)
                if self._acc == 0xFF:  # byte stuffing
                    self.buf.append(0x00)
                self._acc = 0
                self._n = 0

    def flush(self) -> None:
        while self._n:
            self.write(1, 1)  # pad final byte with 1-bits (F.1.2.3)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            self._acc = self.data[self.pos]
            self.pos += 1
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.read_bit()
        return v


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _rgb_to_ycbcr(arr):
    import numpy as np

    r, g, b = (arr[:, :, i].astype(np.float64) for i in range(3))
    return np.stack(
        [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b,
        ],
        axis=2,
    )


def _ycbcr_to_rgb(planes):
    import numpy as np

    y, cb, cr = planes[:, :, 0], planes[:, :, 1] - 128.0, planes[:, :, 2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136286 * cb - 0.714136286 * cr,
            y + 1.772 * cb,
        ],
        axis=2,
    )
    return np.clip(np.rint(rgb), 0, 255).astype("uint8")


_SAMPLING_MODES = {
    "444": ((1, 1), (1, 1), (1, 1)),
    "422": ((2, 1), (1, 1), (1, 1)),
    "420": ((2, 2), (1, 1), (1, 1)),
}


def _encode_block(writer, block, q, comp, dc_prev, dc_codes, ac_codes, m):
    """One 8×8 block through FDCT → quantize → Huffman (shared by
    every sampling mode; DC predictor is per component)."""
    import numpy as np

    coef = np.rint((m @ (block - 128.0) @ m.T) / q).astype(int)
    zz = [int(coef[y, x]) for (y, x) in _ZIGZAG]
    diff = zz[0] - dc_prev[comp]
    dc_prev[comp] = zz[0]
    cat = _category(diff)
    code, length = dc_codes[cat]
    writer.write(code, length)
    if cat:
        bits = diff if diff >= 0 else diff + (1 << cat) - 1
        writer.write(bits, cat)
    run = 0
    for v in zz[1:]:
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        size = _category(v)
        if size > 10:
            raise ValueError(
                f"AC coefficient {v} exceeds the 10-bit "
                "magnitude of the declared table (use a "
                "larger quantization table)"
            )
        code, length = ac_codes[(run << 4) | size]
        writer.write(code, length)
        bits = v if v >= 0 else v + (1 << size) - 1
        writer.write(bits, size)
        run = 0
    if run:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)


def encode_jpeg(arr, qtable=None, subsampling: str = "444") -> bytes:
    """Baseline JPEG writer: h×w (grayscale) or h×w×3 (RGB, stored as
    YCbCr) uint8 array → standards-compliant JFIF-less baseline JPEG
    bytes. ``qtable`` is the 8×8 quantization table used for ALL
    components (default all-ones — near-lossless, the reference
    setting the exact-roundtrip oracle relies on). ``subsampling``
    (3-channel only): '444', '422', or '420' (r16) — chroma planes
    box-downsampled and the scan emitted in interleaved MCU order
    with the matching SOF sampling factors, the layout camera/encoder
    output overwhelmingly ships."""
    import numpy as np

    arr = np.ascontiguousarray(arr, dtype="uint8")
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 3):
        raise ValueError(
            f"expected h×w or h×w×{{1,3}} array, got shape {arr.shape}"
        )
    h, w, n_comp = arr.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if subsampling not in _SAMPLING_MODES:
        raise ValueError(f"unknown subsampling {subsampling!r}")
    if n_comp == 1:
        samp = ((1, 1),)
    else:
        samp = _SAMPLING_MODES[subsampling]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    q = (
        np.ones((8, 8), dtype=np.float64)
        if qtable is None
        else np.asarray(qtable, dtype=np.float64).reshape(8, 8)
    )
    if (q < 1).any() or (q > 255).any():
        raise ValueError("quantization table entries must be in 1..255")

    full = (
        _rgb_to_ycbcr(arr)
        if n_comp == 3
        else arr[:, :, 0].astype(np.float64)[:, :, None]
    )
    # pad to MCU multiples by edge replication
    mcu_h, mcu_w = 8 * vmax, 8 * hmax
    ph, pw = -(-h // mcu_h) * mcu_h, -(-w // mcu_w) * mcu_w
    full = np.pad(full, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    planes = []
    for ci, (hi, vi) in enumerate(samp):
        plane = full[:, :, ci]
        fy, fx = vmax // vi, hmax // hi
        if fy > 1 or fx > 1:  # box downsample
            plane = plane.reshape(
                ph // fy, fy, pw // fx, fx
            ).mean(axis=(1, 3))
        planes.append(plane)

    dc_codes = _build_codes(_DC_BITS, _DC_VALS)
    ac_codes = _build_codes(_AC_BITS, _AC_VALS)
    m = _dct_matrix()
    writer = _BitWriter()
    dc_prev = [0] * n_comp
    for my in range(ph // mcu_h):
        for mx in range(pw // mcu_w):
            for ci, (hi, vi) in enumerate(samp):
                for r in range(vi):
                    for c in range(hi):
                        by, bx = my * vi + r, mx * hi + c
                        block = planes[ci][
                            by * 8:by * 8 + 8, bx * 8:bx * 8 + 8
                        ]
                        _encode_block(
                            writer, block, q, ci, dc_prev,
                            dc_codes, ac_codes, m,
                        )
    writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    qzz = bytes(int(q[y, x]) for (y, x) in _ZIGZAG)
    sof_comps = b"".join(
        struct.pack(
            ">BBB", cid + 1, (samp[cid][0] << 4) | samp[cid][1], 0
        )
        for cid in range(n_comp)
    )
    sos_comps = b"".join(
        struct.pack(">BB", cid + 1, 0x00) for cid in range(n_comp)
    )
    return (
        JPEG_MAGIC
        + seg(0xDB, b"\x00" + qzz)  # DQT, 8-bit, table 0
        + seg(
            0xC0,
            struct.pack(">BHHB", 8, h, w, n_comp) + sof_comps,
        )  # SOF0
        + seg(0xC4, bytes([0x00] + _DC_BITS) + bytes(_DC_VALS))  # DHT DC0
        + seg(0xC4, bytes([0x10] + _AC_BITS) + bytes(_AC_VALS))  # DHT AC0
        + seg(0xDA, bytes([n_comp]) + sos_comps + b"\x00\x3f\x00")  # SOS
        + bytes(writer.buf)
        + b"\xff\xd9"  # EOI
    )


def _extend(bits: int, cat: int) -> int:
    """Magnitude decode (F.2.2.1): low-order ``cat`` bits → signed."""
    if cat == 0:
        return 0
    return bits if bits >= (1 << (cat - 1)) else bits - (1 << cat) + 1


def decode_jpeg_pixels(payload: bytes):
    """Decode a baseline JPEG to ``(height, width, channels, uint8
    ndarray)`` — channels 1 (grayscale) or 3 (RGB). See the module
    docstring for the supported envelope and the typed-error
    contract."""
    import numpy as np

    if payload[:2] != JPEG_MAGIC:
        raise ValueError("not a JPEG payload")
    qtables: dict[int, "np.ndarray"] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    scan = None
    pos = 2
    try:
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                raise ValueError("corrupt JPEG segment stream")
            # ITU T.81 B.1.1.2: any number of 0xFF FILL bytes may
            # precede a marker — conforming encoders use them for
            # alignment, so skip to the last 0xFF of the run
            while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
                pos += 1
            marker = payload[pos + 1]
            if marker == 0xD9:  # EOI before SOS
                break
            (length,) = struct.unpack(">H", payload[pos + 2:pos + 4])
            body = payload[pos + 4:pos + 2 + length]
            pos += 2 + length
            if marker == 0xDB:  # DQT (possibly several tables)
                i = 0
                while i < len(body):
                    pq, tq = body[i] >> 4, body[i] & 15
                    if pq != 0:
                        raise NotImplementedError(
                            "16-bit quantization tables unsupported"
                        )
                    tbl = np.zeros((8, 8))
                    for k, (y, x) in enumerate(_ZIGZAG):
                        tbl[y, x] = body[i + 1 + k]
                    qtables[tq] = tbl
                    i += 65
            elif marker == 0xC0 or marker == 0xC1:
                sof = body
            elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                            0xCB, 0xCD, 0xCE, 0xCF):
                raise NotImplementedError(
                    "reference decoder handles baseline sequential "
                    f"Huffman JPEG only (SOF marker 0x{marker:02x})"
                )
            elif marker == 0xC4:  # DHT (possibly several tables)
                i = 0
                while i < len(body):
                    tc, th = body[i] >> 4, body[i] & 15
                    bits = list(body[i + 1:i + 17])
                    n = sum(bits)
                    vals = list(body[i + 17:i + 17 + n])
                    huff[(tc, th)] = _build_decode_map(bits, vals)
                    i += 17 + n
            elif marker == 0xDD:  # DRI
                if body[:2] != b"\x00\x00":
                    raise NotImplementedError(
                        "restart intervals unsupported"
                    )
            elif marker == 0xDA:  # SOS — entropy data follows
                n_scan = body[0]
                scan_comps = [
                    (body[1 + 2 * i], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 15)
                    for i in range(n_scan)
                ]
                # un-stuff the entropy bytes up to the next real marker
                clean = bytearray()
                while pos < len(payload):
                    b = payload[pos]
                    if b == 0xFF:
                        nxt = payload[pos + 1] if pos + 1 < len(payload) else None
                        if nxt == 0x00:
                            clean.append(0xFF)
                            pos += 2
                            continue
                        if nxt is not None and 0xD0 <= nxt <= 0xD7:
                            raise NotImplementedError(
                                "restart markers unsupported"
                            )
                        break  # EOI or next segment
                    clean.append(b)
                    pos += 1
                scan = (scan_comps, bytes(clean))
                break
    except (struct.error, IndexError) as exc:
        raise ValueError(f"truncated JPEG stream: {exc}") from exc
    if sof is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")

    precision, h, w, n_comp = struct.unpack(">BHHB", sof[:6])
    if precision != 8:
        raise NotImplementedError(f"{precision}-bit JPEG unsupported")
    if n_comp not in (1, 3):
        raise NotImplementedError(f"{n_comp}-component JPEG unsupported")
    comps = []
    for i in range(n_comp):
        cid, sampling, tq = sof[6 + 3 * i:9 + 3 * i]
        hi, vi = sampling >> 4, sampling & 15
        if hi not in (1, 2) or vi not in (1, 2):
            raise NotImplementedError(
                f"sampling factors {hi}x{vi} unsupported "
                "(1-2 each: 4:4:4, 4:2:2, 4:4:0, 4:2:0)"
            )
        comps.append((cid, tq, hi, vi))
    if n_comp == 1 and comps[0][2:] != (1, 1):
        raise NotImplementedError(
            "subsampled single-component JPEG is not meaningful"
        )
    scan_comps, data = scan
    if [c for c, _, _ in scan_comps] != [cid for cid, _, _, _ in comps]:
        raise ValueError("SOS component order differs from SOF")

    m = _dct_matrix()
    reader = _BitReader(data)
    hmax = max(hi for _, _, hi, _ in comps)
    vmax = max(vi for _, _, _, vi in comps)
    mcu_h, mcu_w = 8 * vmax, 8 * hmax
    mcus_y, mcus_x = -(-h // mcu_h), -(-w // mcu_w)
    # per-component planes at THEIR sampling resolution; interleaved
    # MCU traversal per T.81 A.2.3 (vi x hi blocks per comp per MCU)
    planes = [
        np.zeros((mcus_y * 8 * vi, mcus_x * 8 * hi))
        for _, _, hi, vi in comps
    ]
    dc_prev = [0] * n_comp

    def decode_sym(table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, ((_cid, tq, hi, vi), (_sc, td, ta)) in enumerate(
                zip(comps, scan_comps)
            ):
                dc_tbl, ac_tbl = huff.get((0, td)), huff.get((1, ta))
                if dc_tbl is None or ac_tbl is None:
                    raise ValueError("SOS references an undeclared DHT")
                q = qtables.get(tq)
                if q is None:
                    raise ValueError("SOF references an undeclared DQT")
                for r in range(vi):
                    for c in range(hi):
                        zz = [0] * 64
                        cat = decode_sym(dc_tbl)
                        dc_prev[ci] += _extend(reader.read(cat), cat)
                        zz[0] = dc_prev[ci]
                        k = 1
                        while k < 64:
                            sym = decode_sym(ac_tbl)
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += sym >> 4
                            if k > 63:
                                raise ValueError(
                                    "AC run overflows the block"
                                )
                            zz[k] = _extend(
                                reader.read(sym & 15), sym & 15
                            )
                            k += 1
                        coef = np.zeros((8, 8))
                        for idx, (y, x) in enumerate(_ZIGZAG):
                            coef[y, x] = zz[idx]
                        block = m.T @ (coef * q) @ m + 128.0
                        by, bx = my * vi + r, mx * hi + c
                        planes[ci][
                            by * 8:by * 8 + 8, bx * 8:bx * 8 + 8
                        ] = block
    # upsample subsampled planes back to full resolution (box — the
    # exact inverse of the encoder's box downsample for
    # constant-per-cell content, which is what keeps the DC-block
    # oracle bit-exact through 4:2:0)
    out_planes = np.zeros((mcus_y * mcu_h, mcus_x * mcu_w, n_comp))
    for ci, (_cid, _tq, hi, vi) in enumerate(comps):
        plane = planes[ci]
        fy, fx = vmax // vi, hmax // hi
        if fy > 1:
            plane = np.repeat(plane, fy, axis=0)
        if fx > 1:
            plane = np.repeat(plane, fx, axis=1)
        out_planes[:, :, ci] = plane
    if n_comp == 1:
        out = np.clip(
            np.rint(out_planes[:h, :w, :]), 0, 255
        ).astype("uint8")
    else:
        out = _ycbcr_to_rgb(out_planes[:h, :w, :])
    return h, w, n_comp, out


def jpeg_pixel_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched REAL JPEG pixel decode via the shared
    ``pixel_stats_with`` harness (see ``multimodal.py``) — the DuckDB
    oracle recomputes the emitted scalars from a deterministic
    block-constant generation rule (DC-only blocks round-trip
    bit-exactly; see module docstring)."""
    from mongo2pq_spark.operators.multimodal import pixel_stats_with

    return pixel_stats_with(decode_jpeg_pixels, df, id_col, payload_col)
