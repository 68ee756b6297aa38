"""Dependency-free baseline JPEG codec (ITU-T T.81 sequential DCT) —
the fourth real image format behind §2B#60 (r9 verdict task #5: crawl
and factsheet corpora are JPEG-dominant; the reference's media surface
is document links fetched as raw bytes, ishares.py:97-137).

Scope (all public-spec, no third-party code):

- **Encoder**: 8-bit RGB (or grayscale) → JFIF baseline: BT.601 YCbCr,
  4:4:4 (no subsampling), per-block float64 FDCT, quality-scaled
  quantization (the libjpeg 5000/Q | 200-2Q public formula over
  Annex-K-shaped base tables), zigzag, DC prediction, canonical Huffman
  entropy coding with 0xFF byte stuffing. The Huffman tables are a
  deterministic engine-chosen canonical set (all 12 DC categories at 4
  bits, all 162 AC run/size symbols at 8 bits) — T.81 makes the tables
  part of the FILE (DHT), so any table satisfying Kraft is a valid
  baseline stream; fixed-length tables keep the encoder table-free and
  the stream deterministic byte-for-byte.
- **Decoder**: parses SOI/APP0/COM/DQT/SOF0/DHT/DRI/SOS, builds Huffman
  decoders from the FILE's DHT (it decodes streams from any baseline
  encoder, not just ours), entropy-decodes DC/AC with EOB/ZRL and
  restart markers, dequantizes, inverse-zigzags, IDCTs, undoes the
  level shift, converts YCbCr→RGB and crops the 8-pixel padding.
- **Progressive (SOF2, r11)**: full T.81 Annex G.1.2 spectral
  selection + successive approximation — multi-scan encoder on the
  libjpeg default scan-script shape, decoder accumulating coefficients
  across DC first/refine and AC first/refine scans (EOBn runs with
  embedded correction bits, two's-complement DC point transform).
  A completed progressive stream of the same quantized coefficients
  decodes bit-identically to the baseline stream — the codec's
  exactness oracle. ``decode_jpeg`` dispatches on the frame marker.
  Still fails loudly: arithmetic coding, hierarchical/lossless
  processes, 12-bit precision, sampling factors > 2.

Determinism: every float stage is fixed-order float64 numpy (IEEE,
bit-identical across hosts); rounding is np.rint everywhere. That makes
decode(encode(img)) a pure function of the input pixels, which is what
lets the registry query pin decoded VALUES against an independent
closed-form replay (block-constant images reduce to the DC path, where
the round-trip is exactly computable per input value).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants
# ---------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex-K-shaped base quantization tables (public T.81 example tables)
_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
)
_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
)


def quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """Quality-scaled (luma, chroma) tables, natural (row-major) order —
    the public libjpeg scaling: Q<50 → 5000/Q, else 200-2Q, clamped to
    [1, 255]."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be 1..100, got {quality}")
    scale = 5000.0 / quality if quality < 50 else 200.0 - 2.0 * quality
    out = []
    for base in (_Q_LUMA, _Q_CHROMA):
        q = np.floor((base * scale + 50.0) / 100.0)
        out.append(np.clip(q, 1, 255).astype(np.float64))
    return out[0], out[1]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix (float64): FDCT = D @ B @ D.T,
    IDCT = D.T @ C @ D."""
    k = np.arange(8, dtype=np.float64)
    d = np.cos((2.0 * k[None, :] + 1.0) * k[:, None] * np.pi / 16.0)
    d *= np.sqrt(2.0 / 8.0)
    d[0, :] *= 1.0 / np.sqrt(2.0)
    return d


_D = _dct_matrix()

# Engine-chosen canonical Huffman tables (see module docstring): all 12
# DC categories at length 4; all 162 AC run/size symbols at length 8.
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_AC_SYMBOLS = sorted(set(_AC_SYMBOLS))  # 162 symbols, canonical order
_DC_BITS = [0] * 16
_DC_BITS[3] = 12  # 12 codes of length 4 (index 3 = length 4)
_AC_BITS = [0] * 16
_AC_BITS[7] = 162  # 162 codes of length 8


def _canonical_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) per T.81 canonical code construction."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_CODES = _canonical_codes(_DC_BITS, _DC_SYMBOLS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_SYMBOLS)


# ---------------------------------------------------------------------------
# bit I/O with 0xFF stuffing
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, value: int, length: int) -> None:
        if length == 0:
            return
        self._acc = (self._acc << length) | (value & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2  # stuffed 0xFF data byte
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ValueError(
                    f"unexpected marker 0xFF{nxt:02X} inside entropy data"
                )
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._n += 8

    def bits(self, n: int) -> int:
        while self._n < n:
            self._fill()
        self._n -= n
        v = (self._acc >> self._n) & ((1 << n) - 1)
        return v

    def align_restart(self) -> None:
        """Consume a restart marker at a byte boundary and reset."""
        self._acc = 0
        self._n = 0
        d = self.data
        if d[self.pos] != 0xFF or not (0xD0 <= d[self.pos + 1] <= 0xD7):
            raise ValueError("expected restart marker")
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _magnitude(v: int) -> tuple[int, int]:
    """(category, value-bits) per T.81 F.1.2.1: negative values encode
    as v - 1 in ``category`` bits (one's-complement trick)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    """Inverse of _magnitude (T.81 F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


# ---------------------------------------------------------------------------
# color transforms (JFIF / BT.601, float64 + rint — deterministic IEEE)
# ---------------------------------------------------------------------------


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.clip(
        np.rint(np.stack([y, cb, cr], axis=-1)), 0, 255
    ).astype(np.float64)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(
        np.uint8
    )


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H/8 * W/8, 8, 8) blocks of an edge-padded plane."""
    h, w = plane.shape
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return (
        padded.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _encode_component(
    writer: _BitWriter, coeffs: np.ndarray, pred: int
) -> int:
    """Entropy-code one block's zigzagged quantized coefficients;
    returns the new DC predictor."""
    dc = int(coeffs[0])
    size, bits = _magnitude(dc - pred)
    code, length = _DC_CODES[size]
    writer.put(code, length)
    writer.put(bits, size)
    run = 0
    last_nz = int(np.max(np.nonzero(coeffs)[0])) if np.any(coeffs[1:]) else 0
    for k in range(1, 64):
        v = int(coeffs[k])
        if v == 0:
            if k > last_nz:
                c, ln = _AC_CODES[0x00]  # EOB
                writer.put(c, ln)
                break
            run += 1
            if run == 16:
                c, ln = _AC_CODES[0xF0]  # ZRL
                writer.put(c, ln)
                run = 0
            continue
        s, b = _magnitude(v)
        c, ln = _AC_CODES[(run << 4) | s]
        writer.put(c, ln)
        writer.put(b, s)
        run = 0
    return dc


def _downsample2x2(plane: np.ndarray) -> np.ndarray:
    """2x2 mean chroma downsample (edge-padded to even dims, rint) —
    the 4:2:0 encoder's one extra lossy step, deterministic IEEE."""
    h, w = plane.shape
    p = np.pad(plane, ((0, h % 2), (0, w % 2)), mode="edge")
    return np.rint(
        (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2])
        / 4.0
    )


def _blocks_grid(plane: np.ndarray, gh: int, gw: int) -> np.ndarray:
    """(gh*gw, 8, 8) blocks of ``plane`` edge-padded to exactly a
    (gh, gw) block grid, row-major."""
    h, w = plane.shape
    padded = np.pad(
        plane, ((0, gh * 8 - h), (0, gw * 8 - w)), mode="edge"
    )
    return (
        padded.reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _prep_coefficients(
    width: int,
    height: int,
    pixels: bytes,
    quality: int,
    subsampling: str,
):
    """Shared encoder front half: color transform, optional chroma
    downsample, FDCT + quantization. Returns
    (ncomp, samp, mcux, mcuy, qtabs, coeff, grids) where ``coeff[c]``
    is the (gh·gw, 64) zigzagged quantized int array for component c
    on its padded MCU-aligned block grid ``grids[c] = (gh, gw)``."""
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be '444' or '420', got {subsampling!r}")
    n = width * height
    if len(pixels) == 3 * n:
        arr = np.frombuffer(pixels, np.uint8).reshape(height, width, 3)
        ycc = rgb_to_ycbcr(arr)
        planes = [ycc[..., i] for i in range(3)]
        ncomp = 3
    elif len(pixels) == n:
        planes = [
            np.frombuffer(pixels, np.uint8)
            .reshape(height, width)
            .astype(np.float64)
        ]
        ncomp = 1
    else:
        raise ValueError("pixel buffer size mismatch")
    if ncomp == 3 and subsampling == "420":
        samp = [(2, 2), (1, 1), (1, 1)]
        planes = [planes[0], _downsample2x2(planes[1]), _downsample2x2(planes[2])]
    else:
        samp = [(1, 1)] * ncomp
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    ql, qc = quant_tables(quality)
    qtabs = [ql, qc]
    quant = [qtabs[0]] + [qtabs[1]] * (ncomp - 1)
    coeff = []
    grids = []
    for p, q, (h_i, v_i) in zip(planes, quant, samp):
        gh, gw = mcuy * v_i, mcux * h_i
        bi = _blocks_grid(p, gh, gw)
        f = np.einsum("ij,njk,lk->nil", _D, bi - 128.0, _D)
        qz = np.rint(f.reshape(-1, 64) / q.reshape(1, 64))
        coeff.append(qz[:, ZIGZAG].astype(np.int64))
        grids.append((gh, gw))
    return ncomp, samp, mcux, mcuy, qtabs, coeff, grids


def encode_jpeg_baseline(
    width: int,
    height: int,
    pixels: bytes,
    quality: int = 90,
    subsampling: str = "444",
) -> bytes:
    """RGB row-major ``pixels`` (3·w·h bytes) → baseline JFIF bytes.
    Grayscale (w·h bytes) encodes as a single-component stream.
    ``subsampling``: '444' (every component full-resolution, 1x1
    sampling — the exact-replay fixture shape) or '420' (luma 2x2,
    chroma 2x2-mean-downsampled — the dominant real-world crawl shape;
    MCUs carry 4 Y blocks + 1 Cb + 1 Cr)."""
    ncomp, samp, mcux, mcuy, qtabs, coeff, grids = _prep_coefficients(
        width, height, pixels, quality, subsampling
    )
    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(
        ">H", 16
    ) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    # DQT (natural order values written in zigzag order, per spec)
    for tid, q in enumerate(qtabs[: 2 if ncomp == 3 else 1]):
        zz = q[ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + zz
    # SOF0
    comps = b""
    for cid in range(1, ncomp + 1):
        h_i, v_i = samp[cid - 1]
        tq = 0 if cid == 1 else 1
        comps += bytes([cid, (h_i << 4) | v_i, tq])
    out += b"\xff\xc0" + struct.pack(
        ">HBHHB", 8 + 3 * ncomp, 8, height, width, ncomp
    ) + comps
    # DHT: one DC + one AC table, shared by all components
    for tc, (bits, syms) in (
        (0, (_DC_BITS, _DC_SYMBOLS)),
        (1, (_AC_BITS, _AC_SYMBOLS)),
    ):
        payload = bytes([tc << 4]) + bytes(bits) + bytes(syms)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    # SOS
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00])  # DC table 0, AC table 0
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    # entropy-coded data: interleaved MCUs, each carrying h×v blocks
    # per component (T.81 A.2.3 order: left-to-right, top-to-bottom
    # within the component, components in SOF order)
    writer = _BitWriter()
    pred = [0] * ncomp
    for my in range(mcuy):
        for mx in range(mcux):
            for c in range(ncomp):
                h_i, v_i = samp[c]
                _gh, gw = grids[c]
                for byy in range(v_i):
                    for bxx in range(h_i):
                        idx = (my * v_i + byy) * gw + (mx * h_i + bxx)
                        pred[c] = _encode_component(
                            writer, coeff[c][idx], pred[c]
                        )
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _HuffTable:
    __slots__ = ("lookup", "maxlen")

    def __init__(self, bits: list[int], symbols: list[int]) -> None:
        codes = _canonical_codes(bits, symbols)
        # (length, code) -> symbol
        self.lookup = {
            (length, code): sym for sym, (code, length) in codes.items()
        }
        self.maxlen = max((ln for ln, _ in self.lookup), default=0)

    def read(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, self.maxlen + 1):
            code = (code << 1) | br.bits(1)
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy data")


def decode_jpeg_baseline(data: bytes) -> tuple[int, int, int, bytes]:
    """Baseline JFIF bytes → (width, height, n_channels, pixel bytes):
    RGB row-major for 3-component streams, luma bytes for grayscale.
    Progressive / arithmetic / subsampled / 12-bit streams raise."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    sof = None
    restart_interval = 0
    while True:
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("EOI before SOS: no image data")
        if marker in (0xC2, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                f"unsupported JPEG process SOF{marker - 0xC0} "
                "(baseline sequential SOF0 only)"
            )
        seg_len = struct.unpack_from(">H", data, pos)[0]
        seg = data[pos + 2 : pos + seg_len]
        pos += seg_len
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(seg, np.uint8, 64, p + 1).astype(
                    np.float64
                )
                nat = np.empty(64, np.float64)
                nat[ZIGZAG] = zz
                qtabs[tq] = nat
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nsym = sum(bits)
                syms = list(seg[p + 17 : p + 17 + nsym])
                huff[(tc, th)] = _HuffTable(bits, syms)
                p += 17 + nsym
        elif marker == 0xC0:  # SOF0
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("12-bit precision unsupported")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                h_i, v_i = hv >> 4, hv & 0x0F
                if h_i not in (1, 2) or v_i not in (1, 2):
                    raise ValueError(
                        f"sampling factors {h_i}x{v_i} unsupported "
                        "(1 or 2 per axis: 4:4:4, 4:2:2, 4:4:0, 4:2:0)"
                    )
                comps.append((cid, tq, h_i, v_i))
            sof = (w, h, comps)
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            break
        # APPn / COM / others: skipped
    if sof is None:
        raise ValueError("SOS before SOF0")
    w, h, comps = sof
    # `seg` holds the SOS header we just consumed
    nsos = seg[0]
    if nsos != len(comps):
        raise ValueError("non-interleaved scans unsupported")
    tables = {}
    for i in range(nsos):
        cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
        tables[cs] = (tdta >> 4, tdta & 0x0F)
    br = _BitReader(data, pos)
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # one plane per component at ITS sampled resolution; upsampled by
    # replication after the scan (the deterministic JFIF-legal choice)
    planes = [
        np.zeros((mcuy * 8 * v_i, mcux * 8 * h_i), np.float64)
        for (_cid, _tq, h_i, v_i) in comps
    ]
    pred = [0] * len(comps)
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                br.align_restart()
                pred = [0] * len(comps)
            for ci, (cid, tq, h_i, v_i) in enumerate(comps):
                td, ta = tables[cid]
                dct = huff[(0, td)]
                act = huff[(1, ta)]
                for byy in range(v_i):
                    for bxx in range(h_i):
                        zz = np.zeros(64, np.float64)
                        size = dct.read(br)
                        diff = (
                            _extend(br.bits(size), size) if size else 0
                        )
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = act.read(br)
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            run, s = rs >> 4, rs & 0x0F
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(br.bits(s), s)
                            k += 1
                        nat = np.empty(64, np.float64)
                        nat[ZIGZAG] = zz * qtabs[tq][ZIGZAG]
                        blk = nat.reshape(8, 8)
                        pix = _D.T @ blk @ _D + 128.0
                        y0 = (my * v_i + byy) * 8
                        x0 = (mx * h_i + bxx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu += 1
    # upsample sub-resolution components by pixel replication, crop
    full = []
    for p, (_cid, _tq, h_i, v_i) in zip(planes, comps):
        if h_i < hmax:
            p = np.repeat(p, hmax // h_i, axis=1)
        if v_i < vmax:
            p = np.repeat(p, vmax // v_i, axis=0)
        full.append(p[:h, :w])
    if len(comps) == 1:
        out = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return w, h, 1, out.tobytes()
    ycc = np.stack(full, axis=-1)
    # clamp the IDCT output to sample range BEFORE color conversion
    # (T.81 level-shift clamp), then convert
    ycc = np.clip(np.rint(ycc), 0, 255)
    rgb = ycbcr_to_rgb(ycc)
    return w, h, 3, rgb.tobytes()


# ---------------------------------------------------------------------------
# fixture synthesis + exact round-trip replay (registry-query oracle)
# ---------------------------------------------------------------------------


def synth_block_constant_pixels(
    width: int, height: int, seed: int
) -> bytes:
    """Deterministic RGB pattern that is CONSTANT within each 8x8 JPEG
    block (block (by,bx) gets an LCG color keyed on (seed,by,bx)) — the
    fixture family whose baseline round-trip is exactly computable:
    constant blocks have zero AC energy, so the only lossy step is DC
    quantization, and the decoded block is again a constant whose value
    :func:`jpeg_roundtrip_constant` replays closed-form."""
    out = np.empty((height, width, 3), np.uint8)
    for by in range((height + 7) // 8):
        for bx in range((width + 7) // 8):
            x = (seed * 1_000_003 + by * 8191 + bx * 131 + 17) & 0xFFFFFFFF
            rgb = []
            for _ in range(3):
                x = (x * 1103515245 + 12345) & 0xFFFFFFFF
                rgb.append((x >> 16) & 0xFF)
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = rgb
    return out.tobytes()


def _roundtrip_component(val: float, quality: int, chroma: bool) -> float:
    """One component's DC-only round-trip (see jpeg_roundtrip_constant);
    cached — the domain is 256 shifted sample values x 2 tables per
    quality, so per-block replay cost amortizes to a dict hit."""
    key = (float(val), int(quality), bool(chroma))
    hit = _RT_CACHE.get(key)
    if hit is not None:
        return hit
    ql, qc = quant_tables(quality)
    q = qc if chroma else ql
    blk = np.full((8, 8), float(val) - 128.0)
    f = _D @ blk @ _D.T
    qz = np.rint(f.reshape(64) / q)
    nat = qz * q
    pix = _D.T @ nat.reshape(8, 8) @ _D + 128.0
    out = float(np.clip(np.rint(pix[0, 0]), 0, 255))
    _RT_CACHE[key] = out
    return out


_RT_CACHE: dict = {}


def jpeg_roundtrip_constant(
    rgb: tuple[int, int, int], quality: int = 90
) -> tuple[int, int, int]:
    """Expected decoded color of a CONSTANT 8x8 block after a baseline
    encode+decode at ``quality`` — the IEEE replay the value oracle
    compares decoded bytes against (same replay-the-exact-arithmetic
    policy as the Holt/PCA oracles): constant block → AC exactly
    quantizes to 0, DC quantizes/dequantizes through the same float64
    matrix path the codec uses, IDCT of a DC-only block is constant,
    then the same clamp + color transform."""
    ycc_in = rgb_to_ycbcr(
        np.array(rgb, np.uint8).reshape(1, 1, 3)
    ).reshape(3)
    out = np.array(
        [
            _roundtrip_component(ycc_in[0], quality, False),
            _roundtrip_component(ycc_in[1], quality, True),
            _roundtrip_component(ycc_in[2], quality, True),
        ],
        np.float64,
    )
    return tuple(
        int(v)
        for v in ycbcr_to_rgb(out.reshape(1, 1, 3)).reshape(3)
    )


# ---------------------------------------------------------------------------
# progressive DCT (SOF2) — T.81 Annex G.1.2 spectral selection +
# successive approximation (r11, closing the r10 verdict gap #5: real
# crawl corpora are heavily progressive). Same front half (color,
# FDCT, quantization) as baseline — a progressive stream carries the
# SAME quantized coefficients split across scans, so after the final
# scan the decode is bit-identical to the baseline decode of the same
# pixels (the round-trip tests pin exactly that equality).
# ---------------------------------------------------------------------------

# Progressive AC scans additionally need the EOBn symbols (RRRRSSSS
# with SSSS=0, RRRR=0..14: an end-of-band run of 2^RRRR-1+bits blocks).
_PROG_AC_SYMBOLS = sorted(
    set(
        [0xF0]
        + [r << 4 for r in range(15)]  # EOB0..EOB14 (0x00..0xE0)
        + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    )
)
_PROG_AC_BITS = [0] * 16
_PROG_AC_BITS[7] = len(_PROG_AC_SYMBOLS)  # 176 codes of length 8
_PROG_AC_CODES = _canonical_codes(_PROG_AC_BITS, _PROG_AC_SYMBOLS)


def _pt(v: int, al: int) -> int:
    """Point transform (T.81 G.1.2.1): arithmetic shift toward zero."""
    return v >> al if v >= 0 else -((-v) >> al)


class _EobState:
    """Pending end-of-band run + its buffered refinement bits."""

    __slots__ = ("run", "bits")

    def __init__(self) -> None:
        self.run = 0
        self.bits: list[int] = []

    def flush(self, w: _BitWriter) -> None:
        if self.run == 0 and not self.bits:
            return
        if self.run > 0:
            r = self.run.bit_length() - 1
            c, ln = _PROG_AC_CODES[r << 4]
            w.put(c, ln)
            w.put(self.run - (1 << r), r)
        for b in self.bits:
            w.put(b, 1)
        self.run = 0
        self.bits = []


def _comp_block_dims(w: int, h: int, h_i: int, v_i: int, hmax: int, vmax: int):
    """Non-interleaved block grid of a component (T.81 A.2.2): the
    CEILED component dimensions, NOT the MCU-padded grid."""
    cw = (w * h_i + hmax - 1) // hmax
    ch = (h * v_i + vmax - 1) // vmax
    return (ch + 7) // 8, (cw + 7) // 8


def _enc_ac_first(
    w: _BitWriter, blocks, ss: int, se: int, al: int, eob: _EobState
) -> None:
    """AC first scan (Ah=0) for one component's block sequence."""
    for coeffs in blocks:
        band = [_pt(int(coeffs[k]), al) for k in range(ss, se + 1)]
        nz = [i for i, v in enumerate(band) if v != 0]
        if not nz:
            eob.run += 1
            if eob.run == 0x7FFF:
                eob.flush(w)
            continue
        eob.flush(w)
        run = 0
        last = nz[-1]
        for i in range(last + 1):
            v = band[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = _PROG_AC_CODES[0xF0]
                w.put(c, ln)
                run -= 16
            s, b = _magnitude(v)
            c, ln = _PROG_AC_CODES[(run << 4) | s]
            w.put(c, ln)
            w.put(b, s)
            run = 0
        if last < len(band) - 1:
            eob.run += 1
            if eob.run == 0x7FFF:
                eob.flush(w)


def _enc_ac_refine(
    w: _BitWriter, blocks, ss: int, se: int, al: int, eob: _EobState
) -> None:
    """AC refinement scan (Ah=Al+1 → Al), T.81 G.1.2.3: newly
    significant coefficients code as run/1 over ZERO-HISTORY positions
    only; already-significant ones contribute one buffered correction
    bit each; EOBn carries the buffered bits of the blocks it covers."""
    for coeffs in blocks:
        band = [_pt(int(coeffs[k]), al) for k in range(ss, se + 1)]
        absband = [abs(v) for v in band]
        # last newly-significant position (|v|>>Al == 1); beyond it the
        # block is EOB territory (corrections there ride the EOB run)
        newly = [i for i, a in enumerate(absband) if a == 1]
        if not newly:
            eob.run += 1
            eob.bits.extend(a & 1 for a in absband if a > 1)
            if eob.run == 0x7FFF:
                eob.flush(w)
            continue
        eob.flush(w)
        last = newly[-1]
        run = 0
        pend: list[int] = []
        for i in range(last + 1):
            a = absband[i]
            if a == 0:
                run += 1
                continue
            # ZRL check at EVERY nonzero position (corrections too) so
            # each ZRL's appended bits are exactly the corrections the
            # decoder crosses inside THAT 16-zero span
            while run > 15:
                c, ln = _PROG_AC_CODES[0xF0]
                w.put(c, ln)
                for b in pend:
                    w.put(b, 1)
                pend = []
                run -= 16
            if a > 1:  # already significant: correction bit, no run
                pend.append(a & 1)
                continue
            # newly significant
            c, ln = _PROG_AC_CODES[(run << 4) | 1]
            w.put(c, ln)
            w.put(1 if band[i] > 0 else 0, 1)
            for b in pend:
                w.put(b, 1)
            pend = []
            run = 0
        # any band positions after the last newly-significant
        # coefficient terminate via an EOB unit — its appended bits are
        # the corrections in that tail (possibly none; the decoder
        # needs the EOB symbol either way to leave the block)
        if last < len(band) - 1:
            tail = [a & 1 for a in absband[last + 1 :] if a > 1]
            eob.run += 1
            eob.bits.extend(tail)
            if eob.run == 0x7FFF:
                eob.flush(w)


def encode_jpeg_progressive(
    width: int,
    height: int,
    pixels: bytes,
    quality: int = 90,
    subsampling: str = "444",
) -> bytes:
    """RGB (or grayscale) pixels → PROGRESSIVE JFIF bytes (SOF2) using
    the standard spectral-selection + successive-approximation scan
    script (the libjpeg default shape: coarse DC first, low-frequency
    luma next, then chroma, then refinements — the order that makes a
    partially-fetched crawl image render as a recognizable preview).
    The quantized coefficients are EXACTLY the baseline encoder's, so
    ``decode_jpeg(progressive) == decode_jpeg(baseline)`` pixel-for-
    pixel at the same quality — the codec's exactness oracle."""
    ncomp, samp, mcux, mcuy, qtabs, coeff, grids = _prep_coefficients(
        width, height, pixels, quality, subsampling
    )
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xe0" + struct.pack(
        ">H", 16
    ) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in enumerate(qtabs[: 2 if ncomp == 3 else 1]):
        zz = q[ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + zz
    comps = b""
    for cid in range(1, ncomp + 1):
        h_i, v_i = samp[cid - 1]
        comps += bytes([cid, (h_i << 4) | v_i, 0 if cid == 1 else 1])
    out += b"\xff\xc2" + struct.pack(
        ">HBHHB", 8 + 3 * ncomp, 8, height, width, ncomp
    ) + comps
    for tc, (bits, syms) in (
        (0, (_DC_BITS, _DC_SYMBOLS)),
        (1, (_PROG_AC_BITS, _PROG_AC_SYMBOLS)),
    ):
        payload = bytes([tc << 4]) + bytes(bits) + bytes(syms)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload

    # the standard progressive scan script (libjpeg's default shape)
    if ncomp == 3:
        script = [
            ("dc", None, 0, 0, 0, 1),
            ("ac", 0, 1, 5, 0, 2),
            ("ac", 2, 1, 63, 0, 1),
            ("ac", 1, 1, 63, 0, 1),
            ("ac", 0, 6, 63, 0, 2),
            ("ac", 0, 1, 63, 2, 1),
            ("dc", None, 0, 0, 1, 0),
            ("ac", 2, 1, 63, 1, 0),
            ("ac", 1, 1, 63, 1, 0),
            ("ac", 0, 1, 63, 1, 0),
        ]
    else:
        script = [
            ("dc", None, 0, 0, 0, 1),
            ("ac", 0, 1, 63, 0, 1),
            ("dc", None, 0, 0, 1, 0),
            ("ac", 0, 1, 63, 1, 0),
        ]

    for kind, comp, ss, se, ah, al in script:
        w = _BitWriter()
        if kind == "dc":
            # interleaved DC scan over MCUs (all components)
            sos = bytes([ncomp])
            for cid in range(1, ncomp + 1):
                sos += bytes([cid, 0x00])
            sos += bytes([ss, se, (ah << 4) | al])
            out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
            if ah == 0:
                # DC uses the TWO'S-COMPLEMENT arithmetic-shift point
                # transform (T.81 G.1.2.1, libjpeg's scheme): a -1
                # shifted toward zero would become 0 and lose its sign
                # forever; arithmetic shift keeps it -1 and refinement
                # is a plain binary OR
                pred = [0] * ncomp
                for my in range(mcuy):
                    for mx in range(mcux):
                        for c in range(ncomp):
                            h_i, v_i = samp[c]
                            _gh, gw = grids[c]
                            for byy in range(v_i):
                                for bxx in range(h_i):
                                    idx = (my * v_i + byy) * gw + (
                                        mx * h_i + bxx
                                    )
                                    dc = int(coeff[c][idx][0]) >> al
                                    size, b = _magnitude(dc - pred[c])
                                    cd, ln = _DC_CODES[size]
                                    w.put(cd, ln)
                                    w.put(b, size)
                                    pred[c] = dc
            else:
                for my in range(mcuy):
                    for mx in range(mcux):
                        for c in range(ncomp):
                            h_i, v_i = samp[c]
                            _gh, gw = grids[c]
                            for byy in range(v_i):
                                for bxx in range(h_i):
                                    idx = (my * v_i + byy) * gw + (
                                        mx * h_i + bxx
                                    )
                                    dc = int(coeff[c][idx][0])
                                    w.put((dc >> al) & 1, 1)
        else:
            # single-component AC scan over the component's own
            # (non-MCU-padded) block grid
            cid = comp + 1
            sos = bytes([1, cid, 0x00, ss, se, (ah << 4) | al])
            out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
            h_i, v_i = samp[comp]
            bh, bw = _comp_block_dims(width, height, h_i, v_i, hmax, vmax)
            _gh, gw = grids[comp]
            blocks = [
                coeff[comp][by * gw + bx]
                for by in range(bh)
                for bx in range(bw)
            ]
            eob = _EobState()
            if ah == 0:
                _enc_ac_first(w, blocks, ss, se, al, eob)
            else:
                _enc_ac_refine(w, blocks, ss, se, al, eob)
            eob.flush(w)
        out += w.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _find_next_marker(data: bytes, pos: int) -> int:
    """First byte index >= pos of a real (non-stuffed, non-fill) marker."""
    while pos < len(data) - 1:
        if data[pos] == 0xFF and data[pos + 1] not in (0x00, 0xFF):
            return pos
        pos += 1
    raise ValueError("JPEG truncated: no terminating marker")


def decode_jpeg_progressive(data: bytes) -> tuple[int, int, int, bytes]:
    """Progressive JFIF bytes (SOF2) → (width, height, n_channels,
    pixels). Accumulates quantized coefficients across every scan
    (spectral-selection bands, successive-approximation first +
    refinement passes, EOBn runs with embedded correction bits), then
    runs the SAME dequantize/IDCT/upsample back half as the baseline
    decoder — a completed progressive stream of the same coefficients
    decodes to identical pixels. Streams from any encoder: tables and
    the scan script are read from the file."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    try:
        return _decode_progressive_body(data)
    except (IndexError, struct.error) as e:
        raise ValueError(f"JPEG truncated or corrupt: {e}") from e


def _decode_progressive_body(data: bytes) -> tuple[int, int, int, bytes]:
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    sof = None
    coeff: list[np.ndarray] = []
    dims: list[tuple[int, int]] = []
    restart_interval = 0
    while True:
        if pos >= len(data) - 1:
            raise ValueError("JPEG truncated before EOI")
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0xFF:  # fill byte
            pos -= 1
            continue
        if marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCB):
            raise ValueError(
                f"unsupported JPEG process SOF{marker - 0xC0}"
            )
        if marker in (0xCA,):
            raise ValueError("arithmetic coding unsupported")
        seg_len = struct.unpack_from(">H", data, pos)[0]
        seg = data[pos + 2 : pos + seg_len]
        pos += seg_len
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(seg, np.uint8, 64, p + 1).astype(
                    np.float64
                )
                nat = np.empty(64, np.float64)
                nat[ZIGZAG] = zz
                qtabs[tq] = nat
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nsym = sum(bits)
                syms = list(seg[p + 17 : p + 17 + nsym])
                huff[(tc, th)] = _HuffTable(bits, syms)
                p += 17 + nsym
        elif marker in (0xC0, 0xC2):  # SOF0 also fine: same back half
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("12-bit precision unsupported")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                h_i, v_i = hv >> 4, hv & 0x0F
                if h_i not in (1, 2) or v_i not in (1, 2):
                    raise ValueError(
                        f"sampling factors {h_i}x{v_i} unsupported"
                    )
                comps.append((cid, tq, h_i, v_i))
            sof = (w, h, comps)
            hmax = max(c[2] for c in comps)
            vmax = max(c[3] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            for _cid, _tq, h_i, v_i in comps:
                gh, gw = mcuy * v_i, mcux * h_i
                coeff.append(np.zeros((gh * gw, 64), np.int64))
                dims.append((gh, gw))
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS: decode one scan's entropy data
            if sof is None:
                raise ValueError("SOS before SOF")
            w, h, comps = sof
            ns = seg[0]
            scomps = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                ci = next(
                    i2 for i2, c in enumerate(comps) if c[0] == cs
                )
                scomps.append((ci, tdta >> 4, tdta & 0x0F))
            ss, se, a = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = a >> 4, a & 0x0F
            br = _BitReader(data, pos)
            pos = _decode_scan(
                br, data, coeff, dims, comps, scomps,
                ss, se, ah, al, huff, w, h, restart_interval,
            )
        # APPn / COM: skipped
    if sof is None:
        raise ValueError("EOI without SOF")
    w, h, comps = sof
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    full = []
    for ci, (_cid, tq, h_i, v_i) in enumerate(comps):
        gh, gw = dims[ci]
        nat = np.empty((gh * gw, 64), np.float64)
        nat[:, ZIGZAG] = coeff[ci] * qtabs[tq][ZIGZAG].reshape(1, 64)
        blocks = nat.reshape(-1, 8, 8)
        pix = (
            np.einsum("ji,njk,kl->nil", _D, blocks, _D) + 128.0
        )
        plane = (
            pix.reshape(gh, gw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(gh * 8, gw * 8)
        )
        if h_i < hmax:
            plane = np.repeat(plane, hmax // h_i, axis=1)
        if v_i < vmax:
            plane = np.repeat(plane, vmax // v_i, axis=0)
        full.append(plane[:h, :w])
    if len(comps) == 1:
        out = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return w, h, 1, out.tobytes()
    ycc = np.clip(np.rint(np.stack(full, axis=-1)), 0, 255)
    rgb = ycbcr_to_rgb(ycc)
    return w, h, 3, rgb.tobytes()


def _decode_scan(
    br, data, coeff, dims, comps, scomps,
    ss, se, ah, al, huff, w, h, restart_interval,
):
    """Decode one progressive scan's entropy data; returns the byte
    offset of the next marker."""
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    is_dc = ss == 0
    if is_dc and se != 0:
        raise ValueError("DC scan must have Se=0")
    if not is_dc and len(scomps) != 1:
        raise ValueError("progressive AC scans are single-component")
    state = {"eobrun": 0}

    def dc_first_block(ci, idx, pred, dct):
        size = dct.read(br)
        diff = _extend(br.bits(size), size) if size else 0
        pred[ci] += diff
        coeff[ci][idx][0] = pred[ci] << al
        return pred

    def dc_refine_block(ci, idx):
        # plain binary OR on the two's-complement value (Python ints OR
        # like infinite-width two's complement: -2 | 1 == -1) — the
        # exact inverse of the encoder's arithmetic-shift transform
        if br.bits(1):
            c = coeff[ci][idx]
            c[0] = int(c[0]) | (1 << al)

    def ac_first_block(blk, act):
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = ss
        while k <= se:
            rs = act.read(br)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += br.bits(r)
                break
            k += r
            if k > se:
                raise ValueError("AC run past band end")
            blk[k] = _extend(br.bits(s), s) << al
            k += 1

    def _refine_nz(blk, k):
        """Correction bit for an already-significant coefficient."""
        if br.bits(1) and (abs(int(blk[k])) & (1 << al)) == 0:
            blk[k] += (1 << al) if blk[k] > 0 else -(1 << al)

    def ac_refine_block(blk, act):
        if state["eobrun"] > 0:
            # a block fully inside an EOB run: corrections only
            for k in range(ss, se + 1):
                if blk[k] != 0:
                    _refine_nz(blk, k)
            state["eobrun"] -= 1
            return
        k = ss
        entered_eob = False
        while k <= se:
            rs = act.read(br)
            r, s = rs >> 4, rs & 0x0F
            if s == 0 and r < 15:
                # EOBn: the count covers SUBSEQUENT blocks; the CURRENT
                # block's remainder still carries its correction bits
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += br.bits(r)
                entered_eob = True
                break
            if s == 0:  # ZRL: skip 16 zero-history positions
                newval = 0
            elif s == 1:
                newval = (1 << al) if br.bits(1) else -(1 << al)
            else:
                raise ValueError("refinement size > 1")
            # advance over r zero-history positions, correcting the
            # nonzero-history ones crossed on the way
            while k <= se:
                if blk[k] != 0:
                    _refine_nz(blk, k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s == 1:
                if k > se:
                    raise ValueError("refinement run past band end")
                blk[k] = newval
            k += 1
        if entered_eob:
            while k <= se:
                if blk[k] != 0:
                    _refine_nz(blk, k)
                k += 1

    try:
        if is_dc:
            pred = [0] * len(comps)
            dct_tabs = {
                ci: huff[(0, td)] for ci, td, _ta in scomps
            } if ah == 0 else {}
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            mcu = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if (
                        restart_interval
                        and mcu
                        and mcu % restart_interval == 0
                    ):
                        br.align_restart()
                        pred = [0] * len(comps)
                    for ci, _td, _ta in scomps:
                        _cid, _tq, h_i, v_i = comps[ci]
                        _gh, gw = dims[ci]
                        for byy in range(v_i):
                            for bxx in range(h_i):
                                idx = (my * v_i + byy) * gw + (
                                    mx * h_i + bxx
                                )
                                if ah == 0:
                                    dc_first_block(
                                        ci, idx, pred, dct_tabs[ci]
                                    )
                                else:
                                    dc_refine_block(ci, idx)
                    mcu += 1
        else:
            ci, _td, ta = scomps[0]
            act = huff[(1, ta)]
            _cid, _tq, h_i, v_i = comps[ci]
            bh, bw = _comp_block_dims(w, h, h_i, v_i, hmax, vmax)
            _gh, gw = dims[ci]
            blkno = 0
            for by in range(bh):
                for bx in range(bw):
                    if (
                        restart_interval
                        and blkno
                        and blkno % restart_interval == 0
                    ):
                        br.align_restart()
                        state["eobrun"] = 0
                    blk = coeff[ci][by * gw + bx]
                    if ah == 0:
                        ac_first_block(blk, act)
                    else:
                        ac_refine_block(blk, act)
                    blkno += 1
    except _RestartMarker:
        raise ValueError("unexpected restart marker in scan")
    return _find_next_marker(data, br.pos)


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode baseline (SOF0) or progressive (SOF2) JFIF bytes —
    dispatches on the frame marker found in the stream."""
    pos = 2
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    while pos < len(data) - 1:
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xC0:
            return decode_jpeg_baseline(data)
        if marker == 0xC2:
            return decode_jpeg_progressive(data)
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        seg_len = struct.unpack_from(">H", data, pos + 2)[0]
        pos += 2 + seg_len
    raise ValueError("no SOF0/SOF2 frame found")
