"""Baseline JPEG codec (operators/jpegcodec): round-trip error bounds
on noise, exact DC-only round-trips on block-constant images, grayscale,
entropy-layer edge cases (byte stuffing, EOB/ZRL), decode of streams
with FOREIGN Huffman tables (the decoder must honor the file's DHT, not
assume the engine's), and loud failures on unsupported JPEG processes."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from crocus_spark.operators import jpegcodec as J
from crocus_spark.operators.imagecodec import (
    decode_image_bytes,
    decode_image_pixels,
    synth_pixels,
)


def _err(a: bytes, b: bytes) -> np.ndarray:
    return np.abs(
        np.frombuffer(a, np.uint8).astype(int)
        - np.frombuffer(b, np.uint8).astype(int)
    )


def test_roundtrip_error_bounds_scale_with_quality():
    """White-noise pixels (worst case for the DCT) must round-trip
    within quantization-error bounds that tighten as quality rises —
    the property that distinguishes a working transform codec from one
    that decodes garbage of the right shape."""
    for w, h in [(8, 8), (17, 13), (31, 29), (4, 3)]:
        px = synth_pixels(w, h, w * 100 + h)
        prev_mean = None
        for q, max_bound, mean_bound in [(75, 110, 20), (90, 60, 10), (95, 40, 6)]:
            data = J.encode_jpeg_baseline(w, h, px, quality=q)
            dw, dh, dc, out = J.decode_jpeg_baseline(data)
            assert (dw, dh, dc) == (w, h, 3)
            e = _err(px, out)
            assert e.max() <= max_bound, (w, h, q, e.max())
            assert e.mean() <= mean_bound, (w, h, q, e.mean())
            if prev_mean is not None:
                assert e.mean() <= prev_mean + 1e-9
            prev_mean = e.mean()


def test_block_constant_roundtrip_is_exactly_replayable():
    """Block-constant fixtures: decoded bytes equal the closed-form
    DC-only replay EXACTLY — the property the registry query's value
    oracle pins (multimodal_jpeg_decode)."""
    for seed in range(60):
        w = 8 * (1 + seed % 3) - seed % 5
        h = 8 * (1 + seed % 2) - seed % 3
        px = J.synth_block_constant_pixels(w, h, seed)
        data = J.encode_jpeg_baseline(w, h, px, quality=90)
        dw, dh, dc, out = J.decode_jpeg_baseline(data)
        assert (dw, dh, dc) == (w, h, 3)
        arr = np.frombuffer(px, np.uint8).reshape(h, w, 3)
        exp = np.empty_like(arr)
        for by in range((h + 7) // 8):
            for bx in range((w + 7) // 8):
                exp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    J.jpeg_roundtrip_constant(
                        tuple(int(v) for v in arr[by * 8, bx * 8]), 90
                    )
                )
        assert out == exp.tobytes(), f"seed {seed} ({w}x{h})"


def test_grayscale_single_component():
    g = bytes(range(256)) * 2  # 32x16
    data = J.encode_jpeg_baseline(32, 16, g, quality=95)
    w, h, c, out = J.decode_jpeg_baseline(data)
    assert (w, h, c) == (32, 16, 1)
    assert _err(g, out).max() <= 24  # smooth ramp: small quant error


def test_byte_stuffing_roundtrip():
    """Payloads that force 0xFF bytes into the entropy stream must
    survive stuffing/unstuffing (a high-entropy image makes them
    statistically certain; assert one actually occurred)."""
    found = None
    for seed in range(300):
        px = synth_pixels(24, 24, seed)
        data = J.encode_jpeg_baseline(24, 24, px, quality=95)
        sos = data.index(b"\xff\xda")
        if b"\xff\x00" in data[sos + 2 :]:
            found = (px, data)
            break
    assert found is not None, "no seed produced a stuffed byte"
    px, data = found
    w, h, c, out = J.decode_jpeg_baseline(data)
    assert (w, h, c) == (24, 24, 3)
    assert _err(px, out).max() <= 40  # q95 bound: unstuffing was clean


def test_decoder_honors_foreign_huffman_tables():
    """Rewrite a stream's DHT to a DIFFERENT valid canonical table set
    and re-encode the entropy data under it: the decoder must produce
    identical pixels — proving it decodes from the FILE's tables, like
    any T.81 decoder, not from the engine's constants."""
    w, h = 16, 8
    px = J.synth_block_constant_pixels(w, h, 3)
    base = J.decode_jpeg_baseline(J.encode_jpeg_baseline(w, h, px, 90))

    # swap in longer fixed-length tables (DC at 5 bits, AC at 9 bits)
    dc_bits = [0] * 16
    dc_bits[4] = 12
    ac_bits = [0] * 16
    ac_bits[8] = 162
    orig = (J._DC_BITS, J._AC_BITS, J._DC_CODES, J._AC_CODES)
    try:
        J._DC_BITS, J._AC_BITS = dc_bits, ac_bits
        J._DC_CODES = J._canonical_codes(dc_bits, J._DC_SYMBOLS)
        J._AC_CODES = J._canonical_codes(ac_bits, J._AC_SYMBOLS)
        alt = J.encode_jpeg_baseline(w, h, px, 90)
    finally:
        J._DC_BITS, J._AC_BITS, J._DC_CODES, J._AC_CODES = orig
    assert alt != J.encode_jpeg_baseline(w, h, px, 90)
    assert J.decode_jpeg_baseline(alt) == base


def test_unsupported_processes_fail_loudly():
    px = synth_pixels(8, 8, 1)
    data = bytearray(J.encode_jpeg_baseline(8, 8, px, 90))
    sof = data.index(b"\xff\xc0")
    data[sof + 1] = 0xC2  # pretend progressive
    with pytest.raises(ValueError, match="SOF2"):
        J.decode_jpeg_baseline(bytes(data))
    with pytest.raises(ValueError, match="SOI"):
        J.decode_jpeg_baseline(b"not a jpeg")
    # sampling factors beyond 2 per axis: patch the SOF sampling byte
    data = bytearray(J.encode_jpeg_baseline(8, 8, px, 90))
    sof = data.index(b"\xff\xc0")
    data[sof + 11] = 0x33  # component 1: 3x3 sampling
    with pytest.raises(ValueError, match="sampling factors"):
        J.decode_jpeg_baseline(bytes(data))


def test_quality_must_be_valid():
    with pytest.raises(ValueError, match="quality"):
        J.encode_jpeg_baseline(8, 8, synth_pixels(8, 8, 1), quality=0)
    with pytest.raises(ValueError, match="size mismatch"):
        J.encode_jpeg_baseline(8, 8, b"short")


def test_image_dispatch_sniffs_jpeg():
    """decode_image_bytes / decode_image_pixels route JPEG magic to the
    baseline decoder — the §2B#60 decode seam gains the format without
    any query-side change."""
    px = J.synth_block_constant_pixels(12, 10, 5)
    data = J.encode_jpeg_baseline(12, 10, px, quality=90)
    assert decode_image_bytes(data) == (12, 10, 3)
    w, h, c, out = decode_image_pixels(data)
    assert (w, h, c) == (12, 10, 3)
    assert len(out) == 12 * 10 * 3


def test_phash_matches_across_jpeg_and_png():
    """Perceptual dedup across lossy/lossless containers: the SAME
    pattern encoded as PNG (lossless) and as high-quality JPEG must
    land within a small aHash Hamming distance — byte dedup can never
    pair them (different bytes), pHash does (r9 verdict task #5)."""
    from crocus_spark.operators.imagecodec import encode_png

    def ahash(data: bytes) -> int:
        # the aHash of operators/multimodal.perceptual_hash_batch
        w, h, ch, px = decode_image_pixels(data)
        grays = []
        for ty in range(8):
            sy = ty * h // 8
            for tx in range(8):
                sx = tx * w // 8
                i = (sy * w + sx) * ch
                grays.append((px[i] + px[i + 1] + px[i + 2]) // 3)
        mean = sum(grays) // 64
        return sum(1 << i for i, g in enumerate(grays) if g > mean)

    for seed in (1, 2, 9):
        w, h = 16, 16
        px = J.synth_block_constant_pixels(w, h, seed)
        png = encode_png(w, h, px)
        jpg = J.encode_jpeg_baseline(w, h, px, quality=95)
        hp, hj = ahash(png), ahash(jpg)
        assert bin(hp ^ hj).count("1") <= 4, (seed, hex(hp), hex(hj))


def test_restart_markers_decode():
    """A stream with DRI/RSTn markers (hand-assembled: our encoder does
    not emit them) must decode with predictor resets at each interval."""
    w, h = 24, 8  # 3 MCUs
    px = J.synth_block_constant_pixels(w, h, 11)
    base = J.encode_jpeg_baseline(w, h, px, quality=90)
    want = J.decode_jpeg_baseline(base)

    # re-encode by hand with restart_interval=1
    ql, qc = J.quant_tables(90)
    arr = np.frombuffer(px, np.uint8).reshape(h, w, 3)
    ycc = J.rgb_to_ycbcr(arr)
    planes = [ycc[..., i] for i in range(3)]
    blocks = [J._blocks_of(p) for p in planes]
    quant = [ql, qc, qc]
    coeff = []
    for bi, q in zip(blocks, quant):
        f = np.einsum("ij,njk,lk->nil", J._D, bi - 128.0, J._D)
        qz = np.rint(f.reshape(-1, 64) / q.reshape(1, 64))
        coeff.append(qz[:, J.ZIGZAG].astype(np.int64))
    sos = base.index(b"\xff\xda")
    sos_len = struct.unpack_from(">H", base, sos + 2)[0]
    head = bytearray(base[: sos + 4 + sos_len - 2])
    # insert DRI before SOS
    dri = b"\xff\xdd" + struct.pack(">HH", 4, 1)
    head[sos:sos] = dri
    entropy = bytearray()
    for m in range(blocks[0].shape[0]):
        wtr = J._BitWriter()
        pred = [0, 0, 0]  # reset at every restart interval
        for c in range(3):
            J._encode_component(wtr, coeff[c][m], pred[c])
        entropy += wtr.flush()
        if m < blocks[0].shape[0] - 1:
            entropy += bytes([0xFF, 0xD0 + (m % 8)])
    data = bytes(head) + bytes(entropy) + b"\xff\xd9"
    assert J.decode_jpeg_baseline(data) == want


def test_chroma_420_roundtrip():
    """4:2:0 (the dominant real-world crawl shape): MCUs carry 4 Y
    blocks + downsampled Cb/Cr. Smooth gradients round-trip tightly;
    constant images are near-exact (a 2x2 mean of a constant is the
    constant); on noise, LUMA stays tight while chroma detail is
    discarded BY DESIGN — the test bounds Y, not RGB."""
    for w, h in [(16, 16), (17, 13), (33, 31), (8, 8)]:
        y, x = np.mgrid[0:h, 0:w]
        rgb = np.stack(
            [
                x * 255 // max(w - 1, 1),
                y * 255 // max(h - 1, 1),
                (x + y) * 255 // max(w + h - 2, 1),
            ],
            axis=-1,
        ).astype(np.uint8)
        px = rgb.tobytes()
        data = J.encode_jpeg_baseline(w, h, px, 95, subsampling="420")
        dw, dh, dc, out = J.decode_jpeg_baseline(data)
        assert (dw, dh, dc) == (w, h, 3)
        assert _err(px, out).max() <= 32, (w, h)
    # constant color survives the chroma downsample near-exactly
    px = bytes([90, 170, 40]) * (24 * 16)
    data = J.encode_jpeg_baseline(24, 16, px, 90, subsampling="420")
    assert _err(px, J.decode_jpeg_baseline(data)[3]).max() <= 1
    # noise: luma plane must stay as tight as 4:4:4 even though chroma
    # detail is (correctly) gone
    px = synth_pixels(32, 24, 5)
    data = J.encode_jpeg_baseline(32, 24, px, 95, subsampling="420")
    out = J.decode_jpeg_baseline(data)[3]

    def luma(buf):
        a = np.frombuffer(buf, np.uint8).reshape(-1, 3).astype(np.float64)
        return 0.299 * a[:, 0] + 0.587 * a[:, 1] + 0.114 * a[:, 2]

    assert np.abs(luma(px) - luma(out)).max() <= 40
    # 4:2:0 streams are smaller than 4:4:4 on real-sized images
    y, x = np.mgrid[0:64, 0:64]
    big = np.stack([x * 4, y * 4, (x + y) * 2], axis=-1).astype(np.uint8)
    d420 = J.encode_jpeg_baseline(64, 64, big.tobytes(), 90, subsampling="420")
    d444 = J.encode_jpeg_baseline(64, 64, big.tobytes(), 90)
    assert len(d420) < len(d444)
    with pytest.raises(ValueError, match="subsampling"):
        J.encode_jpeg_baseline(8, 8, synth_pixels(8, 8, 1), 90, subsampling="422")


def test_420_multi_mcu_dc_prediction_chains():
    """Multi-MCU 4:2:0: the DC predictor chains across MCUs per
    component and the 4-Y-block interleave order is right — a swap
    anywhere shows up as gross block-level error on a smooth ramp."""
    w, h = 48, 32  # 3x2 MCUs of 16x16
    yx, xx = np.mgrid[0:h, 0:w]
    rgb = np.stack([xx * 5, yx * 7, (xx + yx) * 3], axis=-1).astype(
        np.uint8
    )
    px = rgb.tobytes()
    data = J.encode_jpeg_baseline(w, h, px, 95, subsampling="420")
    dw, dh, dc, out = J.decode_jpeg_baseline(data)
    assert (dw, dh, dc) == (w, h, 3)
    assert _err(px, out).max() <= 24  # smooth ramp: tight everywhere


def test_truncated_streams_fail_loudly_never_hang():
    """Every strict prefix of a valid stream must raise (ValueError /
    IndexError / struct.error) — a decoder that silently returns
    dimensions for half a scan is the failure mode that poisons a
    100 TB ingest. Sampled cuts keep the loop fast; marker boundaries
    and the entropy tail are the interesting offsets."""
    px = J.synth_block_constant_pixels(16, 16, 3)
    data = J.encode_jpeg_baseline(16, 16, px, quality=90)
    ok = J.decode_jpeg_baseline(data)
    assert ok[:3] == (16, 16, 3)
    # cuts into the headers or the entropy body must raise; only the
    # final EOI marker itself is decode-optional (all MCUs already
    # consumed), so stop 2 bytes short of the end
    cuts = set(range(0, 32)) | {
        len(data) - k for k in range(3, 26)
    } | set(range(32, len(data) - 2, 37))
    for cut in sorted(c for c in cuts if 0 <= c < len(data) - 2):
        with pytest.raises((ValueError, IndexError, struct.error)):
            J.decode_jpeg_baseline(data[:cut])


# ---------------------------------------------------------------------------
# progressive (SOF2) — r11
# ---------------------------------------------------------------------------


def test_progressive_equals_baseline_across_shapes():
    """The progressive encoder carries the SAME quantized coefficients
    as baseline split across scans, so a completed progressive stream
    decodes bit-identically — RGB 4:4:4 and 4:2:0, grayscale, odd
    sizes, low/high quality (low quality = sparse AC = EOBRUN-heavy)."""
    import numpy as np

    rng = np.random.default_rng(42)
    for w, h, q, sub, gray in [
        (32, 24, 30, "444", False),
        (17, 9, 85, "444", False),
        (40, 33, 95, "444", False),
        (19, 11, 85, "420", False),
        (33, 17, 50, "420", False),
        (13, 21, 80, "444", True),
    ]:
        if gray:
            px = rng.integers(0, 256, (h, w), dtype=np.uint8).tobytes()
            base = J.encode_jpeg_baseline(w, h, px, q)
            prog = J.encode_jpeg_progressive(w, h, px, q)
        else:
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8).tobytes()
            base = J.encode_jpeg_baseline(w, h, px, q, subsampling=sub)
            prog = J.encode_jpeg_progressive(w, h, px, q, subsampling=sub)
        assert prog[3] == 0xC2 or b"\xff\xc2" in prog  # really SOF2
        assert J.decode_jpeg(base) == J.decode_jpeg(prog), (w, h, q, sub)


def test_progressive_dc_negative_one_keeps_sign():
    """The DC point transform must be the two's-complement arithmetic
    shift: a DC of -1 under a magnitude shift becomes 0 in the first
    scan and the refinement bit can never restore its sign (the r11
    bug the coefficient-exactness fuzz caught). A near-mid-gray image
    produces exactly those -1/+1 DC values."""
    import numpy as np

    rng = np.random.default_rng(9)
    # values a hair below the 128 level-shift → quantized DC of -1/0/+1
    px = (127 + rng.integers(-2, 3, (24, 32, 3))).astype(np.uint8).tobytes()
    base = J.encode_jpeg_baseline(32, 24, px, 30)
    prog = J.encode_jpeg_progressive(32, 24, px, 30)
    assert J.decode_jpeg(base) == J.decode_jpeg(prog)


def test_progressive_truncation_fails_loudly():
    """A truncated progressive stream raises instead of returning
    partial pixels silently (same contract as the baseline decoder)."""
    import numpy as np

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8).tobytes()
    prog = J.encode_jpeg_progressive(32, 24, px, 85)
    for cut in (len(prog) // 3, len(prog) // 2, len(prog) - 3):
        with pytest.raises(ValueError):
            J.decode_jpeg(prog[:cut])


def test_progressive_rejects_unsupported_processes():
    """decode_jpeg_progressive keeps the fail-loudly contract for
    arithmetic coding and other SOF processes."""
    import struct

    import numpy as np

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8).tobytes()
    prog = bytearray(J.encode_jpeg_progressive(8, 8, px, 85))
    i = prog.index(b"\xff\xc2")
    prog[i + 1] = 0xCA  # SOF10: arithmetic progressive
    with pytest.raises(ValueError, match="arithmetic"):
        J.decode_jpeg_progressive(bytes(prog))
    # 12-bit precision refused
    prog2 = bytearray(J.encode_jpeg_progressive(8, 8, px, 85))
    i = prog2.index(b"\xff\xc2")
    seglen = struct.unpack_from(">H", prog2, i + 2)[0]
    assert prog2[i + 4] == 8  # precision byte
    prog2[i + 4] = 12
    with pytest.raises(ValueError, match="12-bit"):
        J.decode_jpeg_progressive(bytes(prog2))


def test_decode_jpeg_dispatches_on_frame_marker():
    import numpy as np

    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8).tobytes()
    base = J.encode_jpeg_baseline(16, 16, px, 85)
    prog = J.encode_jpeg_progressive(16, 16, px, 85)
    assert b"\xff\xc0" in base and b"\xff\xc2" in prog
    assert J.decode_jpeg(base) == J.decode_jpeg_baseline(base)
    assert J.decode_jpeg(prog) == J.decode_jpeg_progressive(prog)
    with pytest.raises(ValueError, match="not a JPEG"):
        J.decode_jpeg(b"\x00\x01")
