"""Unit tests for the dependency-free image codecs (no Spark session) —
round-trips, all five PNG scanline filters, and corrupt-payload rejection.
The oracle-checked query multimodal_real_decode covers the Spark wiring;
these pin the byte-level behavior."""

from __future__ import annotations

import struct
import zlib

import pytest

from crocus_spark.operators import imagecodec as C


@pytest.mark.parametrize("w,h", [(1, 1), (4, 3), (16, 13), (7, 11)])
def test_roundtrip_all_formats(w, h):
    px = C.synth_pixels(w, h, seed=w * 100 + h)
    for enc in (C.encode_ppm, C.encode_bmp, C.encode_png):
        data = enc(w, h, px)
        assert C.decode_image_bytes(data) == (w, h, 3), enc.__name__


def test_pnm_comment_and_gray():
    data = b"P5\n# a comment\n3 2\n255\n" + bytes(6)
    assert C.decode_pnm(data) == (3, 2, 1)


def test_png_all_filter_types():
    # hand-build a 4x5 RGB PNG using one of each filter type per row;
    # the decoder must unfilter every row without error.
    w, h, ch = 4, 5, 3
    stride = w * ch
    raw = bytearray()
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        raw += bytes([ftype]) + bytes(
            ((y * 31 + i * 7) % 251 for i in range(stride))
        )

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert C.decode_png(data) == (w, h, ch)


def test_truncated_payloads_fail_loudly():
    px = C.synth_pixels(6, 4, seed=1)
    ppm = C.encode_ppm(6, 4, px)
    bmp = C.encode_bmp(6, 4, px)
    png = C.encode_png(6, 4, px)
    with pytest.raises(ValueError):
        C.decode_image_bytes(ppm[:-5])
    with pytest.raises(ValueError):
        C.decode_image_bytes(bmp[:-5])
    with pytest.raises(ValueError):  # CRC or chunk truncation
        C.decode_image_bytes(png[:-5])
    with pytest.raises(ValueError):
        C.decode_image_bytes(b"GIF89a not supported")


def test_png_crc_corruption_detected():
    png = bytearray(C.encode_png(5, 5, C.synth_pixels(5, 5, seed=2)))
    png[40] ^= 0xFF  # flip a byte inside IHDR/IDAT territory
    with pytest.raises(ValueError):
        C.decode_png(bytes(png))


def test_bmp_row_padding():
    # width 3 -> 9-byte rows padded to 12; decoder must demand padded size
    px = C.synth_pixels(3, 2, seed=3)
    data = C.encode_bmp(3, 2, px)
    assert C.decode_bmp(data) == (3, 2, 3)
    assert len(data) == 54 + 12 * 2


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=40),
        h=st.integers(min_value=1, max_value=30),
        seed=st.integers(min_value=0, max_value=2**31),
    )
    def test_roundtrip_property(w, h, seed):
        """Any (w, h, seed): encode→decode returns exactly (w, h, 3) for
        every codec — including the BMP row-padding edge cases (w % 4)
        and PNG single-pixel rows."""
        px = C.synth_pixels(w, h, seed)
        for enc in (C.encode_ppm, C.encode_bmp, C.encode_png):
            data = enc(w, h, px)
            assert C.decode_image_bytes(data) == (w, h, 3)

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=40),
        h=st.integers(min_value=1, max_value=30),
        ow=st.integers(min_value=1, max_value=16),
        oh=st.integers(min_value=1, max_value=12),
        seed=st.integers(min_value=0, max_value=2**31),
    )
    def test_pixel_decode_and_resize_property(w, h, ow, oh, seed):
        """Any (w, h, seed): every codec's pixel decode returns the
        EXACT original buffer (BMP's bottom-up BGR re-canonicalized, PNG
        unfiltered), and nearest-neighbor resize to any (ow, oh) equals
        the direct index-map of the original — decode and resize commute
        with encoding."""
        px = C.synth_pixels(w, h, seed)
        expect = bytes(
            px[(y * h // oh * w + x * w // ow) * 3 + c]
            for y in range(oh)
            for x in range(ow)
            for c in range(3)
        )
        for enc in (C.encode_ppm, C.encode_bmp, C.encode_png):
            got = C.decode_image_pixels(enc(w, h, px))
            assert got == (w, h, 3, px)
            assert C.resize_nearest(px, w, h, 3, ow, oh) == expect

except ImportError:  # pragma: no cover - hypothesis is in the container
    pass
