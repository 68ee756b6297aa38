"""GIF87a/89a codec (operators/gifcodec): lossless round trips (plain,
interlaced, animated, LZW-reset-sized frames), sub-block fragmentation,
metadata parse, frame sampling, dispatch, and loud failures on
malformed/truncated streams."""

from __future__ import annotations

import random
import struct as _struct

import pytest

from crocus_spark.operators import gifcodec as G
from crocus_spark.operators.imagecodec import (
    decode_image_bytes,
    decode_image_pixels,
)


def _rgb_of(pal: bytes, idx: bytes) -> bytes:
    out = bytearray()
    for ci in idx:
        out += pal[3 * ci : 3 * ci + 3]
    return bytes(out)


def test_lossless_roundtrip_plain_interlaced_animated():
    for seed in range(24):
        w, h, nf = 5 + seed % 13, 4 + seed % 9, 1 + seed % 4
        pal, frames = G.synth_palette_frames(w, h, nf, seed)
        for inter in (False, True):
            data = G.encode_gif(w, h, pal, frames, interlace=inter)
            got = list(G.decode_gif_frames(data))
            assert len(got) == nf
            for fi, (idx, dw, dh, rgb) in enumerate(got):
                assert (idx, dw, dh) == (fi, w, h)
                assert rgb == _rgb_of(pal, frames[fi]), (seed, inter, fi)


def test_lzw_dictionary_reset_and_subblock_fragmentation():
    """A 10k+-pixel random frame forces both a 4096-entry dictionary
    reset mid-stream AND multiple 255-byte sub-blocks; the round trip
    stays byte-exact."""
    rnd = random.Random(11)
    w, h = 110, 95
    pal, _ = G.synth_palette_frames(4, 4, 1, 1)
    big = bytes(rnd.randrange(16) for _ in range(w * h))
    data = G.encode_gif(w, h, pal, [big])
    # sub-block framing really fragmented
    meta = G.parse_gif(data)
    assert len(meta["frames"][0]["lzw"]) > 255
    _i, dw, dh, rgb = next(G.decode_gif_frames(data))
    assert (dw, dh) == (w, h)
    assert rgb == _rgb_of(pal, big)


def test_parse_metadata_and_frame_sampling():
    pal, frames = G.synth_palette_frames(9, 7, 4, 5)
    data = G.encode_gif(9, 7, pal, frames)
    meta = G.parse_gif(data)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (9, 7, 4)
    assert meta["palette"] == pal
    # every=2 yields frames 0 and 2 (composition still walks them all)
    got = [i for i, *_ in G.decode_gif_frames(data, every=2)]
    assert got == [0, 2]


def test_dispatch_sniffs_gif():
    pal, frames = G.synth_palette_frames(8, 6, 1, 2)
    data = G.encode_gif(8, 6, pal, frames)
    assert decode_image_bytes(data) == (8, 6, 3)
    w, h, c, rgb = decode_image_pixels(data)
    assert (w, h, c) == (8, 6, 3)
    assert rgb == _rgb_of(pal, frames[0])


def test_malformed_streams_fail_loudly():
    pal, frames = G.synth_palette_frames(8, 6, 1, 3)
    data = G.encode_gif(8, 6, pal, frames)
    with pytest.raises(ValueError, match="not a GIF"):
        G.parse_gif(b"PNG....")
    with pytest.raises(ValueError, match="palette size"):
        G.encode_gif(8, 6, b"\x00" * 9, frames)  # 3 colors: not a power of 2
    with pytest.raises(ValueError, match="size mismatch"):
        G.encode_gif(8, 6, pal, [frames[0][:-1]])
    with pytest.raises(ValueError, match="outside the palette"):
        G.encode_gif(2, 1, pal[: 3 * 4], [bytes([9, 1])])
    # truncations raise, never hang or return a short frame
    for cut in list(range(0, 30)) + list(range(30, len(data) - 1, 17)):
        with pytest.raises((ValueError, IndexError, _struct.error)):
            list(G.decode_gif_frames(data[:cut]))
    # corrupt LZW: an out-of-range code is rejected
    meta = G.parse_gif(data)
    off = meta["frames"][0]["offset"]
    bad = bytearray(data)
    bad[off + 1] ^= 0xFF  # mangle the first LZW byte
    with pytest.raises(ValueError):
        list(G.decode_gif_frames(bytes(bad)))


def test_partial_canvas_frames_compose():
    """A frame smaller than the canvas composes onto the previous
    content at its (left, top) — the animated-GIF delta-frame shape."""
    import struct

    pal, frames = G.synth_palette_frames(10, 8, 1, 7)
    base = G.encode_gif(10, 8, pal, frames)
    # append a hand-built 4x3 sub-frame at (2, 1) painting index 5
    sub = bytes([5]) * 12
    body = bytearray(base[:-1])  # drop trailer
    body += b"\x21\xf9" + struct.pack("<BBHBB", 4, 0x04, 4, 0, 0)
    body += b"\x2c" + struct.pack("<HHHHB", 2, 1, 4, 3, 0)
    body.append(4)  # LZW min code size: the global palette has 16 entries
    lzw = G._pack_lzw(sub, 4)
    body.append(len(lzw))
    body += lzw
    body.append(0)
    body += b"\x3b"
    got = list(G.decode_gif_frames(bytes(body)))
    assert len(got) == 2
    _, w, h, rgb0 = got[0]
    _, _, _, rgb1 = got[1]
    exp = bytearray(rgb0)
    for y in range(3):
        for x in range(4):
            p = ((1 + y) * 10 + (2 + x)) * 3
            exp[p : p + 3] = pal[15:18]  # index 5
    assert rgb1 == bytes(exp)


def test_partial_frame_palette_switch_fails_loudly():
    """r10 ADVICE #4: a PARTIAL frame whose local color table differs
    from the palette the composed canvas was drawn with must raise —
    the canvas stores indices, so rendering it with the new palette
    would silently recolor previously-composed pixels. A FULL-canvas
    frame may switch palettes (it overwrites every pixel)."""
    import struct

    pal, frames = G.synth_palette_frames(10, 8, 1, 7)
    base = G.encode_gif(10, 8, pal, frames)

    def with_subframe(lct: bytes | None, full: bool):
        sub_w, sub_h = (10, 8) if full else (4, 3)
        left, top = (0, 0) if full else (2, 1)
        sub = bytes([1]) * (sub_w * sub_h)
        body = bytearray(base[:-1])
        body += b"\x21\xf9" + struct.pack("<BBHBB", 4, 0x04, 4, 0, 0)
        iflags = 0
        if lct is not None:
            n = len(lct) // 3
            iflags = 0x80 | (n.bit_length() - 2)
        body += b"\x2c" + struct.pack(
            "<HHHHB", left, top, sub_w, sub_h, iflags
        )
        if lct is not None:
            body += lct
        depth = 2 if lct is not None else 4
        body.append(depth)
        lzw = G._pack_lzw(sub, depth)
        body.append(len(lzw))
        body += lzw
        body.append(0)
        body += b"\x3b"
        return bytes(body)

    other = bytes(range(12))  # 4-entry local palette, differs from pal
    with pytest.raises(ValueError, match="color table differing"):
        list(G.decode_gif_frames(with_subframe(other, full=False)))
    # identical LCT bytes on a partial frame stay fine
    same = with_subframe(None, full=False)
    assert len(list(G.decode_gif_frames(same))) == 2
    # a FULL-canvas palette switch is allowed and renders with the
    # new palette
    pal2 = bytes([255 - b for b in other])
    got = list(G.decode_gif_frames(with_subframe(pal2, full=True)))
    assert got[-1][3][:3] == pal2[3:6]  # index 1 under the new palette
