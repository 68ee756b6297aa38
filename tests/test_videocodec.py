"""Round-trip proofs for the stdlib RIFF/AVI codec (operators/videocodec):
decode(encode(frames)) must reproduce the input pixels exactly — the
property that lets multimodal_video_frames carry a full value oracle
computed from the source pattern (the pdfcodec discipline applied to
video)."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crocus_spark.operators.videocodec import (
    VIDEO_H,
    VIDEO_W,
    decode_avi_frames,
    encode_avi,
    parse_avi,
    synth_frame,
    synth_video_params,
)


def _frames(n, w, h, seed=0):
    return [
        bytes((seed + f * 31 + i * 7) % 256 for i in range(3 * w * h))
        for f in range(n)
    ]


def test_roundtrip_basic():
    frames = _frames(3, 16, 12)
    avi = encode_avi(frames, 16, 12, 25)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    meta = parse_avi(avi)
    assert (meta["width"], meta["height"], meta["fps"]) == (16, 12, 25)
    assert meta["n_frames"] == 3 and meta["handler"] == "DIB "
    assert [rgb for _, _, _, rgb in decode_avi_frames(avi)] == frames


def test_roundtrip_padded_row_widths():
    # widths whose 3w is not a multiple of 4 exercise DIB row padding;
    # a padding byte misread as a pixel flips the decoded buffer
    for w, h in ((5, 3), (7, 2), (1, 1), (2, 4)):
        frames = _frames(2, w, h, seed=w * h)
        assert [
            rgb for _, _, _, rgb in decode_avi_frames(encode_avi(frames, w, h, 10))
        ] == frames


def test_encode_deterministic():
    frames = _frames(2, 16, 12)
    assert encode_avi(frames, 16, 12, 30) == encode_avi(frames, 16, 12, 30)


def test_every_parameter_samples_frames():
    frames = _frames(5, 4, 4)
    avi = encode_avi(frames, 4, 4, 10)
    got = list(decode_avi_frames(avi, every=2))
    assert [i for i, *_ in got] == [0, 2, 4]
    assert [rgb for *_, rgb in got] == [frames[0], frames[2], frames[4]]


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(1, 6),
    w=st.integers(1, 9),
    h=st.integers(1, 7),
    fps=st.integers(1, 60),
    seed=st.integers(0, 255),
)
def test_roundtrip_property(n, w, h, fps, seed):
    frames = _frames(n, w, h, seed)
    avi = encode_avi(frames, w, h, fps)
    meta = parse_avi(avi)
    assert (meta["n_frames"], meta["fps"]) == (n, fps)
    assert [rgb for _, _, _, rgb in decode_avi_frames(avi)] == frames


def test_frame_count_mismatch_fails_loud():
    avi = bytearray(encode_avi(_frames(3, 4, 4), 4, 4, 10))
    # corrupt avih.dwTotalFrames (avih body starts after RIFF(12) +
    # LIST hdr(12) + 'avih' chunk hdr(8); dwTotalFrames at body+16)
    off = 12 + 12 + 8 + 16
    assert struct.unpack_from("<I", avi, off)[0] == 3
    struct.pack_into("<I", avi, off, 4)
    with pytest.raises(ValueError, match="frame count mismatch"):
        parse_avi(bytes(avi))


def test_idx1_mismatch_fails_loud():
    avi = bytearray(encode_avi(_frames(2, 4, 4), 4, 4, 10))
    # truncate the idx1 chunk to one entry by shrinking its size field
    pos = bytes(avi).rfind(b"idx1")
    (size,) = struct.unpack_from("<I", avi, pos + 4)
    assert size == 32
    struct.pack_into("<I", avi, pos + 4, 16)
    with pytest.raises(ValueError, match="index mismatch"):
        parse_avi(bytes(avi[: pos + 8 + 16]))


def test_not_an_avi_rejected():
    with pytest.raises(ValueError, match="RIFF signature"):
        parse_avi(b"\x89PNG\r\n\x1a\nnot a riff file at all....")
    with pytest.raises(ValueError, match="RIFF signature"):
        parse_avi(b"RIFF\x04\x00\x00\x00WAVE")


def test_non_dib_handler_rejected_at_decode():
    avi = bytearray(encode_avi(_frames(1, 4, 4), 4, 4, 10))
    pos = bytes(avi).find(b"DIB ")
    avi[pos : pos + 4] = b"MJPG"
    meta = parse_avi(bytes(avi))  # demux still works — byte ranges
    assert meta["handler"] == "MJPG" and len(meta["frames"]) == 1
    with pytest.raises(ValueError, match="unsupported frame codec"):
        list(decode_avi_frames(bytes(avi)))


def test_synth_pattern_matches_closed_form():
    """The oracle's closed form (base·Σw + 3·Σwx + 5·Σwy) must equal
    the weighted sum over ACTUALLY DECODED pixels — computed here
    independently of both the oracle SQL and the query plumbing."""
    from crocus_spark.operators.videocodec import (
        _CHANNEL_OFF,
        _weight_constants,
    )

    s1, sx, sy = _weight_constants()
    for vid in (0, 7, 149, 1234):
        n_frames, fps = synth_video_params(vid)
        frames = [synth_frame(vid, f) for f in range(n_frames)]
        avi = encode_avi(frames, VIDEO_W, VIDEO_H, fps)
        for f, w, h, rgb in decode_avi_frames(avi):
            for c, off in enumerate(_CHANNEL_OFF):
                got = sum(
                    (1 + x + w * y) * rgb[3 * (y * w + x) + c]
                    for y in range(h)
                    for x in range(w)
                )
                base = (vid * 3 + f * 7 + off) % 150
                assert got == base * s1 + 3 * sx + 5 * sy, (vid, f, c)


# ---------------------------------------------------------------------------
# BI_RLE8 compressed path (r9): runs, escapes, palette, round trip
# ---------------------------------------------------------------------------


def test_rle8_roundtrip_and_compression():
    from crocus_spark.operators.videocodec import (
        decode_avi_frames as dec,
        encode_avi_rle8,
        rle_palette,
        synth_rle_indices,
    )

    pal = rle_palette()
    for vid in (0, 7, 123, 149):
        n_frames, fps = synth_video_params(vid)
        frames = [synth_rle_indices(vid, f) for f in range(n_frames)]
        avi = encode_avi_rle8(frames, VIDEO_W, VIDEO_H, fps, pal)
        meta = parse_avi(avi)
        assert meta["handler"] == "mrle"
        assert meta["compression"] == 1 and meta["bit_count"] == 8
        assert meta["n_frames"] == n_frames and meta["fps"] == fps
        got = list(dec(avi))
        assert [g[0] for g in got] == list(range(n_frames))
        for f, (_i, w, h, rgb) in enumerate(got):
            exp = bytearray()
            for v in frames[f]:
                exp += bytes((v, min(v + 6, 255), 255 - v))
            assert rgb == bytes(exp)
        # genuinely compressed: every chunk beats the raw 8bpp size
        assert all(s < VIDEO_W * VIDEO_H for _o, s in meta["frames"])


@given(
    st.integers(2, 12),
    st.integers(2, 10),
    st.integers(0, 2**31 - 1),
)
@settings(max_examples=30, deadline=None)
def test_rle8_roundtrip_property(w, h, seed):
    """encode->decode is the identity for arbitrary index buffers
    (including run-free high-entropy rows and constant rows)."""
    from crocus_spark.operators.videocodec import decode_rle8, encode_rle8

    buf = bytes((seed + 17 * i + (i * i) // 3) % 251 for i in range(w * h))
    assert decode_rle8(encode_rle8(buf, w, h), w, h) == buf
    flat = bytes([seed % 256]) * (w * h)
    enc = encode_rle8(flat, w, h)
    assert decode_rle8(enc, w, h) == flat
    assert len(enc) <= h * (2 * -(-w // 255) + 2) + 2  # maximal runs


def test_rle8_decoder_full_escape_set():
    """Absolute mode (word-aligned), delta skips (index 0), EOL, EOB —
    the escapes the compact encoder never emits still decode, because
    real mrle writers use them."""
    from crocus_spark.operators.videocodec import decode_rle8

    w, h = 8, 2
    stream = bytes(
        [0, 5, 1, 2, 3, 4, 5, 0,    # abs mode: 5 literals + pad byte
         3, 9,                      # run of 3 nines
         0, 0,                      # end of line
         0, 2, 2, 0,                # delta: skip dx=2 (zeros)
         2, 7,                      # run of 2 sevens
         0, 1]                      # end of bitmap
    )
    out = decode_rle8(stream, w, h)
    assert out[w:] == bytes([1, 2, 3, 4, 5, 9, 9, 9])   # bottom row
    assert out[:w] == bytes([0, 0, 7, 7, 0, 0, 0, 0])   # top row


def test_rle8_fail_loud_on_torn_streams():
    from crocus_spark.operators.videocodec import decode_rle8

    with pytest.raises(ValueError, match="end-of-bitmap"):
        decode_rle8(bytes([2, 5, 0, 0]), 4, 2)  # no EOB
    with pytest.raises(ValueError, match="overruns"):
        decode_rle8(bytes([6, 1, 0, 1]), 4, 2)  # run wider than row
    with pytest.raises(ValueError, match="truncated"):
        decode_rle8(bytes([0, 4, 1, 2]), 4, 2)  # absolute run cut off
    with pytest.raises(ValueError, match="without a palette"):
        # an RLE stream whose strf palette was stripped
        from crocus_spark.operators.videocodec import (
            decode_avi_frames as dec,
            encode_avi_rle8,
            rle_palette,
        )

        avi = bytearray(
            encode_avi_rle8([bytes(16)], 4, 4, 10, rle_palette())
        )
        pos = bytes(avi).find(struct.pack("<H", 8), 0)  # biBitCount=8
        # zero biClrUsed AND truncate: simplest legal strip is flipping
        # bit count to 24 so the parser records no palette
        avi[pos : pos + 2] = struct.pack("<H", 24)
        list(dec(bytes(avi)))
