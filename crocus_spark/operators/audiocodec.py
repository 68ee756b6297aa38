"""Minimal RIFF/WAVE audio codec — stdlib-only, sharing the RIFF chunk
machinery with the AVI codec (operators/videocodec).

The reference's multimodal payloads are provider documents
(``ishares.json:9-10``); audio is the same binary-column contract at
sample granularity. ``chunk_audio`` (operators/multimodal) remains the
format-agnostic byte-window fallback; this module supplies the REAL
container path: a deterministic PCM writer and a fail-loud parser, so
windowing happens over decoded SAMPLES (the unit real feature
extraction uses), not raw container bytes.

- ``encode_wav(samples, sample_rate)``: canonical 16-bit PCM mono WAV
  (RIFF('WAVE' fmt data)), byte-stable for a given input.
- ``parse_wav(data)``: header fields + the data chunk's byte range;
  validates the RIFF/WAVE signature, requires a PCM fmt chunk, and
  errors on truncated data (fail-loud, never silently short).
- ``decode_wav_samples(data)``: the int16 sample sequence.

Like the PDF and AVI codecs, writer/reader form a round-trip proof
(tests/test_audiocodec.py), which is what lets the Spark query carry a
full value oracle computed from the source waveform.
"""

from __future__ import annotations

import struct

from crocus_spark.operators.videocodec import _chunk, _walk_chunks


def encode_wav(
    samples: list[int], sample_rate: int, channels: int = 1
) -> bytes:
    """Serialize int16 samples into a PCM WAV. Deterministic bytes."""
    if channels < 1:
        raise ValueError("channels must be >= 1")
    bits = 16
    block_align = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH",
        1,                        # PCM
        channels,
        sample_rate,
        sample_rate * block_align,  # byte rate
        block_align,
        bits,
    )
    data = struct.pack("<%dh" % len(samples), *samples)
    body = b"WAVE" + _chunk(b"fmt ", fmt) + _chunk(b"data", data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav(data: bytes) -> dict:
    """Demux a WAV: ``{"sample_rate", "channels", "bits", "n_samples",
    "data_off", "data_size"}``. Fail-loud on a non-RIFF/WAVE buffer, a
    missing or non-PCM fmt chunk, or a data chunk that runs past the
    buffer."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (RIFF/WAVE signature mismatch)")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(8 + riff_size, len(data))
    fmt = None
    data_rng = None
    for fourcc, body, size in _walk_chunks(data, 12, end):
        if fourcc == b"fmt " and size >= 16:
            fmt = struct.unpack_from("<HHIIHH", data, body)
        elif fourcc == b"data":
            data_rng = (body, size)
    if fmt is None:
        raise ValueError("missing fmt chunk")
    if fmt[0] != 1:
        raise ValueError(f"unsupported (non-PCM) audio format {fmt[0]}")
    if data_rng is None:
        raise ValueError("missing data chunk")
    channels, rate, bits = fmt[1], fmt[2], fmt[5]
    if bits != 16:
        raise ValueError(f"unsupported bit depth {bits}")
    block = channels * 2
    if data_rng[1] % block:
        raise ValueError("data chunk size not sample-aligned")
    return {
        "sample_rate": int(rate),
        "channels": int(channels),
        "bits": int(bits),
        "n_samples": data_rng[1] // block,
        "data_off": data_rng[0],
        "data_size": data_rng[1],
    }


def decode_wav_samples(data: bytes):
    """int16 samples (channel-interleaved) as a list."""
    meta = parse_wav(data)
    off, size = meta["data_off"], meta["data_size"]
    return list(struct.unpack_from("<%dh" % (size // 2), data, off))


# ---------------------------------------------------------------------------
# Spark plumbing (Arrow-batched; WAV bytes never visit the driver)
# ---------------------------------------------------------------------------

# Synthetic-waveform contract (shared with the SQL oracle): sample i of
# audio id is  ((id*7 + i*13) % 2001) - 1000  — integer-exact in both
# engines; n_samples and sample_rate derive from id so header fields
# verify too.
def synth_audio_params(aid: int) -> tuple[int, int]:
    """(n_samples, sample_rate) for synthetic audio ``aid``."""
    return 256 + (aid % 7) * 64, 8000 + (aid % 3) * 4000


def synth_wav_table(df, id_col: str):
    """(id, audio binary): deterministic synthetic PCM WAVs through the
    real writer inside an Arrow batch loop (same fixture discipline as
    the PDF and AVI columns)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.BinaryType())
    def encode(ids):
        out = []
        for i in ids:
            aid = int(i)
            n, rate = synth_audio_params(aid)
            idx = np.arange(n, dtype=np.int64)
            samples = ((aid * 7 + idx * 13) % 2001 - 1000).astype(np.int16)
            out.append(encode_wav(samples.tolist(), rate))
        return pd.Series(out)

    return df.select(F.col(id_col), encode(F.col(id_col)).alias("audio"))


AUDIO_WINDOW_SCHEMA = (
    "doc_id long, win int, sample_rate int, n_samples int, "
    "win_n int, sum_s long, min_s int, max_s int"
)


def extract_wav_windows(media, window: int = 160,
                        id_col: str = "media_id",
                        content_col: str = "content"):
    """Demux + decode each WAV and window the SAMPLES into fixed-length
    windows via mapInPandas: one row per (audio, window) with the header
    fields and integer-exact window stats (sum/min/max over decoded
    int16 samples — order-free and engine-portable, unlike float RMS).
    Arrow-batched; sample bytes stay executor-side. At 100 TB the demux
    emits the data chunk's byte range, so windowing reads only samples
    — the real-feature pipeline (spectrogram/MFCC) swaps in behind the
    same (doc, window) schema.

    Windows are over FRAMES (one frame = one sample per channel): the
    interleaved int16 array is reshaped to ``(n_samples, channels)`` and
    sliced along the frame axis, so for multi-channel WAVs a window
    covers ``window`` frames and its stats run over every channel's
    samples in those frames (``win_n = frames_in_window * channels``).
    Windowing the flat interleaved array by ``n_samples`` — the bug the
    r6 ADVICE flagged — silently dropped all but the first
    ``1/channels`` of the data and mixed L/R positions; frame windows
    keep the mono path byte-identical while making channels >= 2
    lossless."""
    import numpy as np
    import pandas as pd

    def fn(batches):
        for b in batches:
            rows = []
            for i, data in zip(b[id_col], b[content_col]):
                data = bytes(data)
                meta = parse_wav(data)
                arr = np.frombuffer(
                    data, dtype="<i2", count=meta["data_size"] // 2,
                    offset=meta["data_off"],
                ).astype(np.int64).reshape(-1, meta["channels"])
                n = meta["n_samples"]
                for w in range(0, n, window):
                    seg = arr[w : w + window]
                    rows.append(
                        (
                            int(i), w // window, meta["sample_rate"], n,
                            int(seg.size), int(seg.sum()),
                            int(seg.min()), int(seg.max()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "win", "sample_rate", "n_samples",
                    "win_n", "sum_s", "min_s", "max_s",
                ],
            )

    return media.mapInPandas(fn, AUDIO_WINDOW_SCHEMA)
