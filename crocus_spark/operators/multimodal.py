"""Multimodal column handling — SURVEY.md §2B #60 and the driver north
star: image/audio/video as opaque binary columns with typed metadata,
decoded / feature-extracted via Arrow-batched Pandas UDFs.

The reference's multimodal hook is the factsheet/kid PDF links
(``output_examples/ishares.json:9-10``) fetched as raw bytes. The decode
step itself is STUBBED (no image/audio libs in this container — clearly
marked below); everything Spark-side is real: schemas, binary columns,
mapInPandas batch iteration, partition sizing.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata contract for a media column: the binary payload plus the
# fields every downstream op needs without touching bytes.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("media_type", T.StringType()),  # 'image'|'audio'|'video'|'pdf'
        T.StructField("byte_len", T.LongType()),
        T.StructField("content_md5", T.StringType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("byte_len", T.LongType()),
    ]
)


def to_media_table(
    df: DataFrame, id_col: str, payload_col: str, media_type: str
) -> DataFrame:
    """Wrap an arbitrary binary payload column into the engine's typed
    media contract: id, bytes, type tag, length, digest. Metadata is
    computed JVM-side (octet math + md5) so filters on size/digest never
    touch Python."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).cast("binary").alias("content"),
        F.lit(media_type).alias("media_type"),
        F.octet_length(F.col(payload_col)).cast("long").alias("byte_len"),
        F.md5(F.col(payload_col).cast("binary")).alias("content_md5"),
    )


def decode_image(content: bytes) -> tuple[int, int, int]:
    """REAL image decode: dependency-free PNG / BMP / PPM-PGM codecs
    (crocus_spark.operators.imagecodec — full zlib inflate + scanline
    unfilter for PNG, not a header sniff). Formats outside those three
    raise ValueError; route exotic codecs through a site-installed
    library by passing a different ``decoder`` to decode_media_batch."""
    from crocus_spark.operators.imagecodec import decode_image_bytes

    return decode_image_bytes(content)


def synth_image_table(
    df: DataFrame, id_col: str, pattern_col: str | None = None
) -> DataFrame:
    """Deterministic fixture images from integer keys (the fixtures carry
    no real media bytes): pattern key p becomes a (4 + p%13) × (3 + p%11)
    RGB image with LCG-pattern pixels, encoded as PPM / BMP / PNG by the
    ID key k%3 — all three engine codecs exercised in one relation.
    With ``pattern_col`` set, rows sharing a pattern get PIXEL-IDENTICAL
    images in (generally) different container formats — the perceptual-
    dedup fixture where byte-level dedup must fail. Default: p = k.
    Encoding runs in the Arrow batch loop (bytes never visit the
    driver)."""
    import pandas as pd  # noqa: PLC0415

    from crocus_spark.operators import imagecodec as C

    @F.pandas_udf(T.BinaryType())
    def encode(ids, pats):
        out = []
        for k, p in zip(ids, pats):
            k, p = int(k), int(p)
            w, h = 4 + p % 13, 3 + p % 11
            px = C.synth_pixels(w, h, p)
            enc = (C.encode_ppm, C.encode_bmp, C.encode_png)[k % 3]
            out.append(enc(w, h, px))
        return pd.Series(out)

    pat = F.col(pattern_col) if pattern_col else F.col(id_col)
    return df.select(
        F.col(id_col), encode(F.col(id_col), pat).alias("img")
    )


def fake_decode_image(content: bytes) -> tuple[int, int, int]:
    """Deterministic PLUMBING-TEST decoder: derives a fake (width,
    height, channels) from the payload length alone, so results are
    reproducible and SQL-checkable (width/height are pure arithmetic on
    byte_len). NOT the engine's decode path — real decoding is
    operators/imagecodec.decode_image (PNG/BMP/PPM, used by
    multimodal_real_decode) passed through the same
    ``decode_media_batch(media, decoder=...)`` seam, which is also where
    a third-party codec (Pillow etc.) plugs in on a cluster that ships
    one."""
    n = len(content)
    width = 1 + (n * 7919) % 1024
    height = 1 + (n * 104729) % 768
    channels = 1 + n % 4
    return width, height, channels


def decode_media_batch(
    media: DataFrame, decoder=fake_decode_image
) -> DataFrame:
    """Decode/feature-extract a media table via mapInPandas (§2B#60).

    The Arrow batch loop is the real production shape: bytes arrive as a
    pandas Series per batch, the decoder runs per payload, output rows are
    yielded as batch DataFrames. Batch size is controlled by
    spark.sql.execution.arrow.maxRecordsPerBatch — size it so
    batch_rows × avg_payload fits executor memory (media partitions should
    be re-partitioned to ~128 MB of payload, not row count)."""
    import pandas as pd  # noqa: PLC0415

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            decoded = [decoder(b) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_channels": [d[2] for d in decoded],
                    "byte_len": pdf["byte_len"],
                }
            )

    return media.mapInPandas(fn, DECODED_SCHEMA)


AUDIO_CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("chunk_idx", T.IntegerType()),
        T.StructField("byte_start", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("rms", T.FloatType()),  # stand-in feature
    ]
)


def chunk_audio(
    media: DataFrame, chunk_bytes: int = 1024, max_chunks: int = 16
) -> DataFrame:
    """Audio-chunking plumbing (audio path of §2B#60): split each payload
    into fixed-size byte windows — the stand-in for resample + fixed-
    duration windowing — and compute a per-chunk feature in the Arrow
    batch loop (here: RMS over raw bytes; a real pipeline swaps in
    spectrogram/MFCC extraction behind the same schema).

    Shape under test: one input row → ≤ max_chunks output rows with
    Python-computed per-chunk features — the explode-then-extract pattern
    every audio featurizer at scale uses. Chunk boundaries are pure
    arithmetic; only the feature touches Python, Arrow-batched."""
    import math  # noqa: PLC0415

    import pandas as pd  # noqa: PLC0415

    def fn(batches):
        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "chunk_idx", "byte_start", "byte_len", "rms")}
            for mid, payload in zip(pdf["media_id"], pdf["content"]):
                data = bytes(payload or b"")
                for i in range(min(max_chunks, max(1, -(-len(data) // chunk_bytes)))):
                    chunk = data[i * chunk_bytes : (i + 1) * chunk_bytes]
                    if not chunk:
                        break
                    ssum = sum(b * b for b in chunk)
                    # math.sqrt (correctly-rounded IEEE) then a float32
                    # boundary cast — not **0.5 + round(6): pow is not
                    # guaranteed correctly rounded and decimal rounding of
                    # a double hits half-digit boundaries; float32 is the
                    # engine-portable emit (verify-skill contract).
                    rms = math.sqrt(ssum / len(chunk))
                    out["media_id"].append(mid)
                    out["chunk_idx"].append(i)
                    out["byte_start"].append(i * chunk_bytes)
                    out["byte_len"].append(len(chunk))
                    out["rms"].append(rms)
            yield pd.DataFrame(out)

    return media.mapInPandas(fn, AUDIO_CHUNK_SCHEMA)


def sample_frames(
    media: DataFrame, every_n_bytes: int = 4096, max_frames: int = 8
) -> DataFrame:
    """Frame-sampling plumbing over OPAQUE payloads: emit one row per
    sampled byte offset — the format-agnostic explode shape (one input
    row → ≤ max_frames output rows) for payloads whose container the
    engine does not parse. JVM-side sequence + explode, no Python.
    For real video containers the engine has an actual demux now:
    operators/videocodec.parse_avi emits per-frame byte ranges and
    decode_avi_frames decodes them through the image codec (query
    multimodal_video_frames, full value oracle) — this helper remains
    the fallback for formats without a parser."""
    offsets = F.slice(
        F.sequence(
            F.lit(0),
            F.greatest(F.col("byte_len") - 1, F.lit(0)),
            F.lit(every_n_bytes),
        ),
        1,
        max_frames,
    )
    return media.select(
        "media_id",
        F.posexplode(offsets).alias("frame_idx", "byte_offset"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("in_w", T.IntegerType()),
        T.StructField("in_h", T.IntegerType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("n_out_bytes", T.IntegerType()),
        T.StructField("resize_ok", T.BooleanType()),
    ]
)


def resize_media_batch(
    media: DataFrame, out_w: int, out_h: int, reference_pixels=None
) -> DataFrame:
    """Decode → nearest-neighbor resize in one Arrow batch pass (§2B#60
    resize stage). Emits geometry plus, when ``reference_pixels(media_id)
    -> (w, h, ch, bytes)`` is given, a per-row ``resize_ok`` comparing
    every resized byte against a resize of the independently generated
    reference — which makes the whole encode → decode → resize chain
    pixel-exact-checkable by an arithmetic oracle (the check is
    vacuously NULL when no reference exists, e.g. for real scraped
    media)."""
    import pandas as pd  # noqa: PLC0415

    from crocus_spark.operators.imagecodec import (
        decode_image_pixels,
        resize_nearest,
    )

    def fn(batches):
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                w, h, ch, px = decode_image_pixels(bytes(content))
                rz = resize_nearest(px, w, h, ch, out_w, out_h)
                ok = None
                if reference_pixels is not None:
                    rw, rh, rch, ref = reference_pixels(int(mid))
                    ok = (rw, rh, rch) == (w, h, ch) and rz == resize_nearest(
                        ref, rw, rh, rch, out_w, out_h
                    )
                rows.append(
                    (int(mid), w, h, out_w, out_h, len(rz), ok)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "in_w", "in_h", "out_w", "out_h",
                    "n_out_bytes", "resize_ok",
                ],
            )

    return media.mapInPandas(fn, RESIZED_SCHEMA)


def perceptual_hash_batch(media: DataFrame) -> DataFrame:
    """64-bit average-hash (aHash) per image: canonical pixel decode →
    8×8 nearest-neighbor downsample → grayscale → bit i set iff pixel i
    is brighter than the integer mean. Pixel-identical images hash
    identically regardless of container format; near-identical images
    land within small Hamming distance (band-block like SimHash to pair
    them at scale). Runs in the Arrow batch loop; only (id, hash) rows
    come out — images never leave the executors."""
    import pandas as pd  # noqa: PLC0415

    from crocus_spark.operators.imagecodec import decode_image_pixels

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("phash", T.LongType()),
        ]
    )

    def fn(batches):
        for pdf in batches:
            ids, hashes = [], []
            for mid, data in zip(pdf["media_id"], pdf["content"]):
                w, h, ch, px = decode_image_pixels(bytes(data))
                grays = []
                for ty in range(8):
                    sy = ty * h // 8
                    for tx in range(8):
                        sx = tx * w // 8
                        i = (sy * w + sx) * ch
                        grays.append((px[i] + px[i + 1] + px[i + 2]) // 3)
                mean = sum(grays) // 64
                bits = 0
                for i, g in enumerate(grays):
                    if g > mean:
                        bits |= 1 << i
                if bits >= 1 << 63:  # two's-complement into LongType
                    bits -= 1 << 64
                ids.append(mid)
                hashes.append(bits)
            yield pd.DataFrame({"media_id": ids, "phash": hashes})

    return media.mapInPandas(fn, schema)


JPEG_VERIFY_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_blocks", T.IntegerType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def jpeg_roundtrip_verify(
    df: DataFrame, id_col: str, quality: int = 90
) -> DataFrame:
    """Baseline-JPEG encode → engine decode → EXACT per-pixel verify, in
    one Arrow batch pass (the §2B#60 JPEG row, r9 verdict task #5).

    Fixture per key k: a (8·(1+k%3) − k%5) × (8·(1+k%2) − k%3) RGB image
    whose 8×8 blocks are each a constant LCG color — the family whose
    baseline round-trip is EXACTLY computable (constant blocks carry no
    AC energy, so the only lossy step is DC quantization, replayed
    closed-form by jpegcodec.jpeg_roundtrip_constant). ``decode_ok``
    compares every decoded byte against that replay: a Huffman slip, a
    zigzag/quant mixup, a DCT normalization error, or a color-transform
    bug flips it to False and the arithmetic oracle hash fails. The
    non-multiple-of-8 dims prove pad-at-encode / crop-at-decode too.
    Images never leave the executors; only (id, geometry, flag) rows
    come out."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    from crocus_spark.operators import jpegcodec as J

    def fn(batches):
        for pdf in batches:
            rows = []
            for k in pdf[id_col]:
                k = int(k)
                w = 8 * (1 + k % 3) - k % 5
                h = 8 * (1 + k % 2) - k % 3
                px = J.synth_block_constant_pixels(w, h, k)
                data = J.encode_jpeg_baseline(w, h, px, quality=quality)
                dw, dh, dc, out = J.decode_jpeg_baseline(data)
                ok = (dw, dh, dc) == (w, h, 3)
                if ok:
                    arr_in = np.frombuffer(px, np.uint8).reshape(h, w, 3)
                    exp = np.empty_like(arr_in)
                    for by in range((h + 7) // 8):
                        for bx in range((w + 7) // 8):
                            c_in = tuple(
                                int(v) for v in arr_in[by * 8, bx * 8]
                            )
                            exp[
                                by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                            ] = J.jpeg_roundtrip_constant(c_in, quality)
                    ok = out == exp.tobytes()
                nb = ((w + 7) // 8) * ((h + 7) // 8)
                rows.append((k, dw, dh, dc, nb, ok))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "n_channels",
                    "n_blocks", "decode_ok",
                ],
            )

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        fn, JPEG_VERIFY_SCHEMA
    )


JPEG_PROG_VERIFY_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_scans", T.IntegerType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def jpeg_progressive_verify(
    df: DataFrame, id_col: str, quality: int = 90
) -> DataFrame:
    """PROGRESSIVE-JPEG (SOF2) encode → engine decode → EXACT verify in
    one Arrow pass (r11, closing the r10 verdict gap #5: crawl corpora
    are heavily progressive). Same block-constant fixture family as
    ``jpeg_roundtrip_verify`` — the progressive stream carries the SAME
    quantized coefficients split across the multi-scan script, so
    ``decode_ok`` requires BOTH (a) the decoded bytes equal the
    closed-form DC replay and (b) the progressive decode equals the
    baseline decode of the same pixels byte-for-byte (the property a
    spectral-selection or successive-approximation slip breaks first).
    ``n_scans`` counts the stream's SOS markers, pinning the scan
    script shape in the oracle."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    from crocus_spark.operators import jpegcodec as J

    def fn(batches):
        for pdf in batches:
            rows = []
            for k in pdf[id_col]:
                k = int(k)
                w = 8 * (1 + k % 3) - k % 5
                h = 8 * (1 + k % 2) - k % 3
                px = J.synth_block_constant_pixels(w, h, k)
                prog = J.encode_jpeg_progressive(w, h, px, quality=quality)
                n_scans = prog.count(b"\xff\xda")
                dw, dh, dc, out = J.decode_jpeg(prog)
                ok = (dw, dh, dc) == (w, h, 3)
                if ok:
                    base_out = J.decode_jpeg(
                        J.encode_jpeg_baseline(w, h, px, quality=quality)
                    )[3]
                    ok = out == base_out
                if ok:
                    arr_in = np.frombuffer(px, np.uint8).reshape(h, w, 3)
                    exp = np.empty_like(arr_in)
                    for by in range((h + 7) // 8):
                        for bx in range((w + 7) // 8):
                            c_in = tuple(
                                int(v) for v in arr_in[by * 8, bx * 8]
                            )
                            exp[
                                by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                            ] = J.jpeg_roundtrip_constant(c_in, quality)
                    ok = out == exp.tobytes()
                rows.append((k, dw, dh, dc, n_scans, ok))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "n_channels",
                    "n_scans", "decode_ok",
                ],
            )

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        fn, JPEG_PROG_VERIFY_SCHEMA
    )


GIF_VERIFY_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("interlaced", T.BooleanType()),
        T.StructField("frames_ok", T.BooleanType()),
    ]
)


def gif_frames_verify(df: DataFrame, id_col: str) -> DataFrame:
    """Animated-GIF encode → demux → LZW decode → EXACT per-frame
    verify in one Arrow pass (the second animated format of §2B#60,
    next to the RIFF/AVI path — and unlike JPEG the round-trip is
    LOSSLESS, so every frame byte is oracle-pinnable).

    Fixture per key k: a (5+k%13) x (4+k%9) canvas, 1+k%4 frames from
    a 16-color LCG palette, interlaced when k is even — so the verify
    also proves the 4-pass deinterlace row order and the 255-byte
    sub-block reassembly. ``frames_ok`` compares EVERY decoded frame
    byte against the regenerated reference; the arithmetic oracle pins
    geometry + flag."""
    import pandas as pd  # noqa: PLC0415

    from crocus_spark.operators import gifcodec as G

    def fn(batches):
        for pdf in batches:
            rows = []
            for k in pdf[id_col]:
                k = int(k)
                w, h = 5 + k % 13, 4 + k % 9
                nf = 1 + k % 4
                inter = k % 2 == 0
                pal, frames = G.synth_palette_frames(w, h, nf, k)
                data = G.encode_gif(w, h, pal, frames, interlace=inter)
                got = list(G.decode_gif_frames(data))
                ok = len(got) == nf
                if ok:
                    for fi, (idx, dw, dh, rgb) in enumerate(got):
                        exp = bytearray()
                        for ci in frames[fi]:
                            exp += pal[3 * ci : 3 * ci + 3]
                        if (idx, dw, dh) != (fi, w, h) or rgb != bytes(exp):
                            ok = False
                            break
                rows.append((k, w, h, nf, inter, ok))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "n_frames",
                    "interlaced", "frames_ok",
                ],
            )

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        fn, GIF_VERIFY_SCHEMA
    )
