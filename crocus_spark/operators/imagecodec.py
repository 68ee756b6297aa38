"""Dependency-free image codec — the REAL decode path behind §2B#60.

The container ships no PIL/opencv, so the engine carries its own pure-
Python codecs for three public formats (all specs are public documents):

- **PPM/PGM** (netpbm P6/P5): ASCII header + raw samples.
- **BMP** (Windows V3, 24-bit BI_RGB): BITMAPFILEHEADER +
  BITMAPINFOHEADER + bottom-up padded pixel array.
- **PNG** (RFC 2083): signature + IHDR + zlib IDAT with all five
  scanline filters (None/Sub/Up/Average/Paeth) — decode runs the full
  decompress + unfilter, not just a header sniff, so a truncated or
  corrupt payload fails loudly instead of yielding garbage metadata.

Decoders return ``(width, height, n_channels)`` after validating the
complete pixel payload; encoders exist so tests and fixtures can build
deterministic images without any third-party dependency. Reference
parity: the reference's media surface is document links fetched as raw
bytes (ishares.py:97-137 factsheet/kid URLs); this module is the decode
stage those payloads flow into.
"""

from __future__ import annotations

import struct
import zlib

# ---------------------------------------------------------------------------
# netpbm (PPM P6 / PGM P5)
# ---------------------------------------------------------------------------


def encode_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """P6 binary PPM; ``pixels`` is RGB, row-major, 3·w·h bytes."""
    if len(pixels) != 3 * width * height:
        raise ValueError("pixel buffer size mismatch")
    return b"P6\n%d %d\n255\n" % (width, height) + pixels


def _pnm_token(buf: bytes, pos: int) -> tuple[bytes, int]:
    # skip whitespace and '#' comments, return (token, next_pos)
    n = len(buf)
    while pos < n:
        c = buf[pos : pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":
            while pos < n and buf[pos : pos + 1] != b"\n":
                pos += 1
        else:
            break
    start = pos
    while pos < n and not buf[pos : pos + 1].isspace():
        pos += 1
    if start == pos:
        raise ValueError("truncated PNM header")
    return buf[start:pos], pos


def decode_pnm(data: bytes) -> tuple[int, int, int]:
    magic = data[:2]
    channels = {b"P6": 3, b"P5": 1}.get(magic)
    if channels is None:
        raise ValueError(f"not a binary PNM: magic={magic!r}")
    pos = 2
    w_tok, pos = _pnm_token(data, pos)
    h_tok, pos = _pnm_token(data, pos)
    maxval_tok, pos = _pnm_token(data, pos)
    width, height, maxval = int(w_tok), int(h_tok), int(maxval_tok)
    if not (0 < maxval < 65536):
        raise ValueError(f"bad PNM maxval {maxval}")
    bytes_per_sample = 1 if maxval < 256 else 2
    pos += 1  # single whitespace after maxval
    need = width * height * channels * bytes_per_sample
    if len(data) - pos < need:
        raise ValueError(
            f"truncated PNM payload: need {need}, have {len(data) - pos}"
        )
    return width, height, channels


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed, bottom-up)
# ---------------------------------------------------------------------------


def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """24-bit BI_RGB BMP; ``pixels`` is RGB row-major top-down — rows are
    re-ordered bottom-up and BGR-swapped per the format."""
    if len(pixels) != 3 * width * height:
        raise ValueError("pixel buffer size mismatch")
    row_raw = 3 * width
    pad = (4 - row_raw % 4) % 4
    body = bytearray()
    for y in range(height - 1, -1, -1):
        row = pixels[y * row_raw : (y + 1) * row_raw]
        # RGB -> BGR
        bgr = bytearray(row)
        bgr[0::3], bgr[2::3] = row[2::3], row[0::3]
        body += bgr + b"\x00" * pad
    pixel_off = 14 + 40
    header = struct.pack(
        "<2sIHHI", b"BM", pixel_off + len(body), 0, 0, pixel_off
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + bytes(body)


def decode_bmp(data: bytes) -> tuple[int, int, int]:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    if len(data) < 54:
        raise ValueError("truncated BMP header")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    width, height = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if planes != 1 or compression != 0:
        raise ValueError("unsupported BMP variant")
    if bpp not in (8, 24, 32):
        raise ValueError(f"unsupported BMP bpp {bpp}")
    height_abs = abs(height)
    row_bytes = (width * bpp // 8 + 3) // 4 * 4
    need = row_bytes * height_abs
    if len(data) - pixel_off < need:
        raise ValueError(
            f"truncated BMP payload: need {need}, have {len(data) - pixel_off}"
        )
    return width, height_abs, bpp // 8


# ---------------------------------------------------------------------------
# PNG (8-bit gray / RGB / RGBA, zlib IDAT, 5 scanline filters)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> channels


def encode_png(width: int, height: int, pixels: bytes) -> bytes:
    """8-bit RGB PNG, filter 0 scanlines, one IDAT chunk."""
    if len(pixels) != 3 * width * height:
        raise ValueError("pixel buffer size mismatch")

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = bytearray()
    stride = 3 * width
    for y in range(height):
        raw += b"\x00" + pixels[y * stride : (y + 1) * stride]
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, int]:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    width = height = bit_depth = color_type = None
    idat = bytearray()
    saw_iend = False
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        if pos + 12 + length > len(data):
            raise ValueError("truncated PNG chunk")
        payload = data[pos + 8 : pos + 8 + length]
        crc = struct.unpack_from(">I", data, pos + 8 + length)[0]
        if crc != (zlib.crc32(tag + payload) & 0xFFFFFFFF):
            raise ValueError(f"PNG CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            width, height, bit_depth, color_type = struct.unpack_from(
                ">IIBB", payload, 0
            )
            interlace = payload[12]
            if bit_depth != 8 or color_type not in _PNG_CHANNELS:
                raise ValueError(
                    f"unsupported PNG: depth={bit_depth} color={color_type}"
                )
            if interlace:
                raise ValueError("interlaced PNG unsupported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            saw_iend = True
            break
        pos += 12 + length
    if width is None or not idat or not saw_iend:
        raise ValueError("PNG missing IHDR/IDAT/IEND")
    channels = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = channels * width
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"PNG pixel payload mismatch: {len(raw)} != {(stride + 1) * height}"
        )
    # full unfilter pass — validates every scanline's filter byte
    prev = bytearray(stride)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                c = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype} at row {y}")
        prev = line
    return width, height, channels


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------


def decode_image_bytes(data: bytes) -> tuple[int, int, int]:
    """Sniff the magic number and run the matching full decoder."""
    if data[:8] == _PNG_SIG:
        return decode_png(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] in (b"P5", b"P6"):
        return decode_pnm(data)
    if data[:2] == b"\xff\xd8":
        from crocus_spark.operators.jpegcodec import decode_jpeg_baseline

        w, h, c, _px = decode_jpeg_baseline(data)
        return w, h, c
    if data[:6] in (b"GIF87a", b"GIF89a"):
        from crocus_spark.operators.gifcodec import decode_gif_first_frame

        w, h, c, _px = decode_gif_first_frame(data)
        return w, h, c
    raise ValueError(f"unrecognized image format: magic={data[:8]!r}")


def synth_pixels(width: int, height: int, seed: int) -> bytes:
    """Deterministic RGB test pattern (linear-congruential, engine-
    independent) — fixture images derive from integer keys only."""
    out = bytearray(3 * width * height)
    x = (seed * 2654435761 + 1) & 0xFFFFFFFF
    for i in range(len(out)):
        x = (x * 1103515245 + 12345) & 0xFFFFFFFF
        out[i] = (x >> 16) & 0xFF
    return bytes(out)


# ---------------------------------------------------------------------------
# pixel-returning decode + resize
# ---------------------------------------------------------------------------


def decode_pnm_pixels(data: bytes) -> tuple[int, int, int, bytes]:
    """decode_pnm, plus the raw sample buffer (8-bit only here — the
    engine's synth fixtures never exceed maxval 255)."""
    width, height, channels = decode_pnm(data)
    pos = 2
    for _ in range(3):
        _, pos = _pnm_token(data, pos)
    pos += 1
    need = width * height * channels
    return width, height, channels, bytes(data[pos : pos + need])


def decode_bmp_pixels(data: bytes) -> tuple[int, int, int, bytes]:
    """decode_bmp, plus pixels re-ordered to row-major TOP-DOWN RGB —
    undoing the format's bottom-up BGR row layout and 4-byte row
    padding, so every decoder in the module yields the same canonical
    buffer."""
    width, height, channels = decode_bmp(data)
    if channels != 3:
        raise ValueError("pixel decode supports 24-bit BMP only")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    raw_h = struct.unpack_from("<i", data, 22)[0]
    row_raw = 3 * width
    row_bytes = (row_raw + 3) // 4 * 4
    out = bytearray(row_raw * height)
    for y in range(height):
        src_y = height - 1 - y if raw_h > 0 else y
        off = pixel_off + src_y * row_bytes
        bgr = data[off : off + row_raw]
        row = bytearray(bgr)
        row[0::3], row[2::3] = bgr[2::3], bgr[0::3]
        out[y * row_raw : (y + 1) * row_raw] = row
    return width, height, 3, bytes(out)


def decode_png_pixels(data: bytes) -> tuple[int, int, int, bytes]:
    """decode_png, plus the unfiltered scanline buffer. Re-runs the
    shared validation path, then repeats the unfilter keeping lines."""
    width, height, channels = decode_png(data)
    pos = 8
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        if tag == b"IDAT":
            idat += data[pos + 8 : pos + 8 + length]
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(bytes(idat))
    stride = channels * width
    out = bytearray(stride * height)
    prev = bytearray(stride)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if ftype == 1:
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                c = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return width, height, channels, bytes(out)


def decode_image_pixels(data: bytes) -> tuple[int, int, int, bytes]:
    """Sniff + full pixel decode to the canonical top-down row-major
    interleaved buffer."""
    if data[:8] == _PNG_SIG:
        return decode_png_pixels(data)
    if data[:2] == b"BM":
        return decode_bmp_pixels(data)
    if data[:2] in (b"P5", b"P6"):
        return decode_pnm_pixels(data)
    if data[:2] == b"\xff\xd8":
        from crocus_spark.operators.jpegcodec import decode_jpeg_baseline

        return decode_jpeg_baseline(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        from crocus_spark.operators.gifcodec import decode_gif_first_frame

        return decode_gif_first_frame(data)
    raise ValueError(f"unrecognized image format: magic={data[:8]!r}")


def resize_nearest(
    pixels: bytes, width: int, height: int, channels: int,
    out_w: int, out_h: int,
) -> bytes:
    """Nearest-neighbor resize on the canonical buffer: output pixel
    (x, y) samples source (x·w // out_w, y·h // out_h) — pure integer
    index arithmetic, no interpolation, bit-deterministic on any
    platform (the thumbnail/downsample stage of a multimodal pipeline;
    swap in a library resampler via the same operator signature for
    quality-sensitive paths)."""
    out = bytearray(out_w * out_h * channels)
    for y in range(out_h):
        sy = y * height // out_h
        src_row = sy * width * channels
        dst_row = y * out_w * channels
        for x in range(out_w):
            sx = x * width // out_w
            s = src_row + sx * channels
            d = dst_row + x * channels
            out[d : d + channels] = pixels[s : s + channels]
    return bytes(out)
