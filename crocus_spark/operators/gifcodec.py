"""Dependency-free GIF87a/89a codec (LZW) — the fifth real image format
behind §2B#60, and the second ANIMATED format next to the RIFF/AVI
path: real crawl corpora carry GIFs, and a palette image round-trips
LOSSLESSLY, so unlike JPEG the whole decode is exactly value-oracle-able.

Scope (public W3C/CompuServe spec, no third-party code):

- **Encoder** (fixture generator): GIF89a, one global color table,
  N full-size frames (Graphic Control Extension + Image Descriptor per
  frame), variable-width LSB-first GIF-LZW with Clear/EOI codes and
  4096-entry dictionary growth, 255-byte sub-block framing. Optional
  interlaced frames (the 4-pass row shuffle).
- **Decoder**: parses header/LSD/GCT, skips extensions it doesn't
  need, decodes every image block (local color tables and interlace
  honored), yields full RGB frames. Unsupported shapes fail loudly
  (truncated streams, missing palettes, oversized LZW codes).

Determinism: LZW is exact; palette lookups are exact — decode(encode(f))
== f byte-for-byte, which is what the registry query's oracle pins.
"""

from __future__ import annotations

import struct


def _pack_lzw(indices: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW compress: variable code width (min+1 .. 12),
    LSB-first bit packing, Clear emitted first, EOI last, dictionary
    reset on overflow past 4095."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {
        bytes([i]): i for i in range(clear)
    }
    next_code = eoi + 1
    width = min_code_size + 1
    put(clear, width)
    prefix = b""
    for b in indices:
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        put(table[prefix], width)
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            put(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes([b])
    if prefix:
        put(table[prefix], width)
    put(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _unpack_lzw(data: bytes, min_code_size: int, expect: int) -> bytes:
    """GIF-variant LZW decompress to exactly ``expect`` indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream truncated before EOI")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError(f"LZW code {code} before any output")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]  # the KwKwK case
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} beyond table {len(table)}")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= expect:
            # spec: decoder may stop once the frame is full; consume EOI
            # lazily — extra codes indicate a corrupt stream
            if len(out) > expect:
                raise ValueError("LZW produced more pixels than the frame")
    if len(out) != expect:
        raise ValueError(
            f"LZW produced {len(out)} indices, frame needs {expect}"
        )
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(height: int) -> list[int]:
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, height, step))
    return order


def encode_gif(
    width: int,
    height: int,
    palette: bytes,
    frames: list[bytes],
    interlace: bool = False,
    delay_cs: int = 4,
) -> bytes:
    """GIF89a bytes from ``palette`` (RGB triples, length a power of two
    x3, ≤ 256 entries) and ``frames`` (each w·h palette indices)."""
    n_colors = len(palette) // 3
    if n_colors & (n_colors - 1) or not 2 <= n_colors <= 256:
        raise ValueError("palette size must be a power of two in [2, 256]")
    if len(palette) != 3 * n_colors:
        raise ValueError("palette length must be 3 x n_colors")
    depth = max(2, n_colors.bit_length() - 1)  # LZW min code size >= 2
    out = bytearray(b"GIF89a")
    gct_bits = (n_colors.bit_length() - 1) - 1  # 2^(n+1) colors
    out += struct.pack("<HHBBB", width, height, 0x80 | gct_bits, 0, 0)
    out += palette
    if len(frames) > 1:
        # NETSCAPE2.0 loop extension (public de-facto standard)
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for idx in frames:
        if len(idx) != width * height:
            raise ValueError("frame index buffer size mismatch")
        if max(idx) >= n_colors:
            raise ValueError("frame index outside the palette")
        out += b"\x21\xf9" + struct.pack(
            "<BBHBB", 4, 0x04, delay_cs, 0, 0
        )  # GCE: disposal=1 (keep), no transparency
        flags = 0x40 if interlace else 0x00
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, flags)
        if interlace:
            rows = _interlace_order(height)
            shuffled = bytearray()
            for y in rows:
                shuffled += idx[y * width : (y + 1) * width]
            idx = bytes(shuffled)
        out.append(depth)
        lzw = _pack_lzw(idx, depth)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)  # block terminator
    out += b"\x3b"  # trailer
    return bytes(out)


def parse_gif(data: bytes) -> dict:
    """Header + frame metadata without pixel decode: (width, height,
    n_frames, global palette, per-frame descriptors)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError(f"not a GIF: magic={data[:6]!r}")
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = data[pos : pos + 3 * n]
        pos += 3 * n
    frames = []
    while True:
        if pos >= len(data):
            raise ValueError("GIF truncated before trailer")
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 1
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            left, top, fw, fh, iflags = struct.unpack_from("<HHHHB", data, pos)
            pos += 9
            lct = None
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                lct = data[pos : pos + 3 * n]
                pos += 3 * n
            depth = data[pos]
            pos += 1
            start = pos
            chunks = []
            while data[pos]:
                ln = data[pos]
                chunks.append(data[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            frames.append(
                {
                    "left": left, "top": top, "width": fw, "height": fh,
                    "interlace": bool(iflags & 0x40), "depth": depth,
                    "lct": lct, "lzw": b"".join(chunks), "offset": start,
                }
            )
        else:
            raise ValueError(f"unknown GIF block 0x{b:02X} at {pos - 1}")
    return {
        "width": w, "height": h, "palette": gct,
        "n_frames": len(frames), "frames": frames,
    }


def decode_gif_frames(data: bytes, every: int = 1):
    """Yield ``(frame_idx, width, height, rgb_bytes)`` for every
    ``every``-th frame — full-canvas frames (the encoder's shape and
    the common animated-crawl shape); partial-canvas frames compose
    onto the previous canvas (disposal 'keep')."""
    meta = parse_gif(data)
    w, h = meta["width"], meta["height"]
    canvas = bytearray(w * h)  # palette indices, bg 0
    pal_g = meta["palette"]
    composed_pal = None  # palette the on-canvas indices were drawn with
    for i, fr in enumerate(meta["frames"]):
        pal = fr["lct"] or pal_g
        if pal is None:
            raise ValueError("frame without a color table")
        # The canvas stores palette INDICES, rendered below with the
        # CURRENT frame's palette — valid only if that palette also
        # matches the pixels already composed. A partial frame whose
        # effective color table differs from the composed one would
        # silently recolor the previously-composed region; fail loudly
        # instead (module contract: unsupported shapes raise). A frame
        # covering the whole canvas overwrites every pixel, so a
        # palette switch there is safe and resets the composed palette.
        full_cover = (
            fr["left"] == 0
            and fr["top"] == 0
            and fr["width"] == w
            and fr["height"] == h
        )
        if (
            composed_pal is not None
            and not full_cover
            and bytes(pal) != bytes(composed_pal)
        ):
            raise ValueError(
                f"frame {i} carries a color table differing from the "
                "one the composed canvas was drawn with; partial-frame "
                "palette switches are not supported (indices would "
                "silently recolor prior frames)"
            )
        composed_pal = pal
        idx = _unpack_lzw(
            fr["lzw"], fr["depth"], fr["width"] * fr["height"]
        )
        if fr["interlace"]:
            rows = _interlace_order(fr["height"])
            de = bytearray(len(idx))
            for src_row, y in enumerate(rows):
                de[y * fr["width"] : (y + 1) * fr["width"]] = idx[
                    src_row * fr["width"] : (src_row + 1) * fr["width"]
                ]
            idx = bytes(de)
        # compose onto the canvas at (left, top)
        for y in range(fr["height"]):
            dst = (fr["top"] + y) * w + fr["left"]
            canvas[dst : dst + fr["width"]] = idx[
                y * fr["width"] : (y + 1) * fr["width"]
            ]
        if i % every:
            continue
        rgb = bytearray(3 * w * h)
        for p, ci in enumerate(canvas):
            off = 3 * ci
            rgb[3 * p : 3 * p + 3] = pal[off : off + 3]
        yield i, w, h, bytes(rgb)


def decode_gif_first_frame(data: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, 3, rgb) of frame 0 — the stills dispatch shape."""
    for _i, w, h, rgb in decode_gif_frames(data, every=1):
        return w, h, 3, rgb
    raise ValueError("GIF contains no image blocks")


def synth_palette_frames(
    width: int, height: int, n_frames: int, seed: int
) -> tuple[bytes, list[bytes]]:
    """Deterministic (palette, frames) fixture from integer keys: a
    16-color LCG palette and per-frame index patterns keyed on
    (seed, frame, pixel) — every value replayable from the keys."""
    x = (seed * 2654435761 + 97) & 0xFFFFFFFF
    pal = bytearray()
    for _ in range(16 * 3):
        x = (x * 1103515245 + 12345) & 0xFFFFFFFF
        pal.append((x >> 16) & 0xFF)
    frames = []
    for f in range(n_frames):
        buf = bytearray(width * height)
        y = (seed * 31 + f * 7 + 3) & 0xFFFFFFFF
        for p in range(width * height):
            y = (y * 1103515245 + 12345) & 0xFFFFFFFF
            buf[p] = (y >> 16) & 0x0F
        frames.append(bytes(buf))
    return bytes(pal), frames
