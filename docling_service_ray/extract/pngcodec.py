"""Pure-stdlib PNG codec (public spec: W3C PNG second edition / RFC 2083).

``decode_png``: signature check -> chunk walk (IHDR / PLTE / IDAT / IEND,
CRC-verified) -> ``zlib`` inflate -> per-scanline de-filter (None / Sub /
Up / Average / Paeth) -> pixel matrix + typed metadata. Supports every
legal baseline IHDR: bit depths 1/2/4/8/16, color types 0 (gray),
2 (RGB), 3 (palette, expanded to RGB), 4 (gray+alpha), 6 (RGBA), both
non-interlaced and Adam7-interlaced streams (each of the seven passes is
an independently filtered sub-image scattered back on its grid).
Sub-byte gray/palette samples come back as RAW sample values
(0..2^depth-1, not rescaled); 16-bit images come back as uint16.

``encode_png``: uint8 ``(h, w, channels)`` array -> PNG bytes. The
per-row filter choice can cycle through all five filter types so a
decoder consuming the output must exercise every de-filter path.

This is the real M8 surface (the reference PNG-encodes extracted images,
/root/reference/app/main.py:711-714) plus its inverse, built from the
public spec with stdlib ``zlib`` only — no imaging libraries exist in
this container.

Performance note: Sub rows de-filter as a vectorized per-channel cumsum
and None/Up rows are pure numpy; Average/Paeth rows carry a true
sequential dependency (each byte needs the reconstructed left neighbor)
and fall back to a per-byte loop. Fine for metadata-scale images; a
production deployment would swap in an optimized codec behind the same
``DecodeImage`` actor seam.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# Hostile-input bound: a 4-byte-patched IHDR can declare petabyte
# dimensions; refuse BEFORE allocating or inflating (decode workers run
# over untrusted payloads at corpus scale — an allocation bomb in one row
# must not OOM the worker). Raise per-call via the max_bytes parameter.
MAX_DECODE_BYTES = 1 << 28  # 256 MiB of reconstructed scanline bytes

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

_IHDR = struct.Struct(">IIBBBBB")


def paeth_predictor(a: int, b: int, c: int) -> int:
    """The spec's PaethPredictor (left, above, upper-left)."""
    p = a + b - c
    pa = abs(p - a)
    pb = abs(p - b)
    pc = abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _chunks(data: bytes):
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {ctype!r}")
        yield ctype, body
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("PNG ended without IEND")


# legal IHDR bit depths per color type (PNG spec table 11.1)
_LEGAL_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                 4: (8, 16), 6: (8, 16)}

# Adam7 pass grid: (x_start, y_start, x_step, y_step) per the spec
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _defilter(rows: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """De-filter ``(height, stride+1)`` scanline bytes (filter byte first)
    into ``(height, stride)`` reconstructed bytes. ``bpp`` is the filter
    offset unit in BYTES (spec: max(1, bits_per_pixel // 8))."""
    out = np.empty((height, stride), np.uint8)
    prev = np.zeros(stride, np.int64)
    for y in range(height):
        ft = int(rows[y, 0])
        line = rows[y, 1:].astype(np.int64)
        if ft == 0:  # None
            rec = line
        elif ft == 1:  # Sub: per-byte-column running sum mod 256
            pad = (-stride) % bpp
            padded = np.concatenate([line, np.zeros(pad, np.int64)])
            rec = (padded.reshape(-1, bpp).cumsum(axis=0) % 256).reshape(-1)
            rec = rec[:stride]
        elif ft == 2:  # Up
            rec = (line + prev) % 256
        elif ft == 3:  # Average (sequential left dependency)
            rec = np.empty(stride, np.int64)
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                rec[i] = (line[i] + (left + prev[i]) // 2) % 256
        elif ft == 4:  # Paeth (sequential left dependency)
            rec = np.empty(stride, np.int64)
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                rec[i] = (line[i] + paeth_predictor(int(a), int(b), int(c))) % 256
        else:
            raise ValueError(f"PNG: unknown scanline filter {ft}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


def _rows_to_samples(rec: np.ndarray, ph: int, pw: int, depth: int,
                     channels: int) -> np.ndarray:
    """Reconstructed scanline bytes ``(ph, stride)`` -> sample matrix
    ``(ph, pw, channels)`` (uint8, or uint16 for depth 16; sub-byte
    depths yield raw sample values, MSB-first per the spec)."""
    if depth == 8:
        return rec.reshape(ph, pw, channels)
    if depth == 16:
        wide = (rec[:, 0::2].astype(np.uint16) << 8) | rec[:, 1::2]
        return wide.reshape(ph, pw, channels)
    # depths 1/2/4: channels is always 1 (gray or palette indices)
    bits = np.unpackbits(rec, axis=1)
    weights = 1 << np.arange(depth - 1, -1, -1)
    vals = bits.reshape(ph, -1, depth) @ weights
    return vals[:, :pw].astype(np.uint8).reshape(ph, pw, 1)


def decode_png(data: bytes, *, max_bytes: int = MAX_DECODE_BYTES) -> dict:
    """Decode PNG bytes -> dict with ``width``, ``height``, ``bit_depth``,
    ``color_type``, ``channels`` and ``pixels`` (array of shape
    ``(height, width, channels)`` — uint8, or uint16 for 16-bit images;
    palette images come back expanded to RGB).

    ``max_bytes`` bounds the reconstructed image size; hostile headers
    declaring larger images raise ``ValueError`` before any allocation,
    and the zlib inflate is capped at the header-implied size (a zip
    bomb cannot expand past it)."""
    ihdr = None
    palette = None
    idat = []
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            ihdr = _IHDR.unpack(body)
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("PNG: unknown compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"PNG: unknown interlace method {interlace}")
    if color not in _CHANNELS:
        raise ValueError(f"PNG: invalid color type {color}")
    if depth not in _LEGAL_DEPTHS[color]:
        raise ValueError(
            f"PNG: illegal bit depth {depth} for color type {color}")
    if width == 0 or height == 0:
        raise ValueError("PNG: zero dimension")

    channels = _CHANNELS[color]
    bpp = max(1, (depth * channels) // 8)  # filter offset unit, bytes
    dtype = np.uint16 if depth == 16 else np.uint8
    passes = _ADAM7 if interlace == 1 else ((0, 0, 1, 1),)

    # header-implied raw size, computed BEFORE any allocation/inflate
    expected = 0
    for x0, y0, dx, dy in passes:
        pw = (width - x0 + dx - 1) // dx if width > x0 else 0
        ph = (height - y0 + dy - 1) // dy if height > y0 else 0
        if pw and ph:
            expected += ph * ((pw * depth * channels + 7) // 8 + 1)
    if expected > max_bytes:
        raise ValueError(
            f"PNG: declared image needs {expected} raw bytes "
            f"> max_bytes={max_bytes} (hostile-header guard; raise "
            "max_bytes for trusted oversized images)")
    decomp = zlib.decompressobj()
    raw = decomp.decompress(b"".join(idat), expected)
    if decomp.decompress(decomp.unconsumed_tail, 1):
        raise ValueError("PNG: decompressed size mismatch")

    pixels = np.zeros((height, width, channels), dtype)
    pos = 0
    for x0, y0, dx, dy in passes:
        pw = (width - x0 + dx - 1) // dx if width > x0 else 0
        ph = (height - y0 + dy - 1) // dy if height > y0 else 0
        if pw == 0 or ph == 0:
            continue
        stride = (pw * depth * channels + 7) // 8
        need = ph * (stride + 1)
        if pos + need > len(raw):
            raise ValueError("PNG: decompressed size mismatch")
        rows = np.frombuffer(raw[pos:pos + need], np.uint8).reshape(
            ph, stride + 1)
        pos += need
        rec = _defilter(rows, ph, stride, bpp)
        pixels[y0::dy, x0::dx] = _rows_to_samples(rec, ph, pw, depth, channels)
    if pos != len(raw):
        raise ValueError("PNG: decompressed size mismatch")

    if color == 3:
        if palette is None:
            raise ValueError("PNG: palette image without PLTE")
        idx = pixels[:, :, 0]
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("PNG: palette index out of range")
        pixels = palette[idx]
        channels = 3
    return {
        "width": width,
        "height": height,
        "bit_depth": depth,
        "color_type": color,
        "channels": channels,
        "pixels": pixels,
    }


_COLOR_OF_CHANNELS = {1: 0, 2: 4, 3: 2, 4: 6}


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, *, filters: str | int = "cycle",
               compress_level: int = 6) -> bytes:
    """uint8 ``(h, w)`` or ``(h, w, channels)`` array -> PNG bytes.

    ``filters="cycle"`` assigns row ``y`` scanline filter ``y % 5`` so the
    output exercises every de-filter path in any conforming decoder;
    pass an int 0-4 to fix one filter type. Filtering uses the spec's
    forward formulas vectorized (the encoder sees original bytes, so no
    sequential dependency exists on this side)."""
    if arr.dtype != np.uint8:
        raise ValueError("encode_png expects uint8 pixels")
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in _COLOR_OF_CHANNELS:
        raise ValueError("encode_png expects (h, w, 1|2|3|4) pixels")
    h, w, ch = arr.shape
    if h == 0 or w == 0:
        raise ValueError("encode_png: zero dimension")
    color = _COLOR_OF_CHANNELS[ch]
    stride = w * ch
    flat = arr.reshape(h, stride).astype(np.int64)

    lines = []
    zero = np.zeros(stride, np.int64)
    for y in range(h):
        ft = (y % 5) if filters == "cycle" else int(filters)
        cur = flat[y]
        prev = flat[y - 1] if y > 0 else zero
        left = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
        upleft = np.concatenate([np.zeros(ch, np.int64), prev[:-ch]])
        if ft == 0:
            enc = cur
        elif ft == 1:
            enc = (cur - left) % 256
        elif ft == 2:
            enc = (cur - prev) % 256
        elif ft == 3:
            enc = (cur - (left + prev) // 2) % 256
        elif ft == 4:
            pred = np.fromiter(
                (paeth_predictor(int(a), int(b), int(c))
                 for a, b, c in zip(left, prev, upleft)),
                np.int64, stride,
            )
            enc = (cur - pred) % 256
        else:
            raise ValueError(f"unknown filter {ft}")
        lines.append(bytes([ft]) + enc.astype(np.uint8).tobytes())

    ihdr = _IHDR.pack(w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(b"".join(lines), compress_level)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )
