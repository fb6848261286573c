"""Pure-stdlib GIF codec (the public GIF87a/89a spec): LZW-compressed
palette images — single-frame or ANIMATED, interlaced or not.

``decode_gif``: header + logical screen descriptor walk, global/local
color tables, Graphic Control Extensions (transparency + disposal
methods 1/2/3), full variable-width LZW decode (dictionary growth to 12
bits, clear/end codes), 4-pass de-interlacing, and frame compositing on
the logical screen. Returns the screen-sized first composited frame as
``pixels`` (back-compatible: single full-screen frames are unchanged)
plus ``n_frames`` and the full ``frames`` stack.

``encode_gif``: palette-index matrix + RGB palette -> GIF bytes with a
REAL LZW compressor (greedy longest-match, dictionary reset at 4096),
so decoding our own output exercises the decoder's dictionary-growth
path, not just literal roots.

Third real codec beside ``pngcodec`` and ``wavcodec`` — the multimodal
decode stage handles PNG, GIF and WAV from their public specs with the
stdlib only (this container has no codec libraries). Reference stores
binary artifacts keyed by content hash (app/main.py:711-718).
"""

from __future__ import annotations

import struct

import numpy as np

_HEADERS = (b"GIF87a", b"GIF89a")

# Hostile-input bound (see pngcodec.MAX_DECODE_BYTES): a patched logical
# screen descriptor or a frame flood must not OOM a decode worker.
MAX_DECODE_BYTES = 1 << 28  # 256 MiB of composited RGB frame bytes


class _BitReader:
    """LSB-first variable-width code reader over concatenated sub-blocks."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bitbuf = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("GIF: LZW stream truncated")
            self.bitbuf |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.bitbuf & ((1 << width) - 1)
        self.bitbuf >>= width
        self.nbits -= width
        return v


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    end = clear + 1
    reader = _BitReader(data)
    out = np.empty(n_pixels, np.uint8)
    n_out = 0

    def reset():
        return {i: bytes([i]) for i in range(clear)}, min_code_size + 1

    table, width = reset()
    prev: bytes | None = None
    next_code = end + 1
    while n_out < n_pixels:
        code = reader.read(width)
        if code == clear:
            table, width = reset()
            next_code = end + 1
            prev = None
            continue
        if code == end:
            break
        if code in table:
            entry = table[code]
        elif prev is not None and code == next_code:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"GIF: invalid LZW code {code}")
        take = min(len(entry), n_pixels - n_out)
        out[n_out : n_out + take] = np.frombuffer(entry[:take], np.uint8)
        n_out += take
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if n_out != n_pixels:
        raise ValueError("GIF: LZW stream ended early")
    return out


def _deinterlace_rows(h: int) -> np.ndarray:
    """GIF 4-pass interlace: display row index of each stored row."""
    return np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                           np.arange(2, h, 4), np.arange(1, h, 2)])


def decode_gif(data: bytes, *, max_bytes: int = MAX_DECODE_BYTES) -> dict:
    """GIF bytes -> dict with ``width``/``height`` (logical screen),
    ``channels`` (3), ``pixels`` (uint8 (h, w, 3): the FIRST composited
    frame), ``n_frames``, and ``frames`` (uint8 (n, h, w, 3): every
    frame composited per the spec's disposal/transparency rules).

    ``max_bytes`` bounds the canvas AND the total composited frame bytes
    (hostile screen descriptors / frame floods raise ``ValueError``
    before allocating)."""
    if data[:6] not in _HEADERS:
        raise ValueError("not a GIF: bad signature")
    sw, sh, packed, bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    if sw == 0 or sh == 0:
        raise ValueError("GIF: zero screen dimension")
    canvas_bytes = sw * sh * 3
    if canvas_bytes > max_bytes:
        raise ValueError(
            f"GIF: declared screen needs {canvas_bytes} bytes "
            f"> max_bytes={max_bytes} (hostile-header guard)")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(-1, 3)
        pos += 3 * n

    bg_rgb = (gct[bg] if gct is not None and bg < len(gct)
              else np.zeros(3, np.uint8))
    canvas = np.empty((sh, sw, 3), np.uint8)
    canvas[:] = bg_rgb
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0

    while pos < len(data):
        marker = data[pos]
        pos += 1
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9 and data[pos] >= 4:  # Graphic Control Ext
                gpacked = data[pos + 1]
                tidx = data[pos + 4]
                transparent = tidx if (gpacked & 0x01) else None
                disposal = (gpacked >> 2) & 0x07
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if marker != 0x2C:
            raise ValueError(f"GIF: unexpected block 0x{marker:02x}")
        left, top, w, h, ipacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        if w == 0 or h == 0 or left + w > sw or top + h > sh:
            raise ValueError("GIF: frame outside the logical screen")
        palette = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            palette = np.frombuffer(
                data[pos : pos + 3 * n], np.uint8).reshape(-1, 3)
            pos += 3 * n
        if palette is None:
            raise ValueError("GIF: image without a color table")
        min_code_size = data[pos]
        pos += 1
        chunks = []
        while data[pos]:
            ln = data[pos]
            chunks.append(data[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(b"".join(chunks), min_code_size, w * h).reshape(h, w)
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("GIF: palette index out of range")
        if ipacked & 0x40:  # interlaced: stored row i displays at row[i]
            display = np.empty_like(idx)
            display[_deinterlace_rows(h)] = idx
            idx = display

        if (len(frames) + 1) * canvas_bytes > max_bytes:
            raise ValueError(
                f"GIF: frame stack exceeds max_bytes={max_bytes} after "
                f"{len(frames)} frames (frame-flood guard)")
        prev = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + h, left : left + w]
        mask = (idx != transparent) if transparent is not None else slice(None)
        region[mask] = palette[idx][mask]
        frames.append(canvas.copy())
        if disposal == 2:  # restore region to background
            canvas[top : top + h, left : left + w] = bg_rgb
        elif disposal == 3:  # restore to previous canvas
            canvas = prev
        transparent, disposal = None, 0  # a GCE governs ONE image

    if not frames:
        raise ValueError("GIF: truncated before image data")
    return {
        "width": sw,
        "height": sh,
        "channels": 3,
        "n_frames": len(frames),
        "pixels": frames[0],
        "frames": np.stack(frames),
    }


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Greedy LZW (the spec's algorithm): longest known prefix -> code,
    dictionary grows to 4096 then resets via a clear code."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    def reset():
        return {bytes([i]): i for i in range(clear)}, min_code_size + 1

    table, width = reset()
    next_code = end + 1
    emit(clear, width)
    seq = b""
    for b in indices.tobytes():
        cand = seq + bytes([b])
        if cand in table:
            seq = cand
            continue
        emit(table[seq], width)
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table, width = reset()
            next_code = end + 1
        seq = bytes([b])
    if seq:
        emit(table[seq], width)
        # a conforming decoder adds a table entry for this final code and
        # widens at the same boundary the loop does — END must be emitted
        # at the width the DECODER is reading, or a byte-aligned stream
        # truncates one code short on strict decoders
        if next_code < 4096:
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
    emit(end, width)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """uint8 index matrix ``(h, w)`` + uint8 palette ``(n, 3)`` -> GIF."""
    if indices.dtype != np.uint8 or indices.ndim != 2:
        raise ValueError("encode_gif expects a uint8 (h, w) index matrix")
    if palette.ndim != 2 or palette.shape[1] != 3 or len(palette) > 256:
        raise ValueError("encode_gif expects a (n<=256, 3) palette")
    h, w = indices.shape
    if h == 0 or w == 0:
        raise ValueError("encode_gif: zero dimension")
    if int(indices.max(initial=0)) >= len(palette):
        raise ValueError("palette index out of range")
    n_pal = 1
    while (2 << (n_pal - 1)) < max(len(palette), 2):
        n_pal += 1
    n_entries = 2 << (n_pal - 1)
    pal = np.zeros((n_entries, 3), np.uint8)
    pal[: len(palette)] = palette
    min_code_size = max(2, n_pal)

    lzw = _lzw_encode(indices.reshape(-1), min_code_size)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks.extend(chunk)
    blocks.append(0)

    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | (n_pal - 1), 0, 0)
        + pal.tobytes()
        + b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        + bytes([min_code_size])
        + bytes(blocks)
        + b"\x3B"
    )
