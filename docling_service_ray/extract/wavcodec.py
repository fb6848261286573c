"""Pure-stdlib WAV (RIFF) codec — the public RIFF/WAVE format.

``decode_wav``: RIFF/WAVE header walk (fmt / data chunks), samples as a
numpy array plus typed metadata. Supported sample encodings: integer PCM
at 8 (unsigned), 16, 24 (sign-extended to int32) and 32 bits, IEEE float
at 32/64 bits (format 3), ITU-T G.711 mu-law / A-law (formats 7/6,
decoded to int16 with the CCITT expansion formulas), and
WAVE_FORMAT_EXTENSIBLE (0xFFFE) resolving to any of the above via its
SubFormat tag. Genuinely compressed encodings (ADPCM, MPEG, ...) raise
``NotImplementedError`` — loud, never a fake answer.
``encode_wav``: int16 samples -> PCM-16 WAV bytes.

Together with ``pngcodec`` this makes both the image and the audio
decode steps of the multimodal stage REAL (the container has no codec
libraries; both formats are simple enough to implement from their
public specs with ``struct`` alone). The reference stores binary
artifacts keyed by content hash (app/main.py:711-718); these codecs
are the decode side of that artifact plumbing.
"""

from __future__ import annotations

import struct

import numpy as np

_RIFF = b"RIFF"
_WAVE = b"WAVE"


def mulaw_decode(u8: np.ndarray) -> np.ndarray:
    """ITU-T G.711 mu-law bytes -> int16 (CCITT expansion, the same
    16-bit scale the classic audioop tables use: 0x00 -> -32124)."""
    u = (~u8.astype(np.int32)) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign, -mag, mag).astype(np.int16)


def alaw_decode(u8: np.ndarray) -> np.ndarray:
    """ITU-T G.711 A-law bytes -> int16 (CCITT expansion, audioop scale:
    0x55 -> -8, 0xD5 -> 8)."""
    a = u8.astype(np.int32) ^ 0x55
    sign = a & 0x80
    exp = (a >> 4) & 0x07
    mant = a & 0x0F
    mag = (mant << 4) + 8
    mag = np.where(exp > 0, (mag + 0x100) << (exp - 1), mag)
    # A-law sign bit (after the 0x55 toggle) is 1 for POSITIVE values
    return np.where(sign, mag, -mag).astype(np.int16)


def encode_wav(samples: np.ndarray, *, rate: int = 16000,
               channels: int = 1) -> bytes:
    """int16 sample array (flat, interleaved if multi-channel) -> WAV.

    ``len(samples)`` must be divisible by ``channels``."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    if channels < 1 or len(samples) % channels:
        raise ValueError("sample count must divide evenly into channels")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    body = (
        _WAVE
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return _RIFF + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> dict:
    """WAV bytes -> dict with ``rate``, ``channels``, ``n_frames``,
    ``duration_us`` (exact integer microseconds) and ``samples``
    (int16 array, flat/interleaved)."""
    if data[:4] != _RIFF or data[8:12] != _WAVE:
        raise ValueError("not a RIFF/WAVE file")
    (riff_len,) = struct.unpack("<I", data[4:8])
    if riff_len + 8 > len(data):
        raise ValueError("truncated RIFF payload")
    pos = 12
    fmt = None
    fmt_body = None
    pcm = None
    while pos + 8 <= len(data):
        ctype = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise ValueError(f"truncated WAV chunk {ctype!r}")
        if ctype == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
            fmt_body = body
        elif ctype == b"data":
            pcm = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE
        # fmt extension: cbSize(2) valid_bits(2) channel_mask(4)
        # SubFormat GUID whose first two bytes are the real format tag
        if fmt_body is None or len(fmt_body) < 26:
            raise ValueError("WAV: EXTENSIBLE fmt chunk too short")
        (audio_format,) = struct.unpack("<H", fmt_body[24:26])
    if channels < 1 or rate < 1:
        raise ValueError("WAV: invalid channel count or rate")
    if audio_format == 1:  # integer PCM
        if bits == 8:
            dtype, post = np.dtype(np.uint8), None
        elif bits == 16:
            dtype, post = np.dtype("<i2"), None
        elif bits == 24:
            dtype, post = None, None  # handled below
        elif bits == 32:
            dtype, post = np.dtype("<i4"), None
        else:
            raise ValueError(f"WAV: illegal PCM bit depth {bits}")
    elif audio_format == 3:  # IEEE float
        if bits == 32:
            dtype, post = np.dtype("<f4"), None
        elif bits == 64:
            dtype, post = np.dtype("<f8"), None
        else:
            raise ValueError(f"WAV: illegal float bit depth {bits}")
    elif audio_format in (6, 7):  # G.711 A-law / mu-law
        if bits != 8:
            raise ValueError(f"WAV: G.711 requires 8-bit samples, got {bits}")
        dtype, post = np.dtype(np.uint8), (
            alaw_decode if audio_format == 6 else mulaw_decode)
    else:
        raise NotImplementedError(
            f"WAV audio format {audio_format} not supported "
            "(compressed encodings need a real codec)")
    frame_bytes = channels * bits // 8
    if len(pcm) % frame_bytes:
        raise ValueError("WAV: data size not frame-aligned")
    if audio_format == 1 and bits == 24:
        b = np.frombuffer(pcm, np.uint8).reshape(-1, 3).astype(np.int32)
        val = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        samples = val - ((val & 0x800000) << 1)  # sign-extend
    else:
        samples = np.frombuffer(pcm, dtype=dtype)
        if post is not None:
            samples = post(samples)
    n_frames = len(samples) // channels
    return {
        "rate": rate,
        "channels": channels,
        "n_frames": n_frames,
        "duration_us": n_frames * 1_000_000 // rate,
        "samples": samples,
    }
