"""Pure-stdlib WAV (RIFF PCM) codec — the public RIFF/WAVE format.

``decode_wav``: RIFF/WAVE header walk (fmt / data chunks), PCM-16
validation, samples as an int16 numpy array plus typed metadata.
``encode_wav``: int16 samples -> WAV bytes. Non-PCM encodings and other
bit depths raise ``NotImplementedError`` — loud, never a fake answer.

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
    pcm = None
    while pos + 8 <= len(data):
        ctype = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise ValueError(f"truncated WAV chunk {ctype!r}")
        if ctype == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif ctype == b"data":
            pcm = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format != 1:
        raise NotImplementedError(
            f"WAV audio format {audio_format} not supported (PCM only)")
    if bits != 16:
        raise NotImplementedError(f"WAV bit depth {bits} not supported")
    if channels < 1 or rate < 1:
        raise ValueError("WAV: invalid channel count or rate")
    if len(pcm) % (channels * 2):
        raise ValueError("WAV: data size not frame-aligned")
    samples = np.frombuffer(pcm, dtype="<i2")
    n_frames = len(samples) // channels
    return {
        "rate": rate,
        "channels": channels,
        "n_frames": n_frames,
        "duration_us": n_frames * 1_000_000 // rate,
        "samples": samples,
    }
