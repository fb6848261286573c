"""Pure-stdlib WAV codec tests: roundtrips, chunk-walk edge cases, loud
failure modes, and the oracle-formula fixture."""

import struct

import numpy as np
import pytest

from docling_service_ray.extract.wavcodec import decode_wav, encode_wav


def test_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(9)
    for ch in (1, 2, 4):
        s = rng.integers(-32768, 32768, size=120 * ch).astype(np.int16)
        out = decode_wav(encode_wav(s, rate=8000, channels=ch))
        assert out["rate"] == 8000 and out["channels"] == ch
        assert out["n_frames"] == 120
        assert (out["samples"] == s).all()


def test_duration_exact_integer_us():
    s = np.zeros(16000 * 3 + 7, dtype=np.int16)
    out = decode_wav(encode_wav(s, rate=16000, channels=1))
    assert out["duration_us"] == (16000 * 3 + 7) * 1_000_000 // 16000


def test_odd_chunk_padding_and_extra_chunks():
    # a LIST chunk with odd length before data: the walker must skip the
    # RIFF pad byte to find the data chunk
    s = np.arange(10, dtype=np.int16)
    wav = bytearray(encode_wav(s, rate=4000, channels=1))
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded
    wav[12:12] = extra
    wav[4:8] = struct.pack("<I", struct.unpack("<I", bytes(wav[4:8]))[0]
                           + len(extra))
    out = decode_wav(bytes(wav))
    assert (out["samples"] == s).all()


def test_rejects_non_pcm_and_wrong_depth():
    s = np.zeros(4, dtype=np.int16)
    wav = bytearray(encode_wav(s, rate=4000, channels=1))
    fmt_off = wav.index(b"fmt ") + 8
    wav[fmt_off:fmt_off + 2] = struct.pack("<H", 3)  # IEEE float
    with pytest.raises(NotImplementedError, match="PCM"):
        decode_wav(bytes(wav))
    wav[fmt_off:fmt_off + 2] = struct.pack("<H", 1)
    wav[fmt_off + 14:fmt_off + 16] = struct.pack("<H", 8)
    with pytest.raises(NotImplementedError, match="bit depth"):
        decode_wav(bytes(wav))


def test_rejects_garbage_and_truncation():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"NOTAWAVFILE!")
    good = encode_wav(np.zeros(100, dtype=np.int16))
    with pytest.raises(ValueError):
        decode_wav(good[:40])


def test_fixture_matches_oracle_formula():
    import pyarrow as pa

    from docling_service_ray.stages.multimodal import (
        WavDecodeMeta,
        attach_wav_payload_batch,
    )

    texts = ["", "x" * 11, "y" * 500]
    batch = pa.table({"doc_id": [1, 2, 3], "text": texts})
    out = WavDecodeMeta()(attach_wav_payload_batch(batch))
    for i, t in enumerate(texts):
        n = len(t)
        ch = 1 + n % 2
        nf = 100 + (n * 13) % 1000
        v = nf * ch
        sumsq = ((v - 1) * v * (2 * v - 1)) // 6 - 32768 * v * (v - 1) \
            + v * 1073741824
        assert out["channels"][i].as_py() == ch
        assert out["n_frames"][i].as_py() == nf
        assert out["duration_us"][i].as_py() == nf * 1_000_000 // 16000
        assert out["pcm_sumsq"][i].as_py() == sumsq
