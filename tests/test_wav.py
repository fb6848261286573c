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


def _build_wav(fmt_tag: int, bits: int, payload: bytes, *, rate=8000,
               channels=1, extensible=False) -> bytes:
    """Independent spec-based WAV builder for decoder cross-checks."""
    block = max(1, channels * bits // 8)
    tag = 0xFFFE if extensible else fmt_tag
    fmt = struct.pack("<HHIIHH", tag, channels, rate, rate * block,
                      block, bits)
    if extensible:
        guid = struct.pack("<H", fmt_tag) + bytes.fromhex(
            "000000001000800000aa00389b71")
        fmt += struct.pack("<HHI", 22, bits, 0) + guid
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_pcm_8_24_32_bit():
    out = decode_wav(_build_wav(1, 8, bytes([0, 1, 127, 128, 255])))
    assert out["samples"].dtype == np.uint8
    assert out["samples"].tolist() == [0, 1, 127, 128, 255]

    # 24-bit little-endian triplets, sign-extended
    payload = bytes([1, 0, 0]) + bytes([255, 255, 255]) + bytes([0, 0, 128])
    out = decode_wav(_build_wav(1, 24, payload))
    assert out["samples"].tolist() == [1, -1, -(1 << 23)]
    assert out["n_frames"] == 3

    vals = np.array([0, -1, 2**31 - 1, -(2**31)], "<i4")
    out = decode_wav(_build_wav(1, 32, vals.tobytes()))
    assert out["samples"].tolist() == vals.tolist()


def test_ieee_float_32_64():
    f32 = np.array([0.0, -1.5, 0.25, 3.0e5], "<f4")
    out = decode_wav(_build_wav(3, 32, f32.tobytes()))
    assert out["samples"].dtype == np.float32
    assert (out["samples"] == f32).all()
    f64 = np.array([1e-300, -2.5], "<f8")
    out = decode_wav(_build_wav(3, 64, f64.tobytes()))
    assert (out["samples"] == f64).all()


def test_g711_matches_audioop_all_256():
    audioop = pytest.importorskip("audioop")  # stdlib through 3.12
    every = bytes(range(256))
    mu = decode_wav(_build_wav(7, 8, every))["samples"]
    al = decode_wav(_build_wav(6, 8, every))["samples"]
    mu_ref = np.frombuffer(audioop.ulaw2lin(every, 2), "<i2")
    al_ref = np.frombuffer(audioop.alaw2lin(every, 2), "<i2")
    assert mu.tolist() == mu_ref.tolist()
    assert al.tolist() == al_ref.tolist()


def test_extensible_resolves_subformat():
    s = np.array([5, -5, 30000], "<i2")
    out = decode_wav(_build_wav(1, 16, s.tobytes(), extensible=True))
    assert out["samples"].tolist() == s.tolist()


def test_rejects_compressed_and_illegal_depths():
    with pytest.raises(NotImplementedError, match="format 2"):
        decode_wav(_build_wav(2, 4, b"\x00\x00"))  # ADPCM
    with pytest.raises(ValueError, match="illegal PCM bit depth"):
        decode_wav(_build_wav(1, 12, b"\x00\x00"))
    with pytest.raises(ValueError, match="illegal float bit depth"):
        decode_wav(_build_wav(3, 16, b"\x00\x00"))


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
