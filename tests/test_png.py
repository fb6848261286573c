"""Pure-stdlib PNG codec tests: spec predictor cases, encode/decode
roundtrips over every filter type and channel count, a frozen golden
byte string (decoder pinned independently of the encoder), palette
expansion, and the loud failure modes (Adam7, odd bit depths, CRC)."""

import struct
import zlib

import numpy as np
import pytest

from docling_service_ray.extract.pngcodec import (
    PNG_SIG,
    _chunk,
    decode_png,
    encode_png,
    paeth_predictor,
)

# 5x7 RGB gradient (pixel[i] = i % 256), cycling filters — produced once
# by encode_png and frozen; decoding must keep working even if the
# encoder changes.
GOLDEN_HEX = (
    "89504e470d0a1a0a0000000d494844520000000700000005080200000006f8618f"
    "0000003349444154789c636060646266616563e7e0e4e2e6e1e5e3171014121661"
    "14151367c6004ca2d800b396b6360f066001c96000000bbf04dbbc74a336000000"
    "0049454e44ae426082"
)


def test_paeth_spec_cases():
    # p = a + b - c; nearest of (a, b, c) wins, ties a > b > c
    assert paeth_predictor(0, 0, 0) == 0
    assert paeth_predictor(10, 20, 15) == 15   # pc == 0
    assert paeth_predictor(255, 0, 255) == 0   # pb == 0
    assert paeth_predictor(5, 100, 200) == 5   # pa smallest
    assert paeth_predictor(7, 7, 7) == 7


def test_roundtrip_all_filters_channels():
    rng = np.random.default_rng(7)
    for ch in (1, 2, 3, 4):
        for (h, w) in [(1, 1), (5, 3), (13, 17)]:
            for f in ("cycle", 0, 1, 2, 3, 4):
                a = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
                out = decode_png(encode_png(a, filters=f))
                assert out["pixels"].shape == (h, w, ch)
                assert (out["pixels"] == a).all()
                assert out["channels"] == ch


def test_grayscale_2d_input():
    a = np.arange(24, dtype=np.uint8).reshape(4, 6)
    out = decode_png(encode_png(a))
    assert out["channels"] == 1
    assert (out["pixels"][:, :, 0] == a).all()


def test_golden_bytes_decode():
    out = decode_png(bytes.fromhex(GOLDEN_HEX))
    assert (out["width"], out["height"], out["channels"]) == (7, 5, 3)
    expect = (np.arange(7 * 5 * 3) % 256).astype(np.uint8).reshape(5, 7, 3)
    assert (out["pixels"] == expect).all()


def test_palette_expansion():
    # hand-build a color-type-3 PNG: 2x2 indices into a 3-entry palette
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    scan = bytes([0, 0, 1, 0, 2, 0])  # filter 0 rows: (0,1), (2,0)
    idat = zlib.compress(scan)
    data = (PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", plte)
            + _chunk(b"IDAT", idat) + _chunk(b"IEND", b""))
    out = decode_png(data)
    assert out["channels"] == 3
    assert out["pixels"].tolist() == [
        [[255, 0, 0], [0, 255, 0]],
        [[0, 0, 255], [255, 0, 0]],
    ]


def _mutate_ihdr(field_offset: int, value: int) -> bytes:
    ihdr = bytearray(struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
    ihdr[field_offset] = value
    scan = zlib.compress(bytes(2 * (1 + 6)))
    return (PNG_SIG + _chunk(b"IHDR", bytes(ihdr))
            + _chunk(b"IDAT", scan) + _chunk(b"IEND", b""))


def test_interlaced_raises_not_implemented():
    with pytest.raises(NotImplementedError, match="Adam7"):
        decode_png(_mutate_ihdr(12, 1))


def test_bit_depth_raises_not_implemented():
    with pytest.raises(NotImplementedError, match="bit depth"):
        decode_png(_mutate_ihdr(8, 16))


def test_bad_signature_and_crc():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNKJUNKJUNK")
    good = encode_png(np.zeros((2, 2, 3), np.uint8))
    corrupt = bytearray(good)
    corrupt[40] ^= 0xFF  # inside IDAT body -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupt))


def test_decode_image_actor_dispatches_png():
    from docling_service_ray.stages.multimodal import DecodeImage

    payload = encode_png(np.zeros((60, 70, 3), np.uint8))
    meta = DecodeImage().decode_one(payload)
    assert meta["codec"] == "png"
    assert (meta["width"], meta["height"]) == (70, 60)
    assert meta["n_bytes"] == len(payload)


def test_png_payload_fixture_matches_formula():
    import pyarrow as pa

    from docling_service_ray.stages.multimodal import (
        PngDecodeMeta,
        attach_png_payload_batch,
    )

    texts = ["", "a" * 10, "b" * 100, "c" * 3000]
    batch = pa.table({"doc_id": list(range(4)), "text": texts})
    decoded = PngDecodeMeta()(attach_png_payload_batch(batch))
    for i, t in enumerate(texts):
        n = len(t)
        w, h = 1 + n % 48, 1 + (n * 7) % 40
        npx = w * h * 3
        expect_sum = (npx // 256) * 32640 + (npx % 256) * ((npx % 256) - 1) // 2
        assert decoded["width"][i].as_py() == w
        assert decoded["height"][i].as_py() == h
        assert decoded["channels"][i].as_py() == 3
        assert decoded["pixel_sum"][i].as_py() == expect_sum
