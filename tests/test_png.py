"""Pure-stdlib PNG codec tests: spec predictor cases, encode/decode
roundtrips over every filter type and channel count, a frozen golden
byte string (decoder pinned independently of the encoder), palette
expansion, 16-bit / sub-byte depths and Adam7 interlacing decoded
against an independent spec-based builder, and the loud failure modes
(illegal depth/color combos, CRC)."""

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


# ---------------------------------------------------------------------------
# Independent spec-based builder: constructs PNG streams (any legal depth,
# Adam7 or progressive, any filter type) straight from the W3C spec
# formulas — a from-scratch cross-check of the decoder, sharing no
# reconstruction code with it.
# ---------------------------------------------------------------------------
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _pack_row(samples: np.ndarray, depth: int) -> bytes:
    if depth == 8:
        return bytes(samples.astype(np.uint8))
    if depth == 16:
        out = np.empty(len(samples) * 2, np.uint8)
        out[0::2] = samples >> 8
        out[1::2] = samples & 0xFF
        return bytes(out)
    bits = ((samples[:, None] >> np.arange(depth - 1, -1, -1)) & 1).reshape(-1)
    pad = (-len(bits)) % 8
    bits = np.concatenate([bits, np.zeros(pad, bits.dtype)])
    return bytes(np.packbits(bits.astype(np.uint8)))


def _forward_filter(cur, prev, bpp, ft):
    cur = cur.astype(np.int64)
    prev = prev.astype(np.int64)
    left = np.zeros_like(cur)
    left[bpp:] = cur[:-bpp]
    upleft = np.zeros_like(prev)
    upleft[bpp:] = prev[:-bpp]
    if ft == 0:
        return cur
    if ft == 1:
        return (cur - left) % 256
    if ft == 2:
        return (cur - prev) % 256
    if ft == 3:
        return (cur - (left + prev) // 2) % 256
    p = left + prev - upleft
    pa, pb, pc = abs(p - left), abs(p - prev), abs(p - upleft)
    pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft))
    return (cur - pred) % 256


def _build_png(pixels: np.ndarray, depth: int, color: int, *,
               interlace: int = 0, palette: bytes | None = None,
               filters: str | int = 0) -> bytes:
    h, w, ch = pixels.shape
    bpp = max(1, (depth * ch) // 8)
    stream = b""
    passes = _ADAM7 if interlace else ((0, 0, 1, 1),)
    for x0, y0, dx, dy in passes:
        sub = pixels[y0::dy, x0::dx]
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            continue
        prev = None
        for y in range(ph):
            raw = np.frombuffer(
                _pack_row(sub[y].reshape(-1), depth), np.uint8)
            ft = (y % 5) if filters == "cycle" else int(filters)
            enc = _forward_filter(
                raw, prev if prev is not None else np.zeros_like(raw),
                bpp, ft)
            stream += bytes([ft]) + bytes(enc.astype(np.uint8))
            prev = raw
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    out = PNG_SIG + _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", palette)
    return out + _chunk(b"IDAT", zlib.compress(stream)) + _chunk(b"IEND", b"")


def test_16bit_decode_all_filters():
    rng = np.random.default_rng(3)
    for color, ch in [(0, 1), (2, 3), (4, 2), (6, 4)]:
        a = rng.integers(0, 65536, size=(5, 7, ch)).astype(np.uint16)
        out = decode_png(_build_png(a, 16, color, filters="cycle"))
        assert out["bit_depth"] == 16 and out["pixels"].dtype == np.uint16
        assert (out["pixels"] == a).all()


def test_adam7_decode_matches_progressive():
    rng = np.random.default_rng(4)
    for (h, w) in [(1, 1), (3, 3), (7, 7), (8, 8), (9, 10), (16, 5)]:
        a = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        inter = decode_png(_build_png(a, 8, 2, interlace=1, filters="cycle"))
        prog = decode_png(_build_png(a, 8, 2, interlace=0, filters="cycle"))
        assert (inter["pixels"] == a).all()
        assert (prog["pixels"] == inter["pixels"]).all()
    # 16-bit interlaced too
    a16 = rng.integers(0, 65536, size=(9, 6, 1)).astype(np.uint16)
    out = decode_png(_build_png(a16, 16, 0, interlace=1, filters="cycle"))
    assert (out["pixels"] == a16).all()


def test_subbyte_depths_gray_and_palette():
    rng = np.random.default_rng(5)
    for depth in (1, 2, 4):
        a = rng.integers(0, 1 << depth, size=(6, 11, 1)).astype(np.uint8)
        for interlace in (0, 1):
            out = decode_png(_build_png(a, depth, 0, interlace=interlace))
            assert out["bit_depth"] == depth
            assert (out["pixels"] == a).all(), (depth, interlace)
    # 4-bit palette indices expand to RGB
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    idx = np.array([[0, 1, 2], [2, 1, 0]], np.uint8)[:, :, None]
    out = decode_png(_build_png(idx, 4, 3, palette=plte))
    assert out["channels"] == 3
    assert out["pixels"][0, 2].tolist() == [0, 0, 255]
    assert out["pixels"][1, 0].tolist() == [0, 0, 255]


def test_illegal_depth_color_combo_rejected():
    # depth 3 is illegal for every color type
    with pytest.raises(ValueError, match="illegal bit depth"):
        decode_png(_mutate_ihdr(8, 3))
    # depth 16 is illegal for palette (color type 3)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0)
    data = (PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00" * 10))
            + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="illegal bit depth"):
        decode_png(data)


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


def test_hostile_dimensions_rejected_before_allocation():
    # 60000 x 60000 RGB header (needs ~10.8 GB) with a tiny IDAT: must
    # raise the guard instantly, not allocate or inflate
    ihdr = struct.pack(">IIBBBBB", 60000, 60000, 8, 2, 0, 0, 0)
    data = (PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00" * 64))
            + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="max_bytes"):
        decode_png(data)
    # trusted override still applies the normal size checks
    with pytest.raises(ValueError, match="size mismatch"):
        decode_png(data, max_bytes=1 << 40)


def test_zip_bomb_inflate_is_bounded():
    # IDAT inflating far past the declared 2x2 image must fail the size
    # check without materializing the bomb
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    bomb = zlib.compress(b"\x00" * (50 << 20))  # 50 MB of zeros
    data = (PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", bomb)
            + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="size mismatch"):
        decode_png(data)
