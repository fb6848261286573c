"""Pure-stdlib GIF codec tests: LZW roundtrips incl. dictionary growth
and the 4096 reset, extension skipping, loud failure modes, and the
oracle-formula fixture."""

import struct

import numpy as np
import pytest

from docling_service_ray.extract.gifcodec import decode_gif, encode_gif


def test_roundtrip_random_palettes():
    rng = np.random.default_rng(11)
    for (h, w, npal) in [(1, 1, 2), (7, 5, 4), (31, 47, 256), (3, 200, 7)]:
        pal = rng.integers(0, 256, size=(npal, 3)).astype(np.uint8)
        idx = rng.integers(0, npal, size=(h, w)).astype(np.uint8)
        out = decode_gif(encode_gif(idx, pal))
        assert (out["width"], out["height"]) == (w, h)
        assert (out["pixels"] == pal[idx]).all()


def test_lzw_dictionary_growth_and_reset():
    # 90k pixels of long runs: codes grow to 12 bits and the table
    # resets at 4096 — the decoder must follow both transitions
    idx = np.zeros((300, 300), np.uint8)
    idx[::3, :] = 1
    pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    out = decode_gif(encode_gif(idx, pal))
    assert (out["pixels"] == pal[idx]).all()


def test_extension_blocks_are_skipped():
    idx = np.arange(4, dtype=np.uint8).reshape(2, 2)
    pal = np.stack([np.arange(4, dtype=np.uint8)] * 3, axis=1)
    gif = bytearray(encode_gif(idx, pal))
    # inject a graphic-control extension before the image descriptor
    img_at = gif.index(0x2C, 13)
    ext = bytes([0x21, 0xF9, 0x04, 0, 0, 0, 0, 0])
    gif[img_at:img_at] = ext
    out = decode_gif(bytes(gif))
    assert (out["pixels"] == pal[idx]).all()


def test_interlaced_decodes_to_display_order():
    # an interlaced encoder stores rows in 4-pass order; build that by
    # encoding the PERMUTED row matrix and flipping the interlace flag —
    # the decoder must hand back display order
    from docling_service_ray.extract.gifcodec import _deinterlace_rows

    rng = np.random.default_rng(8)
    for h in (1, 2, 5, 8, 13):
        idx = rng.integers(0, 4, size=(h, 6)).astype(np.uint8)
        pal = np.stack([np.arange(4, dtype=np.uint8) * 60] * 3, axis=1)
        stored = idx[_deinterlace_rows(h)]  # rows in pass order
        gif = bytearray(encode_gif(stored, pal))
        desc = gif.index(0x2C, 13)
        gif[desc + 9] |= 0x40  # set interlace flag
        out = decode_gif(bytes(gif))
        assert (out["pixels"] == pal[idx]).all(), h


def _image_block(idx: np.ndarray, *, left=0, top=0, interlace=False) -> bytes:
    """Hand-built image descriptor + LZW data (uses the encoder's LZW)."""
    import struct

    from docling_service_ray.extract.gifcodec import _lzw_encode

    h, w = idx.shape
    lzw = _lzw_encode(idx.reshape(-1), 2)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks.extend(chunk)
    blocks.append(0)
    return (b"\x2C"
            + struct.pack("<HHHHB", left, top, w, h, 0x40 if interlace else 0)
            + bytes([2]) + bytes(blocks))


def _gce(*, transparent=None, disposal=0) -> bytes:
    packed = (disposal << 2) | (1 if transparent is not None else 0)
    return bytes([0x21, 0xF9, 0x04, packed, 0, 0,
                  transparent if transparent is not None else 0, 0])


def test_animated_transparency_and_disposal():
    import struct

    pal = np.array([[10, 0, 0], [0, 20, 0], [0, 0, 30], [5, 5, 5]], np.uint8)
    screen = struct.pack("<HHBBB", 4, 4, 0x80 | 1, 3, 0)  # bg = index 3
    f1 = np.zeros((4, 4), np.uint8)          # full screen of color 0
    f2 = np.full((2, 2), 1, np.uint8)        # patch at (1,1), disposal 2
    f2[0, 0] = 2                             # transparent index 2: shows f1
    f3 = np.full((1, 1), 1, np.uint8)        # after bg-restore of f2 region
    gif = (b"GIF89a" + screen + pal.tobytes()
           + _image_block(f1)
           + _gce(transparent=2, disposal=2) + _image_block(f2, left=1, top=1)
           + _image_block(f3)
           + b"\x3B")
    out = decode_gif(gif)
    assert (out["width"], out["height"], out["n_frames"]) == (4, 4, 3)
    fr = out["frames"]
    assert (fr[0] == pal[0]).all()                     # frame 1: color 0
    assert fr[1][1, 1].tolist() == pal[0].tolist()     # transparent -> f1
    assert fr[1][1, 2].tolist() == pal[1].tolist()     # painted patch
    assert fr[1][2, 1].tolist() == pal[1].tolist()
    # frame 3: f2's region restored to BACKGROUND (index 3), then a
    # single pixel of color 1 painted at (0,0)
    assert fr[2][0, 0].tolist() == pal[1].tolist()
    assert fr[2][1, 1].tolist() == pal[3].tolist()     # bg-restored
    assert fr[2][2, 2].tolist() == pal[3].tolist()
    assert fr[2][3, 3].tolist() == pal[0].tolist()     # untouched by f2
    assert (out["pixels"] == fr[0]).all()              # back-compat


def test_frame_outside_screen_rejected():
    import struct

    pal = np.array([[0, 0, 0]], np.uint8)
    screen = struct.pack("<HHBBB", 2, 2, 0x80, 0, 0)
    gif = (b"GIF89a" + screen + np.zeros((2, 3), np.uint8).tobytes()
           + _image_block(np.zeros((2, 2), np.uint8), left=1, top=0)
           + b"\x3B")
    with pytest.raises(ValueError, match="outside the logical screen"):
        decode_gif(gif)


def test_rejects_garbage_and_truncation():
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTAGIF89a!!")
    good = encode_gif(np.zeros((4, 4), np.uint8),
                      np.array([[1, 2, 3]], np.uint8))
    with pytest.raises(Exception):
        decode_gif(good[:20])


def test_decode_image_actor_dispatches_gif():
    from docling_service_ray.stages.multimodal import DecodeImage

    pal = np.array([[9, 9, 9]], np.uint8)
    payload = encode_gif(np.zeros((60, 70), np.uint8), pal)
    meta = DecodeImage().decode_one(payload)
    assert meta["codec"] == "gif"
    assert (meta["width"], meta["height"]) == (70, 60)


def test_gif_fixture_matches_formula():
    import pyarrow as pa

    from docling_service_ray.stages.multimodal import (
        GifDecodeMeta,
        attach_gif_payload_batch,
    )

    texts = ["", "a" * 9, "b" * 333]
    batch = pa.table({"doc_id": [1, 2, 3], "text": texts})
    out = GifDecodeMeta()(attach_gif_payload_batch(batch))
    for i, t in enumerate(texts):
        n = len(t)
        w, h = 1 + (n * 3) % 50, 1 + (n * 11) % 30
        npx = w * h
        expect = 3 * ((npx // 256) * 32640
                      + (npx % 256) * ((npx % 256) - 1) // 2)
        assert out["width"][i].as_py() == w
        assert out["height"][i].as_py() == h
        assert out["pixel_sum"][i].as_py() == expect


def test_lzw_end_code_width_at_boundary():
    """Strict decoders widen BEFORE reading END when the final data code
    lands exactly on a code-width boundary — the encoder must emit END at
    the widened width. Scanning lengths guarantees several streams end
    exactly on a boundary (regression for the END-width fix)."""
    from docling_service_ray.extract.gifcodec import (
        _BitReader,
        _lzw_encode,
    )

    rng = np.random.default_rng(3)
    base = rng.integers(0, 4, size=600).astype(np.uint8)
    mcs = 2
    clear, end = 1 << mcs, (1 << mcs) + 1
    for n in range(1, 601):
        idx = base[:n]
        data = _lzw_encode(idx.reshape(1, -1), mcs)
        # strict decoder: follows the spec width bumps and REQUIRES a
        # well-formed END code (unlike the module decoder, which stops
        # at pixel count)
        reader = _BitReader(data)
        table = {i: bytes([i]) for i in range(clear)}
        width, next_code, prev = mcs + 1, end + 1, None
        out = bytearray()
        while True:
            code = reader.read(width)
            if code == clear:
                table = {i: bytes([i]) for i in range(clear)}
                width, next_code, prev = mcs + 1, end + 1, None
                continue
            if code == end:
                break
            if prev is None or code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]
            else:
                raise AssertionError(
                    f"invalid code {code} at n={n} (END-width bug)")
            out += entry
            if prev is not None and next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
        assert bytes(out) == idx.tobytes(), f"pixel mismatch at n={n}"


def test_gif_frame_sample_stage(ray_session):
    """Animated GIF -> every-2nd composited frame re-encoded as PNG,
    through the actor-pool stage; PNG-decoding a sampled frame must give
    back the composited pixels, and broken payloads degrade row-level."""
    import ray.data as rd

    from docling_service_ray.extract.pngcodec import decode_png
    from docling_service_ray.stages.multimodal import GifFrameSample

    import struct
    pal = np.array([[10, 0, 0], [0, 20, 0], [0, 0, 30], [5, 5, 5]], np.uint8)
    screen = struct.pack("<HHBBB", 4, 4, 0x80 | 1, 3, 0)
    gif = (b"GIF89a" + screen + pal.tobytes()
           + _image_block(np.zeros((4, 4), np.uint8))
           + _image_block(np.full((2, 2), 1, np.uint8), left=1, top=1)
           + _image_block(np.full((1, 1), 2, np.uint8))
           + b"\x3B")
    expected = decode_gif(gif)["frames"]

    import pyarrow as pa
    ds = rd.from_arrow(pa.table({"doc_id": [1, 2],
                                 "payload": [gif, b"notagif"]}))
    out = ds.map_batches(GifFrameSample, batch_format="pyarrow",
                         concurrency=1).to_pandas().set_index("doc_id")
    ok = out.loc[1]
    assert ok["n_frames_total"] == 3
    assert len(ok["frames"]) == 2            # frames 0 and 2 (stride 2)
    for png_bytes, frame_idx in zip(ok["frames"], (0, 2)):
        px = decode_png(bytes(png_bytes))["pixels"]
        assert (px == expected[frame_idx]).all()
    bad = out.loc[2]
    assert bad["n_frames_total"] == 0 and len(bad["frames"]) == 0


def test_hostile_screen_and_frame_flood_rejected():
    pal = np.array([[1, 2, 3]], np.uint8)
    # 60000 x 60000 screen (~10.8 GB canvas)
    screen = struct.pack("<HHBBB", 60000, 60000, 0x80, 0, 0)
    gif = b"GIF89a" + screen + pal.tobytes() * 2 + b"\x3B"
    with pytest.raises(ValueError, match="max_bytes"):
        decode_gif(gif)
    # frame flood: many tiny frames on a sizable screen
    screen = struct.pack("<HHBBB", 200, 200, 0x80, 0, 0)
    block = _image_block(np.zeros((1, 1), np.uint8))
    gif = (b"GIF89a" + screen + pal.tobytes() * 2 + block * 50 + b"\x3B")
    with pytest.raises(ValueError, match="frame-flood"):
        decode_gif(gif, max_bytes=200 * 200 * 3 * 10)  # cap at 10 frames
