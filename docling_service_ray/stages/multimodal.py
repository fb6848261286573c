"""Multimodal columns: binary payloads with typed metadata.

Image/audio/video travel as opaque ``binary`` columns + struct metadata;
decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages. PNG decode is REAL (pure-stdlib codec from the
public spec — ``extract.pngcodec``); other formats' codec libraries are
NOT in this container, so those steps are STUBBED behind an import-try
with a clearly-marked deterministic fake — the Ray-side plumbing
(schema, batch sizing, actor signature, output layout) is real and
tested either way.

Payload wire format for the deterministic fake (self-describing header)::

    b"FAKEIMG" | width:uint16 LE | height:uint16 LE | body bytes

Batch-size note: binary payloads are wide rows — stages default to small
``batch_size`` so batch x concurrency fits worker heaps (SURVEY.md §7.4).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
import pyarrow as pa

from ..extract.gifcodec import decode_gif, encode_gif
from ..extract.pngcodec import PNG_SIG, decode_png, encode_png

GIF_SIGS = (b"GIF87a", b"GIF89a")

MAGIC = b"FAKEIMG"
HEADER = struct.Struct("<2H")

META_TYPE = pa.struct(
    [
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_bytes", pa.int64()),
        ("checksum", pa.string()),
        ("codec", pa.string()),
    ]
)


def encode_fake_image(seed_text: str, width: int, height: int) -> bytes:
    """Deterministic pseudo-image payload (stands in for PNG bytes,
    reference app/main.py:711-714)."""
    body = hashlib.blake2b(seed_text.encode(), digest_size=32).digest()
    n = max(1, (width * height) // 64)
    return MAGIC + HEADER.pack(width, height) + body * n


def attach_payload_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Derive a deterministic binary payload column from a text column —
    the fixture generator for multimodal tests/queries."""
    payloads = []
    for t in batch[text_col].to_pylist():
        t = t or ""
        w = 32 + (len(t) % 480)
        h = 32 + (sum(t.encode()[:64]) % 480 if t else 0)
        payloads.append(encode_fake_image(t, w, h))
    return batch.append_column("payload", pa.array(payloads, pa.binary()))


class DecodeImage:
    """Actor-pool decode stage.

    ``__init__`` resolves the codec table once per actor. PNG payloads
    decode for REAL (pure-stdlib codec, ``extract.pngcodec``); FAKEIMG
    payloads use the deterministic parser; anything else raises
    NotImplementedError, recorded per row as ok=False.
    """

    def __init__(self):
        try:  # pragma: no cover - PIL absent in this environment
            from PIL import Image  # noqa: F401

            self.codec = "pil"
        except ImportError:
            self.codec = "fake"

    def decode_one(self, payload: bytes) -> dict:
        if payload[: len(PNG_SIG)] == PNG_SIG:
            info = decode_png(payload)
            return {
                "width": info["width"],
                "height": info["height"],
                "n_bytes": len(payload),
                "checksum": hashlib.blake2b(payload, digest_size=8).hexdigest(),
                "codec": "png",
            }
        if payload[:6] in GIF_SIGS:
            info = decode_gif(payload)
            return {
                "width": info["width"],
                "height": info["height"],
                "n_bytes": len(payload),
                "checksum": hashlib.blake2b(payload, digest_size=8).hexdigest(),
                "codec": "gif",
            }
        if payload[: len(MAGIC)] == MAGIC:
            w, h = HEADER.unpack(
                payload[len(MAGIC) : len(MAGIC) + HEADER.size]
            )
            return {
                "width": w,
                "height": h,
                "n_bytes": len(payload),
                "checksum": hashlib.blake2b(payload, digest_size=8).hexdigest(),
                "codec": "fakeimg",
            }
        if self.codec == "pil":  # pragma: no cover
            raise NotImplementedError("real image decode not wired in this container")
        raise NotImplementedError("unknown payload codec")

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas, oks, errs = [], [], []
        for p in batch["payload"].to_pylist():
            try:
                metas.append(self.decode_one(p))
                oks.append(True)
                errs.append("")
            except Exception as exc:  # noqa: BLE001
                metas.append(
                    {"width": 0, "height": 0, "n_bytes": len(p or b""),
                     "checksum": "", "codec": ""}
                )
                oks.append(False)
                errs.append(f"{type(exc).__name__}: {exc}")
        batch = batch.append_column("image_meta", pa.array(metas, META_TYPE))
        batch = batch.append_column("decode_ok", pa.array(oks, pa.bool_()))
        return batch.append_column("decode_error", pa.array(errs, pa.string()))


def attach_png_payload_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Derive a REAL PNG payload per row: RGB image whose dimensions come
    from the text length and whose flattened pixel bytes follow the
    gradient ``pixel[i] = i % 256`` — a pattern an SQL oracle can mirror
    byte-exactly (dimensions AND pixel sum) without any codec. Rows are
    encoded with the cycling filter choice, so decoding this corpus
    exercises all five PNG scanline filters."""
    payloads = []
    for t in batch[text_col].to_pylist():
        n = len(t or "")
        w = 1 + n % 48
        h = 1 + (n * 7) % 40
        pix = (np.arange(w * h * 3, dtype=np.int64) % 256).astype(np.uint8)
        payloads.append(encode_png(pix.reshape(h, w, 3), filters="cycle"))
    return batch.append_column("payload", pa.array(payloads, pa.binary()))


def attach_gif_payload_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Derive a REAL GIF payload per row: grayscale-palette image whose
    dimensions come from the text length and whose flat palette indices
    follow ``index[i] = i % 256`` — pal[k] = (k, k, k), so the pixel sum
    has the same closed form SQL can mirror as the PNG fixture (x3 for
    the three equal channels)."""
    pal = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    payloads = []
    for t in batch[text_col].to_pylist():
        n = len(t or "")
        w = 1 + (n * 3) % 50
        h = 1 + (n * 11) % 30
        idx = (np.arange(w * h, dtype=np.int64) % 256).astype(np.uint8)
        payloads.append(encode_gif(idx.reshape(h, w), pal))
    return batch.append_column("payload", pa.array(payloads, pa.binary()))


class GifDecodeMeta:
    """Actor-pool REAL-GIF decode stage: full LZW decode + palette
    expansion per payload, emitting dimensions and the exact pixel sum."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, chans, sums = [], [], [], []
        for p in batch["payload"].to_pylist():
            info = decode_gif(p)
            widths.append(info["width"])
            heights.append(info["height"])
            chans.append(info["channels"])
            sums.append(int(info["pixels"].astype(np.int64).sum()))
        out = batch.drop_columns(["payload"])
        out = out.append_column("width", pa.array(widths, pa.int64()))
        out = out.append_column("height", pa.array(heights, pa.int64()))
        out = out.append_column("channels", pa.array(chans, pa.int64()))
        return out.append_column("pixel_sum", pa.array(sums, pa.int64()))


class PngDecodeMeta:
    """Actor-pool REAL-PNG decode stage: full decode (inflate + de-filter)
    per payload, emitting dimensions, channel count and the exact pixel
    sum — the fields an SQL oracle can check independently."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, chans, sums = [], [], [], []
        for p in batch["payload"].to_pylist():
            info = decode_png(p)
            widths.append(info["width"])
            heights.append(info["height"])
            chans.append(info["channels"])
            sums.append(int(info["pixels"].astype(np.int64).sum()))
        out = batch.drop_columns(["payload"])
        out = out.append_column("width", pa.array(widths, pa.int64()))
        out = out.append_column("height", pa.array(heights, pa.int64()))
        out = out.append_column("channels", pa.array(chans, pa.int64()))
        return out.append_column("pixel_sum", pa.array(sums, pa.int64()))


def attach_wav_payload_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Derive a REAL WAV payload per row: 16 kHz PCM-16 whose frame count
    and channel count come from the text length and whose flat sample
    values follow ``sample[i] = i - 32768`` — so an SQL oracle can mirror
    rate/channels/frames/duration AND the exact integer sum of squared
    samples with closed-form arithmetic, no codec."""
    from ..extract.wavcodec import encode_wav

    payloads = []
    for t in batch[text_col].to_pylist():
        n = len(t or "")
        channels = 1 + n % 2
        n_frames = 100 + (n * 13) % 1000
        v = n_frames * channels
        samples = (np.arange(v, dtype=np.int64) - 32768).astype(np.int16)
        payloads.append(encode_wav(samples, rate=16000, channels=channels))
    return batch.append_column("payload", pa.array(payloads, pa.binary()))


class WavDecodeMeta:
    """Actor-pool REAL-WAV decode stage: full RIFF parse + PCM read per
    payload, emitting rate/channels/frames/exact duration and the exact
    integer sum of squared samples (the loudness-energy statistic an SQL
    oracle can check independently)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..extract.wavcodec import decode_wav

        rates, chans, frames, durs, sumsqs = [], [], [], [], []
        for p in batch["payload"].to_pylist():
            info = decode_wav(p)
            rates.append(info["rate"])
            chans.append(info["channels"])
            frames.append(info["n_frames"])
            durs.append(info["duration_us"])
            s = info["samples"].astype(np.int64)
            sumsqs.append(int((s * s).sum()))
        out = batch.drop_columns(["payload"])
        out = out.append_column("rate", pa.array(rates, pa.int64()))
        out = out.append_column("channels", pa.array(chans, pa.int64()))
        out = out.append_column("n_frames", pa.array(frames, pa.int64()))
        out = out.append_column("duration_us", pa.array(durs, pa.int64()))
        return out.append_column("pcm_sumsq", pa.array(sumsqs, pa.int64()))


class ResizeFilter:
    """Min-size + zone analog for binary images: drop images smaller than
    min_px on either side (the reference's 50px filter, app/main.py:574-575)
    and compute the normalized area ratio vs a nominal page."""

    PAGE_W, PAGE_H = 612.0, 792.0

    def __init__(self, min_px: int = 50, min_area_frac: float = 0.005):
        self.min_px = min_px
        self.min_area_frac = min_area_frac

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # zero-copy struct-field projection (no Python dict conversion)
        meta = batch["image_meta"]
        w = pc.struct_field(meta, "width").to_numpy(zero_copy_only=False)
        h = pc.struct_field(meta, "height").to_numpy(zero_copy_only=False)
        area_frac = (w * h) / (self.PAGE_W * self.PAGE_H)
        keep = (w >= self.min_px) & (h >= self.min_px) & (
            area_frac >= self.min_area_frac
        )
        return batch.filter(pa.array(keep))


class FeatureExtract:
    """Actor-pool feature extraction over binary payloads: a 64-bin byte
    histogram, L1-normalized — a real, deterministic, fully vectorized
    stand-in for a visual-embedding model (the model slot is the actor;
    swap ``features_of`` for a real encoder + ``num_gpus`` when codec/
    model libs exist). Output: ``features: list<float>`` (fixed dim),
    ready for the ANN / embedding-dedup stages."""

    DIM = 64

    def __init__(self):
        # per-actor state: the bin mapping (a real model would load
        # weights here, once per actor — ST1 pattern)
        self.bins = np.arange(257) * self.DIM // 256

    def features_of(self, payload: bytes) -> np.ndarray:
        if not payload:
            return np.zeros(self.DIM, dtype=np.float32)
        raw = np.frombuffer(payload, dtype=np.uint8)
        hist = np.bincount(self.bins[raw], minlength=self.DIM).astype(np.float32)
        total = hist.sum()
        return hist / total if total else hist

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self.features_of(p) for p in batch["payload"].to_pylist()]
        return batch.append_column(
            "features",
            pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
        )


def sample_frames_batch(batch: pa.Table, every_n_bytes: int = 4096,
                        max_frames: int = 8) -> pa.Table:
    """'Video' frame sampling stub: deterministic byte-offset sampling of a
    binary payload into a list<binary> column of pseudo-frames."""
    frames_col = []
    for p in batch["payload"].to_pylist():
        p = p or b""
        offsets = range(0, min(len(p), every_n_bytes * max_frames), every_n_bytes)
        frames_col.append([p[o : o + 64] for o in offsets])
    return batch.append_column(
        "frames", pa.array(frames_col, pa.list_(pa.binary()))
    )


class GifFrameSample:
    """REAL frame sampling for the one animated container the stdlib
    codecs decode: every ``stride``-th composited frame of an animated
    GIF payload, re-encoded as PNG, emitted as a ``list<binary>`` column
    plus the total frame count. The moving-picture analog of
    :func:`sample_frames_batch`'s byte-offset stub — decode, composite
    (transparency + disposal), sample, re-encode all run for real.

    Actor-pool stage: ``map_batches(GifFrameSample, batch_format="pyarrow",
    concurrency=N)``; undecodable payloads yield an empty frame list and
    ``n_frames_total = 0`` (row-level, never a task error)."""

    def __init__(self, stride: int = 2, max_frames: int = 8):
        self.stride = stride
        self.max_frames = max_frames

    def sample_one(self, payload: bytes) -> tuple[list[bytes], int]:
        info = decode_gif(payload)
        picked = info["frames"][:: self.stride][: self.max_frames]
        return [encode_png(f) for f in picked], info["n_frames"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        frames_col, totals = [], []
        for p in batch["payload"].to_pylist():
            try:
                frames, total = self.sample_one(p or b"")
            except Exception:  # noqa: BLE001 — row-level degradation,
                frames, total = [], 0  # same contract as DecodeImage
            frames_col.append(frames)
            totals.append(total)
        return batch.append_column(
            "frames", pa.array(frames_col, pa.list_(pa.binary()))
        ).append_column("n_frames_total", pa.array(totals, pa.int64()))
