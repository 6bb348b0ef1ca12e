"""Multimodal (image/audio/video) column plumbing — decode STUBBED.

Media rides as opaque ``binary`` columns with typed metadata columns
(mime, width/height/duration). The Ray-side plumbing — schemas, actor-pool
stages, small batch sizes for large payloads, output layout — is real and
tested; the actual codec calls are STUBS because no image/audio libraries
exist in this container:

- ``decode=`"strict"`` raises ``NotImplementedError`` (the honest stub),
- ``decode="fake"`` (default in tests) produces a DETERMINISTIC FAKE
  decode derived from the payload bytes, so downstream feature/resize
  plumbing is exercised end-to-end with stable results.

Swap ``_decode_image_bytes`` for a real PIL/libvips call on a real
cluster; nothing else changes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.arrow_utils import as_combined

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("mime", pa.string()),
    ("payload", pa.binary()),
    ("width", pa.int32()),
    ("height", pa.int32()),
])


def gen_media_table(n: int, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media table for tests/benches (binary payloads)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=payload_bytes, dtype=np.uint8).tobytes()
                for _ in range(n)]
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "mime": pa.array(["image/png" if i % 2 == 0 else "image/jpeg"
                          for i in range(n)]),
        "payload": pa.array(payloads, type=pa.binary()),
        "width": pa.array(rng.integers(64, 1024, size=n, dtype=np.int32)),
        "height": pa.array(rng.integers(64, 1024, size=n, dtype=np.int32)),
    }, schema=MEDIA_SCHEMA)


def _decode_image_bytes(payload: bytes, mode: str) -> np.ndarray:
    """STUB decode. strict → NotImplementedError; fake → deterministic
    8×8×3 uint8 'image' derived from the payload bytes."""
    if mode == "strict":
        raise NotImplementedError(
            "image decoding requires PIL/libvips, not present in this "
            "container; run with decode='fake' or install a codec"
        )
    arr = np.frombuffer(payload[: 8 * 8 * 3], dtype=np.uint8)
    if arr.size < 8 * 8 * 3:
        arr = np.pad(arr, (0, 8 * 8 * 3 - arr.size))
    return arr.reshape(8, 8, 3)


class ImageFeatureStage:
    """Actor-pool stage: decode (stubbed) → per-image feature vector.

    Real plumbing: runs as ``map_batches(ImageFeatureStage,
    concurrency=N, batch_size=small)`` — batch_size must be small because
    each row carries a large binary payload (SURVEY.md 'memory-aware').
    Features: 16-dim channel-histogram of the (fake-)decoded image —
    deterministic, so tests can assert exact values.
    """

    def __init__(self, decode: str = "fake", feature_dim: int = 16):
        if decode not in ("fake", "strict"):
            raise ValueError("decode must be 'fake' or 'strict'")
        self.decode = decode
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = as_combined(batch["payload"]).to_pylist()
        feats = np.zeros((len(payloads), self.feature_dim), dtype=np.float32)
        for i, p in enumerate(payloads):
            img = _decode_image_bytes(p or b"", self.decode)
            hist, _ = np.histogram(img, bins=self.feature_dim, range=(0, 256))
            feats[i] = hist / max(1, img.size)
        feat_col = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1), type=pa.float32()), self.feature_dim
        )
        return batch.drop_columns(["payload"]).append_column("features", feat_col)


class FrameSampleStage:
    """Video-style frame sampling plumbing: N pseudo-frames per payload,
    exploded to one row per frame (flat_map shape done batch-wise)."""

    def __init__(self, n_frames: int = 4, decode: str = "fake"):
        self.n_frames = n_frames
        self.decode = decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = as_combined(batch["media_id"]).to_numpy(zero_copy_only=False)
        payloads = as_combined(batch["payload"]).to_pylist()
        out_id, out_frame, out_feat = [], [], []
        for mid, p in zip(ids, payloads):
            p = p or b""
            step = max(1, len(p) // self.n_frames)
            for f in range(self.n_frames):
                chunk = p[f * step : (f + 1) * step]
                img = _decode_image_bytes(chunk, self.decode)
                out_id.append(int(mid))
                out_frame.append(f)
                out_feat.append(float(img.mean()))
        return pa.table({
            "media_id": pa.array(out_id, type=pa.int64()),
            "frame_idx": pa.array(out_frame, type=pa.int32()),
            "frame_mean": pa.array(out_feat, type=pa.float64()),
        })
