"""Multimodal (image/audio/video) column plumbing.

Media are opaque `binary` columns with typed metadata, processed by
actor-pool map_batches stages (model/codec state loaded once per actor) —
the ExtractingRequestHandler pattern (reference SolrContentHandler.java:53)
generalized to binary payloads.

The decode kernels themselves are STUBBED (no image/audio libs in this
container): `decoder="fake"` produces deterministic features from the bytes
so the Ray-side plumbing — schema, batch sizing for fat rows, actor
signature, output layout — is real and tested; `decoder="pil"`/"librosa"
raise NotImplementedError until the libs exist. Batch-size guidance: binary
payload rows are fat; callers should pass small batch_size (e.g. 32-256) and
let streaming execution bound memory.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),        # image | audio | video
        ("payload", pa.binary()),     # opaque encoded bytes
        ("mime", pa.string()),
        ("width", pa.int32()),        # typed metadata (nullable)
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic pseudo-embedding from the bytes (stable across runs)."""
    d = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(d[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


class ImageFeatureStage:
    """Actor-pool stage: decode + feature-extract an image binary column.

    __init__ loads the decoder/model ONCE per actor; __call__ handles one
    (small) batch. Output: input columns + `feature list<float32>` +
    `decode_ok bool`.
    """

    def __init__(self, payload_col: str = "payload", dim: int = 64,
                 decoder: str = "fake"):
        self.payload_col = payload_col
        self.dim = dim
        if decoder == "pil":
            raise NotImplementedError(
                "PIL/Pillow not available in this environment; use decoder='fake'"
            )
        if decoder != "fake":
            raise ValueError(f"unknown decoder {decoder!r}")
        self.decoder = decoder  # model/codec handle would be held here

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, ok = [], []
        for p in batch[self.payload_col].to_pylist():
            if p is None:
                feats.append([0.0] * self.dim)
                ok.append(False)
            else:
                feats.append(_fake_feature(p, self.dim).tolist())
                ok.append(True)
        return batch.append_column(
            "feature", pa.array(feats, pa.list_(pa.float32()))
        ).append_column("decode_ok", pa.array(ok, pa.bool_()))


class ImageResizeStage:
    """Resize stub: passes payload through, rewrites width/height metadata
    deterministically (real impl would re-encode pixels)."""

    def __init__(self, target_w: int, target_h: int):
        self.w, self.h = target_w, target_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        for col, val in (("width", self.w), ("height", self.h)):
            if col in batch.column_names:
                batch = batch.drop_columns([col])
            batch = batch.append_column(col, pa.array([val] * n, pa.int32()))
        return batch


class FrameSampleStage:
    """Video frame sampling stub: emits one row per sampled frame offset
    (explode-shaped output; real impl would decode frames)."""

    def __init__(self, every_ms: int = 1000, payload_col: str = "payload"):
        self.every_ms = every_ms
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, offsets = [], []
        for mid, dur in zip(
            batch["media_id"].to_pylist(), batch["duration_ms"].to_pylist()
        ):
            n = max(1, int((dur or 0) // self.every_ms))
            ids.extend([mid] * n)
            offsets.extend(range(0, n * self.every_ms, self.every_ms))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_offset_ms": pa.array(offsets, pa.int32()),
        })


def media_features(ds, stage_cls=ImageFeatureStage, concurrency: int = 2,
                   batch_size: int = 64, **kwargs):
    """Run a media stage as an actor pool with fat-row-safe batch size."""
    return ds.map_batches(
        stage_cls, fn_constructor_kwargs=kwargs, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
    )
