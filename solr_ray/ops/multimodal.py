"""Multimodal (image/audio/video) column plumbing.

Media are opaque `binary` columns with typed metadata, processed by
actor-pool map_batches stages (model/codec state loaded once per actor) —
the ExtractingRequestHandler pattern (reference SolrContentHandler.java:53)
generalized to binary payloads.

Decoders:
- `decoder="raw"` — REAL pure-numpy processing of uncompressed RGB payloads
  (payload = H*W*3 uint8 bytes, dimensions from the width/height metadata
  columns): true decode, channel statistics + luminance-histogram features,
  nearest-neighbor resize that re-encodes the pixels, and true video frame
  extraction from concatenated raw frames.
- `decoder="fake"` — deterministic pseudo-features from the bytes (plumbing
  tests for opaque/compressed payloads).
- `decoder="pil"`/"librosa" — raise NotImplementedError (no image/audio
  codec libs in this container); compressed formats (jpeg/png/...) need
  them.

Batch-size guidance: binary payload rows are fat; callers should pass small
batch_size (e.g. 32-256) and let streaming execution bound memory.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def decode_raw_rgb(payload: bytes, width: int, height: int) -> np.ndarray:
    """Raw RGB bytes -> (H, W, 3) uint8 array (zero-copy view)."""
    a = np.frombuffer(payload, dtype=np.uint8)
    if a.size != width * height * 3:
        raise ValueError(
            f"payload has {a.size} bytes, expected {width}x{height}x3")
    return a.reshape(height, width, 3)


def raw_rgb_features(img: np.ndarray, hist_bins: int = 8) -> np.ndarray:
    """Real image features: per-channel mean/std + luminance histogram
    (normalized). Output dim = 6 + hist_bins."""
    f = img.reshape(-1, 3).astype(np.float32)
    means = f.mean(axis=0)
    stds = f.std(axis=0)
    lum = f @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
    hist, _ = np.histogram(lum, bins=hist_bins, range=(0.0, 255.0))
    hist = hist.astype(np.float32) / max(lum.size, 1)
    return np.concatenate([means, stds, hist])


def resize_raw_rgb(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resample via index gathers (pure numpy)."""
    sh, sw = img.shape[0], img.shape[1]
    ys = np.minimum((np.arange(h) * sh) // h, sh - 1)
    xs = np.minimum((np.arange(w) * sw) // w, sw - 1)
    return img[ys][:, xs]

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
                "PIL/Pillow not available in this environment; use "
                "decoder='raw' (uncompressed RGB) or 'fake'"
            )
        if decoder not in ("fake", "raw"):
            raise ValueError(f"unknown decoder {decoder!r}")
        self.decoder = decoder  # model/codec handle would be held here

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, ok = [], []
        widths = (batch["width"].to_pylist()
                  if "width" in batch.column_names else [None] * len(batch))
        heights = (batch["height"].to_pylist()
                   if "height" in batch.column_names else [None] * len(batch))
        for p, w, h in zip(batch[self.payload_col].to_pylist(),
                           widths, heights):
            if p is None:
                feats.append([0.0] * self.dim)
                ok.append(False)
                continue
            if self.decoder == "raw":
                try:
                    img = decode_raw_rgb(p, int(w), int(h))
                except (ValueError, TypeError):
                    feats.append([0.0] * self.dim)
                    ok.append(False)
                    continue
                f = raw_rgb_features(img, hist_bins=max(self.dim - 6, 1))
                f = np.resize(f, self.dim)  # pad/trim to the stage dim
                feats.append(f.astype(np.float32).tolist())
            else:
                feats.append(_fake_feature(p, self.dim).tolist())
            ok.append(True)
        return batch.append_column(
            "feature", pa.array(feats, pa.list_(pa.float32()))
        ).append_column("decode_ok", pa.array(ok, pa.bool_()))


def decode_raw_pcm16(payload: bytes) -> np.ndarray:
    """Raw little-endian 16-bit mono PCM bytes -> float32 samples in
    [-1, 1)."""
    if len(payload) % 2:
        raise ValueError("PCM16 payload has odd byte length")
    return (np.frombuffer(payload, dtype="<i2").astype(np.float32)
            / 32768.0)


def raw_pcm_features(samples: np.ndarray, sample_rate: int = 16000,
                     n_bands: int = 8) -> np.ndarray:
    """Real audio features: RMS energy, zero-crossing rate, spectral
    centroid (Hz, FFT-based) + normalized band energies.
    Output dim = 3 + n_bands."""
    n = samples.size
    if n == 0:
        return np.zeros(3 + n_bands, dtype=np.float32)
    rms = float(np.sqrt(np.mean(samples * samples)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(samples))))) if n > 1 else 0.0
    spec = np.abs(np.fft.rfft(samples))
    freqs = np.fft.rfftfreq(n, d=1.0 / sample_rate)
    total = spec.sum()
    centroid = float((freqs * spec).sum() / total) if total > 0 else 0.0
    if spec.size < n_bands:
        # clips shorter than n_bands spectrum bins: pad so reduceat edges
        # stay distinct (duplicate edges double-count bins)
        spec = np.pad(spec, (0, n_bands - spec.size))
    edges = np.linspace(0, spec.size, n_bands + 1).astype(np.int64)
    bands = np.add.reduceat(spec, edges[:-1])
    bands = bands / total if total > 0 else bands
    return np.concatenate([[rms, zcr, centroid],
                           bands]).astype(np.float32)


class AudioFeatureStage:
    """Actor-pool stage: REAL raw-PCM16 decode + DSP features (pure numpy:
    RMS, zero-crossing rate, FFT spectral centroid, band energies).
    Compressed audio (mp3/ogg/...) needs codec libs and raises."""

    def __init__(self, payload_col: str = "payload", sample_rate: int = 16000,
                 n_bands: int = 8, decoder: str = "raw"):
        if decoder == "librosa":
            raise NotImplementedError(
                "librosa not available in this environment; use "
                "decoder='raw' (uncompressed PCM16)")
        if decoder != "raw":
            raise ValueError(f"unknown decoder {decoder!r}")
        self.payload_col = payload_col
        self.sample_rate = sample_rate
        self.n_bands = n_bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        dim = 3 + self.n_bands
        feats, ok = [], []
        for p in batch[self.payload_col].to_pylist():
            if p is None:
                feats.append([0.0] * dim)
                ok.append(False)
                continue
            try:
                s = decode_raw_pcm16(p)
            except ValueError:
                feats.append([0.0] * dim)
                ok.append(False)
                continue
            feats.append(raw_pcm_features(
                s, self.sample_rate, self.n_bands).tolist())
            ok.append(True)
        return batch.append_column(
            "audio_feature", pa.array(feats, pa.list_(pa.float32()))
        ).append_column("decode_ok", pa.array(ok, pa.bool_()))


class ImageResizeStage:
    """Resize stage. mode="raw": REAL nearest-neighbor resample of raw RGB
    payloads (pixels re-encoded, metadata rewritten). mode="stub": passes
    payload through and only rewrites width/height metadata (placeholder
    for compressed formats that need codec libs)."""

    def __init__(self, target_w: int, target_h: int, mode: str = "stub",
                 payload_col: str = "payload"):
        if mode not in ("raw", "stub"):
            raise ValueError(f"unknown resize mode {mode!r}")
        self.w, self.h = target_w, target_h
        self.mode = mode
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        if self.mode == "raw":
            outs = []
            for p, w, h in zip(batch[self.payload_col].to_pylist(),
                               batch["width"].to_pylist(),
                               batch["height"].to_pylist()):
                if p is None:
                    outs.append(None)
                    continue
                img = decode_raw_rgb(p, int(w), int(h))
                outs.append(resize_raw_rgb(img, self.w, self.h)
                            .tobytes())
            i = batch.schema.get_field_index(self.payload_col)
            batch = batch.set_column(
                i, self.payload_col, pa.array(outs, pa.binary()))
        for col, val in (("width", self.w), ("height", self.h)):
            if col in batch.column_names:
                batch = batch.drop_columns([col])
            batch = batch.append_column(col, pa.array([val] * n, pa.int32()))
        return batch


class FrameSampleStage:
    """Video frame sampling (explode-shaped output).

    mode="raw": payload = n_frames concatenated raw RGB frames (each
    width*height*3 bytes, evenly spanning duration_ms); emits the ACTUAL
    frame bytes nearest each every_ms offset. mode="stub": offsets only
    (placeholder for container formats that need codec libs)."""

    def __init__(self, every_ms: int = 1000, payload_col: str = "payload",
                 mode: str = "stub"):
        if mode not in ("raw", "stub"):
            raise ValueError(f"unknown sample mode {mode!r}")
        self.every_ms = every_ms
        self.payload_col = payload_col
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, offsets, frames = [], [], []
        widths = (batch["width"].to_pylist()
                  if "width" in batch.column_names else [None] * len(batch))
        heights = (batch["height"].to_pylist()
                   if "height" in batch.column_names else [None] * len(batch))
        for mid, dur, p, w, h in zip(
            batch["media_id"].to_pylist(), batch["duration_ms"].to_pylist(),
            batch[self.payload_col].to_pylist(), widths, heights,
        ):
            n = max(1, int((dur or 0) // self.every_ms))
            ids.extend([mid] * n)
            offs = list(range(0, n * self.every_ms, self.every_ms))
            offsets.extend(offs)
            if self.mode == "raw" and p is not None and w and h:
                fsize = int(w) * int(h) * 3
                n_frames = max(len(p) // fsize, 1)
                dur_safe = max(dur or 0, 1)
                for off in offs:
                    fi = min(int(off / dur_safe * n_frames), n_frames - 1)
                    frames.append(p[fi * fsize:(fi + 1) * fsize])
            else:
                frames.extend([None] * n)
        out = {
            "media_id": pa.array(ids, pa.int64()),
            "frame_offset_ms": pa.array(offsets, pa.int32()),
        }
        if self.mode == "raw":
            out["frame"] = pa.array(frames, pa.binary())
        return pa.table(out)


def media_features(ds, stage_cls=ImageFeatureStage, concurrency: int = 2,
                   batch_size: int = 64, **kwargs):
    """Run a media stage as an actor pool with fat-row-safe batch size."""
    return ds.map_batches(
        stage_cls, fn_constructor_kwargs=kwargs, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
    )
