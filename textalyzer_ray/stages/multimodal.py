"""Multimodal (image/audio/video) column stages — Ray-side plumbing.

Media payloads are opaque ``binary`` columns with typed metadata columns
(``media_type``, ``width``/``height``/``duration_ms``). The decode /
feature-extract kernels need codec libraries that are NOT in this
container, so the actual decoding is STUBBED: ``DecodeImage`` raises
``NotImplementedError`` unless constructed with ``fake=True``, in which
case a deterministic fake decoder (bytes -> shape/checksum features)
stands in so the Ray plumbing — actor signature, batch sizing, schema,
output layout — is real and tested.

At scale: media rows are large, so run these stages with SMALL
``batch_size`` (tens of rows) and let block size, not row count, drive
memory (ray_guide "Memory-aware").
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


class DecodeImage:
    """binary image -> feature columns (stubbed decode).

    Real implementation would decode via PIL/opencv in ``__init__``-loaded
    codecs; ``fake=True`` derives deterministic pseudo-features from the
    bytes so pipelines and tests can exercise the stage end-to-end.
    """

    def __init__(self, data_col: str = "data", fake: bool = False):
        self.data_col = data_col
        self.fake = fake

    def _decode(self, raw: bytes) -> tuple[int, int, float]:
        if not self.fake:
            raise NotImplementedError(
                "image codecs are not available in this environment; "
                "construct DecodeImage(fake=True) for the deterministic stub"
            )
        digest = hashlib.blake2b(raw, digest_size=8).digest()
        w = 64 + digest[0]
        h = 64 + digest[1]
        mean_px = digest[2] / 255.0
        return w, h, mean_px

    def __call__(self, batch: pa.Table) -> pa.Table:
        ws, hs, means = [], [], []
        for raw in batch[self.data_col].to_pylist():
            w, h, m = self._decode(raw or b"")
            ws.append(w)
            hs.append(h)
            means.append(m)
        return (
            batch.append_column("img_width", pa.array(ws, pa.int32()))
            .append_column("img_height", pa.array(hs, pa.int32()))
            .append_column("img_mean", pa.array(means, pa.float64()))
        )


class SampleFrames:
    """video binary -> (id, frame_index, frame:binary) rows (stubbed).

    The fake mode slices the payload deterministically into ``n_frames``
    chunks, which preserves the real output layout: one row per sampled
    frame, binary frame column, small batches.
    """

    def __init__(self, id_col: str = "media_id", data_col: str = "data", n_frames: int = 4, fake: bool = False):
        self.id_col = id_col
        self.data_col = data_col
        self.n_frames = n_frames
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "video codecs are not available; use SampleFrames(fake=True)"
            )
        ids, idxs, frames = [], [], []
        for mid, raw in zip(
            batch[self.id_col].to_pylist(), batch[self.data_col].to_pylist()
        ):
            raw = raw or b""
            step = max(len(raw) // self.n_frames, 1)
            for fi in range(self.n_frames):
                ids.append(mid)
                idxs.append(fi)
                frames.append(raw[fi * step : (fi + 1) * step])
        return pa.table(
            {
                self.id_col: pa.array(ids),
                "frame_index": pa.array(idxs, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


class AudioFeatures:
    """audio binary -> fixed-size feature vector (stubbed): fake mode
    emits a deterministic 8-dim byte-histogram embedding."""

    def __init__(self, data_col: str = "data", fake: bool = False):
        self.data_col = data_col
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "audio codecs are not available; use AudioFeatures(fake=True)"
            )
        feats = []
        for raw in batch[self.data_col].to_pylist():
            arr = np.frombuffer(raw or b"\x00", dtype=np.uint8)
            hist, _ = np.histogram(arr, bins=8, range=(0, 256))
            total = hist.sum() or 1
            feats.append((hist / total).astype(np.float32))
        return batch.append_column(
            "audio_features", pa.array([f.tolist() for f in feats], pa.list_(pa.float32()))
        )
