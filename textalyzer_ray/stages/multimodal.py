"""Multimodal (image/audio/video) column stages.

Media payloads are opaque ``binary`` columns with typed metadata columns
(``media_type``, ``width``/``height``/``duration_ms``). Decoding is REAL
for formats needing no codec libraries (core/media.py): PPM/PGM and
uncompressed BMP images, PCM WAV audio. Compressed formats (JPEG/PNG/
MP4) need codecs absent from this container — those raise
``UnsupportedMediaError`` unless the stage was built with ``fake=True``,
whose deterministic stub keeps the Ray plumbing (actor signature, batch
sizing, schema, output layout) exercised end-to-end. Video decode is
fully stubbed (no container parser worth hand-rolling).

At scale: media rows are large, so run these stages with SMALL
``batch_size`` (tens of rows) and let block size, not row count, drive
memory (ray_guide "Memory-aware").
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from textalyzer_ray.core.media import (
    UnsupportedMediaError,
    audio_features,
    decode_bmp,
    decode_png,
    decode_ppm,
    decode_wav,
    image_features,
    resize_nearest,
)

class DecodeImage:
    """binary image -> (img_width, img_height, img_mean) feature columns.

    REAL decode for netpbm (P5/P6) and uncompressed BMP via numpy
    (core/media.py); an optional ``resize_to=(w, h)`` applies a
    nearest-neighbor resize before feature extraction (exercises the
    decoded-array path). Compressed formats raise unless ``fake=True``
    (deterministic stub preserving schema/plumbing).
    """

    def __init__(
        self,
        data_col: str = "data",
        fake: bool = False,
        resize_to: tuple[int, int] | None = None,
    ):
        self.data_col = data_col
        self.fake = fake
        self.resize_to = resize_to

    def _decode(self, raw: bytes) -> tuple[int, int, float]:
        if raw[:2] in (b"P6", b"P5"):
            img = decode_ppm(raw)
        elif raw[:2] == b"BM":
            img = decode_bmp(raw)
        elif raw[:8] == b"\x89PNG\r\n\x1a\n":
            img = decode_png(raw)
        elif self.fake:
            digest = hashlib.blake2b(raw, digest_size=8).digest()
            return 64 + digest[0], 64 + digest[1], digest[2] / 255.0
        else:
            raise UnsupportedMediaError(
                "compressed image codecs are not available in this "
                "environment; supported formats: PPM/PGM, BMP, PNG "
                "(or construct DecodeImage(fake=True) for the stub)"
            )
        if self.resize_to is not None:
            img = resize_nearest(img, *self.resize_to)
        return image_features(img)

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
    """video binary -> (id, frame_index, frame:binary) rows.

    REAL for YUV4MPEG2 payloads (core/media.py decode_y4m — Cmono and
    4:2:0 luma planes): ``n_frames`` evenly-spaced frames (source index
    floor(i * total / n_frames)) are re-emitted as P5 PGM bytes, so
    downstream image stages (DecodeImage, pipelines/media.image_dhash)
    consume them unchanged. Codec containers (MP4/AVI) still need
    ffmpeg and raise unless ``fake=True`` (deterministic payload
    slicing that preserves the output layout: one row per sampled
    frame, binary frame column, small batches).
    """

    def __init__(self, id_col: str = "media_id", data_col: str = "data", n_frames: int = 4, fake: bool = False):
        self.id_col = id_col
        self.data_col = data_col
        self.n_frames = n_frames
        self.fake = fake

    def _frames_of(self, raw: bytes) -> list[bytes]:
        if raw[:9] == b"YUV4MPEG2":
            from textalyzer_ray.core.media import decode_y4m

            frames, _fps = decode_y4m(raw)
            total = frames.shape[0]
            picks = [
                min(i * total // self.n_frames, total - 1)
                for i in range(self.n_frames)
            ]
            return [
                b"P5 %d %d 255\n" % (frames.shape[2], frames.shape[1])
                + frames[p].tobytes()
                for p in picks
            ]
        if not self.fake:
            raise UnsupportedMediaError(
                "video codecs are not available for non-y4m payloads; "
                "use SampleFrames(fake=True)"
            )
        step = max(len(raw) // self.n_frames, 1)
        return [raw[fi * step : (fi + 1) * step] for fi in range(self.n_frames)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        for mid, raw in zip(
            batch[self.id_col].to_pylist(), batch[self.data_col].to_pylist()
        ):
            for fi, fr in enumerate(self._frames_of(raw or b"")):
                ids.append(mid)
                idxs.append(fi)
                frames.append(fr)
        return pa.table(
            {
                self.id_col: pa.array(ids),
                "frame_index": pa.array(idxs, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


class AudioFeatures:
    """audio binary -> fixed-size feature vector.

    REAL decode for PCM WAV (stdlib wave + numpy): 8-bin normalized
    magnitude spectrum of the mono mix (core/media.py). Non-WAV payloads
    raise unless ``fake=True`` (deterministic byte-histogram stub with
    the same schema)."""

    def __init__(self, data_col: str = "data", fake: bool = False):
        self.data_col = data_col
        self.fake = fake

    def _features(self, raw: bytes) -> np.ndarray:
        if raw[:4] == b"RIFF":
            samples, rate = decode_wav(raw)
            return audio_features(samples, rate)
        if self.fake:
            arr = np.frombuffer(raw or b"\x00", dtype=np.uint8)
            hist, _ = np.histogram(arr, bins=8, range=(0, 256))
            total = hist.sum() or 1
            return (hist / total).astype(np.float32)
        raise UnsupportedMediaError(
            "compressed audio codecs are not available; supported raw "
            "format: PCM WAV (or AudioFeatures(fake=True) for the stub)"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self._features(raw or b"") for raw in batch[self.data_col].to_pylist()
        ]
        return batch.append_column(
            "audio_features", pa.array([f.tolist() for f in feats], pa.list_(pa.float32()))
        )
