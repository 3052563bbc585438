"""Image-level dedup pipeline: perceptual dHash over decoded images.

The multimodal dedup shape at 100 TB: images are opaque binary column
values; a decode stage turns each into pixels (REAL netpbm/BMP/PNG
decoders, core/media.py — codec formats stay behind the documented
stub boundary), a vectorized hash stage reduces pixels to a 64-bit
perceptual signature, and from there deduplication is the repo's
ordinary integer machinery: exact groups via ``key_counts`` on the
hash halves (this module), near-dup pairs via the simhash chunk-table
family if hamming tolerance is wanted.

Scale shape: decode+hash is an embarrassingly parallel ``map_batches``
task pool (binary payloads never shuffle; only two int64 columns leave
the stage); the group rollup is one key-aligned count. Batch sizes for
large payloads are the caller's lever — the stage is row-wise over
binary blobs by necessity (each blob is one codec unit), with the
arithmetic inside each image fully vectorized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from textalyzer_ray.core.imagehash import dhash64, dhash_hi_lo
from textalyzer_ray.core.media import decode_bmp, decode_png, decode_ppm


def _decode_any(raw: bytes) -> np.ndarray:
    if raw[:2] in (b"P6", b"P5"):
        return decode_ppm(raw)
    if raw[:2] == b"BM":
        return decode_bmp(raw)
    if raw[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(raw)
    from textalyzer_ray.core.media import UnsupportedMediaError

    raise UnsupportedMediaError(
        "compressed image codecs are not available in this environment"
    )


def _to_dhash_grid(img: np.ndarray) -> np.ndarray:
    """Any decoded image -> the canonical 16x18 grayscale grid:
    RGB(A) collapses by integer channel mean; other sizes reduce by
    integer block mean when evenly divisible, else nearest-neighbor
    (core.media.resize_nearest)."""
    from textalyzer_ray.core.imagehash import DHASH_H, DHASH_W

    if img.ndim == 3:
        img = (img.astype(np.int64).sum(axis=2) // img.shape[2]).astype(
            np.uint8
        )
    h, w = img.shape
    if (h, w) == (DHASH_H, DHASH_W):
        return img
    if h % DHASH_H == 0 and w % DHASH_W == 0:
        bh, bw = h // DHASH_H, w // DHASH_W
        return (
            img.astype(np.int64)
            .reshape(DHASH_H, bh, DHASH_W, bw)
            .sum(axis=(1, 3))
            // (bh * bw)
        ).astype(np.uint8)
    from textalyzer_ray.core.media import resize_nearest

    return resize_nearest(img, DHASH_W, DHASH_H)


def image_dhash(
    ds: Dataset, id_col: str = "media_id", data_col: str = "data"
) -> Dataset:
    """(id, data:binary) -> (id, dhash_hi, dhash_lo) int64 columns.
    Binary payloads die in the stage."""
    out_schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field("dhash_hi", pa.int64()),
            pa.field("dhash_lo", pa.int64()),
        ]
    )

    def hash_batch(t: pa.Table) -> pa.Table:
        his, los = [], []
        for raw in t[data_col].to_pylist():
            hi, lo = dhash_hi_lo(dhash64(_to_dhash_grid(_decode_any(raw))))
            his.append(hi)
            los.append(lo)
        return pa.table(
            {
                id_col: t[id_col],
                "dhash_hi": pa.array(his, pa.int64()),
                "dhash_lo": pa.array(los, pa.int64()),
            }
        ).cast(out_schema)

    return ds.map_batches(hash_batch, batch_format="pyarrow")


def audio_afp(
    ds: Dataset, id_col: str = "media_id", data_col: str = "data"
) -> Dataset:
    """(id, data:binary WAV) -> (id, afp:int64) via the real PCM-WAV
    decoder + the 63-bit energy-gradient fingerprint (core/audiofp.py).
    Binary payloads die in the stage."""
    from textalyzer_ray.core.audiofp import afp_of_wav

    def fp_batch(t: pa.Table) -> pa.Table:
        fps = [afp_of_wav(raw) for raw in t[data_col].to_pylist()]
        return pa.table(
            {id_col: t[id_col], "afp": pa.array(fps, pa.int64())}
        )

    return ds.map_batches(fp_batch, batch_format="pyarrow")


def afp_dup_groups(
    ds: Dataset, id_col: str = "media_id", data_col: str = "data"
) -> Dataset:
    """Exact audio-duplicate groups: (afp, n_clips) sorted by afp."""
    from textalyzer_ray.stages.groups import key_counts

    return (
        key_counts(audio_afp(ds, id_col=id_col, data_col=data_col), ["afp"])
        .map_batches(
            lambda t: pa.table({"afp": t["afp"], "n_clips": t["count"]}),
            batch_format="pyarrow",
        )
        .sort("afp")
    )


def video_vhash(
    ds: Dataset,
    id_col: str = "media_id",
    data_col: str = "data",
    n_sample: int = 4,
) -> Dataset:
    """(id, data:binary y4m) -> (id, vhash_hi, vhash_lo) via the real
    YUV4MPEG2 decoder + sampled-frame dHash fold (core/imagehash.py)."""
    from textalyzer_ray.core.imagehash import dhash_hi_lo, video_vhash64
    from textalyzer_ray.core.media import decode_y4m

    def fp_batch(t: pa.Table) -> pa.Table:
        his, los = [], []
        for raw in t[data_col].to_pylist():
            frames, _fps = decode_y4m(raw)
            hi, lo = dhash_hi_lo(video_vhash64(frames, n_sample=n_sample))
            his.append(hi)
            los.append(lo)
        return pa.table(
            {
                id_col: t[id_col],
                "vhash_hi": pa.array(his, pa.int64()),
                "vhash_lo": pa.array(los, pa.int64()),
            }
        )

    return ds.map_batches(fp_batch, batch_format="pyarrow")


def vhash_dup_groups(
    ds: Dataset,
    id_col: str = "media_id",
    data_col: str = "data",
    n_sample: int = 4,
) -> Dataset:
    """Exact video-duplicate groups: (vhash_hi, vhash_lo, n_videos)."""
    from textalyzer_ray.stages.groups import key_counts

    return (
        key_counts(
            video_vhash(ds, id_col=id_col, data_col=data_col, n_sample=n_sample),
            ["vhash_hi", "vhash_lo"],
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "vhash_hi": t["vhash_hi"],
                    "vhash_lo": t["vhash_lo"],
                    "n_videos": t["count"],
                }
            ),
            batch_format="pyarrow",
        )
        .sort(["vhash_hi", "vhash_lo"])
    )


def dhash_dup_groups(
    ds: Dataset, id_col: str = "media_id", data_col: str = "data"
) -> Dataset:
    """Exact perceptual-duplicate groups: (dhash_hi, dhash_lo,
    n_images), one row per distinct hash, sorted by the hash halves."""
    from textalyzer_ray.stages.groups import key_counts

    hashed = image_dhash(ds, id_col=id_col, data_col=data_col)
    return (
        key_counts(hashed, ["dhash_hi", "dhash_lo"])
        .map_batches(
            lambda t: pa.table(
                {
                    "dhash_hi": t["dhash_hi"],
                    "dhash_lo": t["dhash_lo"],
                    "n_images": t["count"],
                }
            ),
            batch_format="pyarrow",
        )
        .sort(["dhash_hi", "dhash_lo"])
    )
