"""Perceptual image dedup: dHash semantics, decode integration,
group rollup."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from textalyzer_ray.core.imagehash import (
    DHASH_H,
    DHASH_W,
    dhash64,
    dhash_hi_lo,
    dhash_of_pgm,
    synth_gray_pgm,
)
from textalyzer_ray.pipelines.media import (
    _to_dhash_grid,
    dhash_dup_groups,
    image_dhash,
)

pytestmark = pytest.mark.usefixtures("quiet_data_context")


class TestCoreDhash:
    def test_classes_are_distinct_and_deterministic(self):
        hs = [dhash_of_pgm(synth_gray_pgm(k)) for k in range(40)]
        assert len(set(hs)) == 40
        assert hs == [dhash_of_pgm(synth_gray_pgm(k)) for k in range(40)]
        for hi, lo in hs:
            assert 0 <= hi < 1 << 32 and 0 <= lo < 1 << 32

    def test_bit_packing_layout(self):
        # brightness increasing along x in the top row block only ->
        # bits exactly at Y=0 (indices 0..7) -> lo = 0xff, hi = 0
        g = np.zeros((DHASH_H, DHASH_W), np.uint8)
        g[0:2, :] = (np.arange(DHASH_W, dtype=np.uint8) * 10)[None, :]
        h = dhash64(g)
        assert dhash_hi_lo(h) == (0, 0xFF)

    def test_shape_guard(self):
        with pytest.raises(ValueError):
            dhash64(np.zeros((8, 9), np.uint8))

    def test_hash_invariant_under_2x_block_upscale(self):
        # a 32x36 image that is the 2x block-replication of the 16x18
        # grid reduces back to the identical grid -> identical hash
        base = np.frombuffer(synth_gray_pgm(7)[-DHASH_H * DHASH_W :], np.uint8)
        base = base.reshape(DHASH_H, DHASH_W)
        up = np.kron(base, np.ones((2, 2), np.uint8))
        assert dhash64(_to_dhash_grid(up)) == dhash64(base)

    def test_rgb_collapses_by_channel_mean(self):
        base = np.frombuffer(synth_gray_pgm(3)[-DHASH_H * DHASH_W :], np.uint8)
        base = base.reshape(DHASH_H, DHASH_W)
        rgb = np.repeat(base[:, :, None], 3, axis=2)
        assert dhash64(_to_dhash_grid(rgb)) == dhash64(base)


class TestMediaPipelines:
    def test_image_dhash_matches_scalar_reference(self):
        ids = list(range(25))
        ds = rd.from_arrow(
            pa.table(
                {
                    "media_id": pa.array(ids, pa.int64()),
                    "data": pa.array(
                        [synth_gray_pgm(i % 7) for i in ids], pa.binary()
                    ),
                }
            )
        )
        rows = {r["media_id"]: r for r in image_dhash(ds).take_all()}
        for i in ids:
            hi, lo = dhash_of_pgm(synth_gray_pgm(i % 7))
            assert (rows[i]["dhash_hi"], rows[i]["dhash_lo"]) == (hi, lo)

    def test_dup_groups_counts(self):
        ids = list(range(21))
        ds = rd.from_arrow(
            pa.table(
                {
                    "media_id": pa.array(ids, pa.int64()),
                    "data": pa.array(
                        [synth_gray_pgm(i % 3) for i in ids], pa.binary()
                    ),
                }
            )
        )
        rows = dhash_dup_groups(ds).take_all()
        assert len(rows) == 3
        assert sorted(r["n_images"] for r in rows) == [7, 7, 7]
        hashes = [(r["dhash_hi"], r["dhash_lo"]) for r in rows]
        assert hashes == sorted(hashes)

    def test_unsupported_codec_raises(self):
        from textalyzer_ray.core.media import UnsupportedMediaError
        from textalyzer_ray.pipelines.media import _decode_any

        with pytest.raises(UnsupportedMediaError):
            _decode_any(b"\xff\xd8\xff\xe0 jpeg-ish")


class TestAudioFingerprint:
    def test_classes_distinct_and_bigint_safe(self):
        from textalyzer_ray.core.audiofp import afp_of_wav, synth_pcm_wav

        fps = [afp_of_wav(synth_pcm_wav(k)) for k in range(40)]
        assert len(set(fps)) == 40
        assert all(0 <= f < 1 << 63 for f in fps)

    def test_wav_roundtrip_recovers_exact_ints(self):
        # decode_wav's /32768.0 is an exact power-of-two division:
        # rint(x*32768) must equal the planted int16 samples bit-for-bit
        import numpy as np

        from textalyzer_ray.core.audiofp import synth_pcm_wav
        from textalyzer_ray.core.media import decode_wav

        x, rate = decode_wav(synth_pcm_wav(9))
        t = np.arange(256, dtype=np.int64)
        ref = ((9 * 13 + t * 7 + (t * t * (9 + 5)) % 193) % 251) - 125
        assert np.array_equal(np.rint(x * 32768.0).astype(np.int64), ref)

    def test_afp_pipeline_groups(self):
        from textalyzer_ray.core.audiofp import afp_of_wav, synth_pcm_wav
        from textalyzer_ray.pipelines.media import afp_dup_groups

        ids = list(range(30))
        ds = rd.from_arrow(
            pa.table(
                {
                    "media_id": pa.array(ids, pa.int64()),
                    "data": pa.array(
                        [synth_pcm_wav(i % 5) for i in ids], pa.binary()
                    ),
                }
            )
        )
        rows = afp_dup_groups(ds).take_all()
        assert len(rows) == 5 and all(r["n_clips"] == 6 for r in rows)
        assert {r["afp"] for r in rows} == {
            afp_of_wav(synth_pcm_wav(k)) for k in range(5)
        }


class TestVideoY4m:
    def test_y4m_roundtrip_and_header_parse(self):
        import numpy as np

        from textalyzer_ray.core.media import decode_y4m, encode_y4m_mono

        frames = np.arange(3 * 4 * 6, dtype=np.uint8).reshape(3, 4, 6)
        data = encode_y4m_mono(frames, fps=(30, 1))
        got, fps = decode_y4m(data)
        assert np.array_equal(got, frames) and fps == (30, 1)

    def test_y4m_420_reads_luma_and_skips_chroma(self):
        import numpy as np

        from textalyzer_ray.core.media import decode_y4m

        y = np.arange(16, dtype=np.uint8).reshape(4, 4)
        uv = bytes(8)  # 2x (2x2) chroma planes
        data = (
            b"YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C420\n"
            + (b"FRAME\n" + y.tobytes() + uv) * 2
        )
        got, _ = decode_y4m(data)
        assert got.shape == (2, 4, 4) and np.array_equal(got[1], y)

    def test_y4m_malformed_raises(self):
        from textalyzer_ray.core.media import UnsupportedMediaError, decode_y4m

        for bad in (
            b"RIFFxxxx",
            b"YUV4MPEG2 W4 H4 F25:1\nNOTAFRAME\n",
            b"YUV4MPEG2 W4 H4 F25:1 Cmono\nFRAME\nshort",
            b"YUV4MPEG2 W4 H4 F25:1 C444\nFRAME\n" + bytes(48),
        ):
            with pytest.raises(UnsupportedMediaError):
                decode_y4m(bad)

    def test_sample_frames_real_y4m_path(self):
        import numpy as np

        from textalyzer_ray.core.imagehash import synth_gray_y4m, synth_video_frame
        from textalyzer_ray.core.media import decode_ppm
        from textalyzer_ray.stages.multimodal import SampleFrames

        t = pa.table(
            {
                "media_id": pa.array([5], pa.int64()),
                "data": pa.array([synth_gray_y4m(2)], pa.binary()),
            }
        )
        out = SampleFrames(n_frames=4)(t)
        assert out.num_rows == 4
        # sampled frames are valid P5 and equal the planted frames 0,2,4,6
        for row, src_f in zip(range(4), (0, 2, 4, 6)):
            img = decode_ppm(out["frame"][row].as_py())
            assert np.array_equal(img, synth_video_frame(2, src_f))

    def test_vhash_pipeline_matches_scalar(self):
        from textalyzer_ray.core.imagehash import synth_gray_y4m, vhash_of_y4m
        from textalyzer_ray.pipelines.media import vhash_dup_groups

        ids = list(range(12))
        ds = rd.from_arrow(
            pa.table(
                {
                    "media_id": pa.array(ids, pa.int64()),
                    "data": pa.array(
                        [synth_gray_y4m(i % 4) for i in ids], pa.binary()
                    ),
                }
            )
        )
        rows = vhash_dup_groups(ds).take_all()
        assert len(rows) == 4 and all(r["n_videos"] == 3 for r in rows)
        assert {(r["vhash_hi"], r["vhash_lo"]) for r in rows} == {
            vhash_of_y4m(synth_gray_y4m(k)) for k in range(4)
        }


class TestY4mFuzz:
    """Parser-robustness pattern (cf. WARC fuzz): arbitrary bytes must
    either decode or raise UnsupportedMediaError — never crash."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=300))
    def test_never_crashes_on_garbage(self, data):
        from textalyzer_ray.core.media import UnsupportedMediaError, decode_y4m

        try:
            frames, fps = decode_y4m(data)
            assert frames.ndim == 3 and frames.dtype.kind == "u"
        except UnsupportedMediaError:
            pass

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=300))
    def test_prefixed_garbage(self, data):
        from textalyzer_ray.core.media import UnsupportedMediaError, decode_y4m

        try:
            decode_y4m(b"YUV4MPEG2 " + data)
        except UnsupportedMediaError:
            pass

    @settings(max_examples=60, deadline=None)
    @given(
        st.integers(1, 5),
        st.integers(1, 9),
        st.integers(1, 9),
        st.integers(1, 60),
    )
    def test_roundtrip_property(self, n, w, h, fnum):
        import numpy as np

        from textalyzer_ray.core.media import decode_y4m, encode_y4m_mono

        rng = np.random.default_rng(n * 1000 + w * 100 + h * 10 + fnum)
        frames = rng.integers(0, 256, size=(n, h, w), dtype=np.uint8)
        got, fps = decode_y4m(encode_y4m_mono(frames, fps=(fnum, 1)))
        assert np.array_equal(got, frames) and fps == (fnum, 1)
