"""Real media decoding (no codec libs): netpbm, BMP, PCM WAV, resize."""

import io
import struct
import wave

import numpy as np
import pytest

from textalyzer_ray.core.media import (
    UnsupportedMediaError,
    audio_features,
    decode_bmp,
    decode_ppm,
    decode_wav,
    resize_nearest,
)


def make_ppm(w, h, rgb):
    return b"P6\n# comment\n%d %d\n255\n" % (w, h) + bytes(rgb)


def make_bmp(w, h, rows_rgb):
    """rows_rgb: h rows (top-down) of w (r,g,b) tuples -> 24-bit BMP."""
    stride = (w * 3 + 3) & ~3
    pixel_data = b""
    for row in reversed(rows_rgb):  # bottom-up storage
        line = b"".join(bytes((b, g, r)) for (r, g, b) in row)
        pixel_data += line + b"\x00" * (stride - len(line))
    off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off + len(pixel_data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 0, 0, 0, 0)
    return header + info + pixel_data


def make_wav(samples, rate=8000):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


class TestDecoders:
    def test_ppm_roundtrip(self):
        img = decode_ppm(make_ppm(2, 2, [255, 0, 0,  0, 255, 0,  0, 0, 255,  10, 20, 30]))
        assert img.shape == (2, 2, 3)
        assert tuple(img[0, 0]) == (255, 0, 0)
        assert tuple(img[1, 1]) == (10, 20, 30)

    def test_pgm(self):
        img = decode_ppm(b"P5\n2 1\n255\n" + bytes([7, 9]))
        assert img.shape == (1, 2) and img[0, 1] == 9

    def test_bmp_roundtrip_with_padding(self):
        rows = [[(1, 2, 3), (4, 5, 6)], [(7, 8, 9), (250, 251, 252)]]
        img = decode_bmp(make_bmp(2, 2, rows))
        assert img.shape == (2, 2, 3)
        assert tuple(img[0, 0]) == (1, 2, 3)       # top-down restored
        assert tuple(img[1, 1]) == (250, 251, 252)

    def test_wav_pcm16(self):
        x, rate = decode_wav(make_wav([0, 16384, -16384, 32767]))
        assert rate == 8000
        assert x == pytest.approx([0.0, 0.5, -0.5, 32767 / 32768], abs=1e-6)

    def test_unsupported_raises(self):
        with pytest.raises(UnsupportedMediaError):
            decode_ppm(b"\x89PNG...")
        with pytest.raises(UnsupportedMediaError):
            decode_bmp(b"GIF89a")
        with pytest.raises(UnsupportedMediaError):
            decode_wav(b"ID3\x03junk")

    def test_truncated_payload_raises_media_error(self):
        # r3 ADVICE fix: truncated pixel data must raise the module's
        # documented UnsupportedMediaError, not a bare numpy ValueError.
        with pytest.raises(UnsupportedMediaError, match="truncated"):
            decode_ppm(b"P6\n4 4\n255\n" + bytes(5))
        full = make_bmp(2, 2, [[(1, 2, 3), (4, 5, 6)], [(7, 8, 9), (9, 9, 9)]])
        with pytest.raises(UnsupportedMediaError, match="truncated"):
            decode_bmp(full[:-5])

    def test_resize_nearest(self):
        img = np.arange(16, dtype=np.uint8).reshape(4, 4)
        out = resize_nearest(img, 2, 2)
        assert out.shape == (2, 2)
        assert out[0, 0] == img[0, 0] and out[1, 1] == img[2, 2]

    def test_audio_features_normalized(self):
        t = np.arange(800) / 8000.0
        x = np.sin(2 * np.pi * 440 * t)
        f = audio_features(x, 8000)
        assert f.shape == (8,) and f.dtype == np.float32
        assert f.sum() == pytest.approx(1.0, abs=1e-5)
        assert f[0] > 0.5  # 440 Hz lands in the lowest of 8 bins


class TestStagesRealDecode:
    def test_decode_image_stage_real(self, quiet_data_context):
        import pyarrow as pa
        import ray.data as rd

        from textalyzer_ray.stages.multimodal import DecodeImage

        ppm = make_ppm(2, 1, [0, 0, 0, 255, 255, 255])
        bmp = make_bmp(1, 1, [[(128, 128, 128)]])
        t = pa.table({"media_id": [1, 2], "data": pa.array([ppm, bmp], pa.binary())})
        rows = (
            rd.from_arrow(t)
            .map_batches(DecodeImage, batch_format="pyarrow", concurrency=1, batch_size=8)
            .take_all()
        )
        by_id = {r["media_id"]: r for r in rows}
        assert (by_id[1]["img_width"], by_id[1]["img_height"]) == (2, 1)
        assert by_id[1]["img_mean"] == pytest.approx(0.5, abs=0.01)
        assert (by_id[2]["img_width"], by_id[2]["img_height"]) == (1, 1)
        assert by_id[2]["img_mean"] == pytest.approx(128 / 255, abs=0.01)

    def test_audio_stage_real(self, quiet_data_context):
        import pyarrow as pa
        import ray.data as rd

        from textalyzer_ray.stages.multimodal import AudioFeatures

        wav = make_wav(np.sin(2 * np.pi * 440 * np.arange(800) / 8000.0) * 30000)
        t = pa.table({"media_id": [1], "data": pa.array([wav], pa.binary())})
        rows = (
            rd.from_arrow(t)
            .map_batches(AudioFeatures, batch_format="pyarrow", concurrency=1)
            .take_all()
        )
        f = rows[0]["audio_features"]
        assert len(f) == 8 and abs(sum(f) - 1.0) < 1e-5


class TestPng:
    def test_round_trip_every_channel_and_filter(self):
        from textalyzer_ray.core.media import decode_png, encode_png

        rng = np.random.RandomState(0)
        for ch in (1, 2, 3, 4):
            shape = (13, 7, ch) if ch > 1 else (13, 7)
            img = rng.randint(0, 256, shape, dtype=np.uint8)
            for filts in ([0], [1], [2], [3], [4], None):
                back = decode_png(encode_png(img, filters=filts))
                assert back.shape == img.shape and (back == img).all(), (
                    ch,
                    filts,
                )

    def test_palette_png(self):
        # hand-build a color-type-3 file: 2x2 indices into a 3-color PLTE
        import zlib

        from textalyzer_ray.core.media import decode_png

        def chunk(typ, body):
            crc = zlib.crc32(typ + body) & 0xFFFFFFFF
            return (
                len(body).to_bytes(4, "big")
                + typ
                + body
                + crc.to_bytes(4, "big")
            )

        ihdr = (2).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes(
            [8, 3, 0, 0, 0]
        )
        pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
        scan = bytes([0, 0, 1, 0, 2, 0])  # filter0 rows: [0,1], [2,0]
        data = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"PLTE", pal)
            + chunk(b"IDAT", zlib.compress(scan))
            + chunk(b"IEND", b"")
        )
        img = decode_png(data)
        assert img.shape == (2, 2, 3)
        assert img[0, 0].tolist() == [255, 0, 0]
        assert img[0, 1].tolist() == [0, 255, 0]
        assert img[1, 0].tolist() == [0, 0, 255]

    def test_error_contract(self):
        from textalyzer_ray.core.media import (
            UnsupportedMediaError,
            decode_png,
            encode_png,
        )

        img = np.zeros((4, 4, 3), np.uint8)
        good = encode_png(img)
        for bad in (b"nope", b"\x89PNG\r\n\x1a\nxxxx", good[:40]):
            with pytest.raises(UnsupportedMediaError):
                decode_png(bad)
        # 16-bit/interlaced must refuse, not crash
        hacked = bytearray(good)
        hacked[24] = 16  # bit depth byte inside IHDR
        with pytest.raises(UnsupportedMediaError):
            decode_png(bytes(hacked))

    def test_decode_image_stage_handles_png(self, quiet_data_context):
        import pyarrow as pa
        import ray.data as rd

        from textalyzer_ray.core.media import encode_png
        from textalyzer_ray.stages.multimodal import DecodeImage

        img = np.full((3, 5, 3), 128, np.uint8)
        t = pa.table(
            {
                "media_id": [1],
                "data": pa.array([encode_png(img)], pa.binary()),
            }
        )
        rows = (
            rd.from_arrow(t)
            .map_batches(DecodeImage, batch_format="pyarrow", concurrency=1)
            .take_all()
        )
        assert (rows[0]["img_width"], rows[0]["img_height"]) == (5, 3)
        assert rows[0]["img_mean"] == pytest.approx(128 / 255, abs=0.01)
