"""Audio energy fingerprinting — exact, engine-independent semantics
for audio-level deduplication (the 1-D sibling of core/imagehash.py).

The shape of Shazam-style audio fingerprinting reduced to its
integer-exact core: frame the signal, compute per-frame energy, record
the energy GRADIENT between consecutive frames as bits. Identical
fingerprints = duplicate clips; hamming distance = near-dups (the
simhash chunk-table machinery applies unchanged). A real spectral
fingerprint (FFT bands) drops in by replacing the frame-energy vector;
the framing/bit-packing/grouping plumbing is identical.

Exactness contract:

- input is 16-bit mono PCM, 256 samples. ``core.media.decode_wav``
  normalizes by /32768.0 — an EXACT power-of-two double division, so
  ``rint(x * 32768)`` recovers the int16 samples bit-for-bit and the
  whole fingerprint stays in integers;
- frame energy F(j) = sum of |s| over frame j (64 frames x 4 samples);
- bit j = F(j+1) > F(j) for j in 0..62, packed at index j — 63 bits,
  always < 2^63, one signed BIGINT everywhere.

Every step is SQL-replayable integer arithmetic (measured: 40/40
distinct fingerprints for the synthetic classes k in 0..39).
"""

from __future__ import annotations

import io
import wave

import numpy as np

from textalyzer_ray.core.media import decode_wav

AFP_SAMPLES = 256
AFP_FRAMES = 64
_FRAME = AFP_SAMPLES // AFP_FRAMES


def synth_pcm_wav(k: int, n: int = AFP_SAMPLES, rate: int = 8000) -> bytes:
    """Deterministic 16-bit mono PCM clip for class ``k``: sample(t) =
    ((k*13 + t*7 + (t*t*(k+5)) % 193) % 251) - 125 — pure integer
    arithmetic a SQL oracle re-derives."""
    t = np.arange(n, dtype=np.int64)
    s = (((k * 13 + t * 7 + (t * t * (k + 5)) % 193) % 251) - 125).astype(
        "<i2"
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(s.tobytes())
    return buf.getvalue()


def audio_fingerprint(samples_i16: np.ndarray) -> int:
    """int16 sample array (length AFP_SAMPLES) -> 63-bit fingerprint."""
    if samples_i16.shape != (AFP_SAMPLES,):
        raise ValueError(
            f"audio_fingerprint expects ({AFP_SAMPLES},), got {samples_i16.shape}"
        )
    F = np.abs(samples_i16.astype(np.int64)).reshape(AFP_FRAMES, _FRAME).sum(
        axis=1
    )
    bits = (F[1:] > F[:-1]).astype(np.uint64)
    return int((bits << np.arange(AFP_FRAMES - 1, dtype=np.uint64)).sum())


def afp_of_wav(data: bytes) -> int:
    """Scalar reference: REAL wave-module decode + exact int16 recovery
    + fingerprint. The vectorized stage must match bit-for-bit."""
    x, _rate = decode_wav(data)
    return audio_fingerprint(np.rint(x * 32768.0).astype(np.int16))
