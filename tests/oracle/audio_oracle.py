"""Independent audio-feature oracle.

Parses WAV with the STDLIB ``wave`` module (its own RIFF machinery —
shares no code with the engine's chunk walk in
``rayxt.multimodal._wav_samples``), then applies the frozen feature
arithmetic documented on ``rayxt.multimodal._audio_features`` (the
shared spec, like the JPEG oracles' IDCT).  The engine must match the
oracle bit-for-bit on every fixture row.
"""

from __future__ import annotations

import io
import sys
import wave

import numpy as np

try:
    from ray import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass


def oracle_audio_features(payload: bytes) -> dict:
    with wave.open(io.BytesIO(payload)) as wav:
        channels = wav.getnchannels()
        sr = wav.getframerate()
        n = wav.getnframes()
        if wav.getsampwidth() != 2:
            raise NotImplementedError("oracle covers PCM16 only")
        raw = wav.readframes(n)
    samples = np.frombuffer(raw, dtype="<i2")
    n = len(samples) // channels
    if n == 0:
        return {"duration_s": 0.0, "rms": 0.0, "zcr": 0.0,
                "spectral_centroid": 0.0, "dominant_freq": 0.0}
    mix = samples[:n * channels].reshape(n, channels) \
        .astype(np.float64).mean(axis=1) / 32768.0
    duration_s = round(n / sr, 6)
    rms = round(float(np.sqrt(np.mean(mix * mix))), 6)
    if n > 1:
        sgn = mix >= 0.0
        zcr = round(int(np.count_nonzero(sgn[1:] != sgn[:-1])) / (n - 1), 6)
    else:
        zcr = 0.0
    mag = np.abs(np.fft.rfft(mix))
    freqs = np.arange(mag.size) * (sr / n)
    total = float(mag.sum())
    centroid = round(float((freqs * mag).sum()) / total, 6) if total > 0 else 0.0
    dom = round(float(freqs[1:][int(np.argmax(mag[1:]))]), 6) \
        if mag.size > 1 else 0.0
    return {"duration_s": duration_s, "rms": rms, "zcr": zcr,
            "spectral_centroid": centroid, "dominant_freq": dom}
