"""From-spec WAV (RIFF/PCM) codec — the audio analog of imgcodec.

The reference ships audio bytes to an external ASR service
(internal/extractors/audio/transcribe.go:40-126 — that leg stays
failure-coded offline); what the engine CAN do from public spec is
decode the container itself, which is what a training pipeline needs
for audio curation signals (duration gates, silence/energy filters,
sample-rate buckets) before any model sees the bytes.

Subset: RIFF/WAVE with a PCM ``fmt `` chunk (format tag 1), 8-bit
unsigned or 16-bit signed samples, any channel count/sample rate;
unknown chunks are skipped by their declared size. Malformed input
raises ValueError (callers surface error rows). A decode-bomb cap
bounds the sample buffer like imgcodec.MAX_PIXELS does for images.
"""

from __future__ import annotations

import struct

import numpy as np

MAX_SAMPLES = 1 << 26  # ~67M samples ≈ 25 min of 44.1 kHz stereo


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """WAV bytes -> (sample_rate, channels, int16 samples[frames,
    channels]). 8-bit unsigned samples are centered to int16 range
    ((v - 128) << 8), the standard widening."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("wav: bad RIFF/WAVE header")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        pos += 8
        body = data[pos:pos + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("wav: truncated fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            raw = body
            if len(raw) < size:
                # truncated data chunk: keep what is present (the
                # stop-at-first-error posture of the other kernels)
                pass
        pos += size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("wav: missing fmt/data chunk")
    tag, channels, rate, _byte_rate, _align, bits = fmt
    if tag != 1:
        raise ValueError(f"wav: unsupported format tag {tag}")
    if channels == 0 or rate == 0:
        raise ValueError("wav: bad fmt fields")
    if bits == 16:
        n = len(raw) // 2
        samples = np.frombuffer(raw[:n * 2], dtype="<i2").astype(
            np.int16)
    elif bits == 8:
        samples = ((np.frombuffer(raw, dtype=np.uint8).astype(np.int32)
                    - 128) << 8).astype(np.int16)
    else:
        raise ValueError(f"wav: unsupported bit depth {bits}")
    frames = samples.size // channels
    if frames == 0:
        raise ValueError("wav: empty data chunk")
    if frames * channels > MAX_SAMPLES:
        raise ValueError("wav: too many samples")
    return rate, channels, samples[:frames * channels].reshape(
        frames, channels)


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(frames,) or (frames, channels) int16 -> PCM-16 WAV bytes."""
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    frames, channels = arr.shape
    raw = arr.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def audio_stats(samples: np.ndarray, rate: int,
                channels: int) -> dict:
    """Curation signals over decoded samples — integer math only so a
    numpy oracle mirror is bit-identical:

    - duration_ms  = frames * 1000 // rate
    - mean_abs     = sum(|mono|) // frames (mono = channel mean,
                     floor division)
    - zero_cross   = count of strict sign changes in mono (zeros
                     carry the previous sign forward)
    """
    mono = (samples.astype(np.int64).sum(axis=1)
            // samples.shape[1]).astype(np.int64)
    frames = mono.size
    duration_ms = frames * 1000 // rate
    mean_abs = int(np.abs(mono).sum()) // frames
    sign = np.sign(mono)
    # zeros inherit the previous nonzero sign: drop them, then count
    # adjacent sign flips — vectorized (a per-sample Python loop at
    # MAX_SAMPLES=67M stalls an executor task for minutes)
    nz = sign[sign != 0]
    zc = int((nz[1:] != nz[:-1]).sum()) if nz.size else 0
    return {"duration_ms": int(duration_ms), "mean_abs": mean_abs,
            "zero_cross": zc, "frames": frames,
            "sample_rate": rate, "channels": channels}
