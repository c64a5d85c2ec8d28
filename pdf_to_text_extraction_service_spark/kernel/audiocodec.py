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


# --- MP3 (MPEG-1 Layer III) frame-header walk ------------------------
#
# The most common crawl audio type (the reference lists .mp3 first in
# internal/extractors/audio/transcribe.go:29-38).  Full audio decode
# is out of scope; the frame HEADERS alone give the curation signals a
# training pipeline gates on — duration, bitrate (CBR/VBR), sample
# rate, channel count — with closed-form oracles over synthetic
# frames.  ISO/IEC 11172-3 header layout (32 bits):
# sync(11) version(2) layer(2) prot(1) bitrate_idx(4) rate_idx(2)
# padding(1) private(1) channel_mode(2) ...

MP3_BITRATES_V1L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160,
                     192, 224, 256, 320)  # kbps; idx 0 = free, 15 bad
MP3_RATES_V1 = (44100, 48000, 32000)      # idx 3 reserved
MP3_SAMPLES_PER_FRAME = 1152
MAX_MP3_FRAMES = 1 << 20   # ~7 h at 44.1 kHz — walk bomb cap


def _skip_id3v2(data: bytes) -> int:
    """Return the offset past an ID3v2 tag (syncsafe 28-bit size),
    or 0 when no tag is present."""
    if len(data) < 10 or data[:3] != b"ID3":
        return 0
    sz = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) \
        | ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
    return 10 + sz


def _trailing_tag(data: bytes, pos: int) -> bool:
    """True when ``data[pos:]`` is a recognized post-stream metadata
    block: ID3v1 ('TAG' + 125 bytes), enhanced ID3v1 ('TAG+' + 351),
    an APE tag ('APETAGEX' header or footer), or a Lyrics3 block
    ('LYRICSBEGIN'...).  Real-world MP3/AAC files routinely carry
    these after the last frame; rejecting them as garbage would turn
    a large share of genuine crawl audio into error rows."""
    rest = len(data) - pos
    if data[pos:pos + 4] == b"TAG+" and rest == 227 + 128:
        return True
    if data[pos:pos + 3] == b"TAG" and rest == 128:
        return True
    if data[pos:pos + 8] == b"APETAGEX":
        return True
    if data[pos:pos + 11] == b"LYRICSBEGIN":
        return True
    return False


def parse_mp3(data: bytes) -> dict:
    """Walk MPEG-1 Layer III frame headers -> curation signals.

    Integer-only outputs (closed-form for synthetic-frame oracles):
    duration_ms = n_frames * 1152 * 1000 // rate,
    mean_bitrate_kbps = sum(per-frame kbps) // n_frames,
    vbr = more than one distinct bitrate index seen.

    Contract: raises ValueError on anything that is not a clean
    MPEG-1 Layer III stream (no frames, version/layer mismatch,
    mid-stream sample-rate change, trailing garbage that is not a
    frame header).  Truncated FINAL frame is tolerated (common for
    range-fetched crawl payloads) and still counted, and after at
    least one valid frame a trailing metadata block (ID3v1 /
    enhanced TAG+ / APE / Lyrics3, see :func:`_trailing_tag`) is
    accepted — r6, per real-world tagging practice.
    """
    pos = _skip_id3v2(data)
    n = len(data)
    n_frames = 0
    rate = None
    channels = None
    sum_kbps = 0
    kbps_seen: set[int] = set()
    while pos + 4 <= n:
        b0, b1, b2, b3 = data[pos:pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            if n_frames > 0 and _trailing_tag(data, pos):
                break
            raise ValueError(f"mp3: bad sync at {pos}")
        version = (b1 >> 3) & 0x3
        layer = (b1 >> 1) & 0x3
        if version != 3 or layer != 1:   # MPEG-1, Layer III
            raise ValueError("mp3: not MPEG-1 Layer III")
        br_idx = (b2 >> 4) & 0xF
        sr_idx = (b2 >> 2) & 0x3
        padding = (b2 >> 1) & 0x1
        mode = (b3 >> 6) & 0x3
        if br_idx == 0 or br_idx == 15 or sr_idx == 3:
            raise ValueError("mp3: bad bitrate/rate index")
        kbps = MP3_BITRATES_V1L3[br_idx]
        sr = MP3_RATES_V1[sr_idx]
        if rate is None:
            rate = sr
            channels = 1 if mode == 3 else 2
        elif sr != rate:
            raise ValueError("mp3: sample-rate change mid-stream")
        n_frames += 1
        if n_frames > MAX_MP3_FRAMES:
            raise ValueError("mp3: too many frames")
        sum_kbps += kbps
        kbps_seen.add(kbps)
        frame_len = 144000 * kbps // sr + padding
        if frame_len <= 4:
            raise ValueError("mp3: degenerate frame length")
        pos += frame_len   # truncated final frame still counts
    if 0 < n - pos < 4:
        # 1-3 leftover bytes: tolerate only a PREFIX of a valid sync
        # (a range-fetch cut mid-header); anything else is trailing
        # garbage, per the strict-stream contract
        if data[pos] != 0xFF or (
                n - pos >= 2 and (data[pos + 1] & 0xE0) != 0xE0):
            raise ValueError(f"mp3: trailing garbage at {pos}")
    if n_frames == 0 or rate is None:
        raise ValueError("mp3: no frames")
    return {
        "sample_rate": rate,
        "channels": channels,
        "n_frames": n_frames,
        "duration_ms": n_frames * MP3_SAMPLES_PER_FRAME * 1000 // rate,
        "mean_bitrate_kbps": sum_kbps // n_frames,
        "vbr": len(kbps_seen) > 1,
    }


def encode_mp3_frames(frame_kbps: list[int], rate: int = 44100,
                      mono: bool = False, pad_every: int = 0,
                      id3_bytes: int = 0) -> bytes:
    """Synthetic MPEG-1 Layer III stream: valid headers, zeroed
    payloads — every parse_mp3 output is closed-form from the
    arguments (the fixture analog of encode_wav)."""
    sr_idx = MP3_RATES_V1.index(rate)
    out = bytearray()
    if id3_bytes:
        sz = id3_bytes
        out += b"ID3\x04\x00\x00" + bytes([
            (sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
            (sz >> 7) & 0x7F, sz & 0x7F]) + b"\x00" * sz
    for i, kbps in enumerate(frame_kbps):
        br_idx = MP3_BITRATES_V1L3.index(kbps)
        padding = 1 if pad_every and (i % pad_every == 0) else 0
        mode = 3 if mono else 0
        hdr = bytes([
            0xFF,
            0xE0 | (3 << 3) | (1 << 1) | 1,       # MPEG-1 L3, no CRC
            (br_idx << 4) | (sr_idx << 2) | (padding << 1),
            mode << 6,
        ])
        frame_len = 144000 * kbps // rate + padding
        out += hdr + b"\x00" * (frame_len - 4)
    return bytes(out)


# --- FLAC STREAMINFO ------------------------------------------------
#
# .flac is in the reference's audio extension list (transcribe.go:
# 29-38).  The mandatory first metadata block (STREAMINFO, RFC 9639
# §8.2) carries every curation signal without decoding any audio
# frame: sample rate (20 bits), channels (3 bits + 1), bit depth
# (5 bits + 1), total samples (36 bits).

def parse_flac(data: bytes) -> dict:
    """FLAC header -> ``(sample_rate, channels, bits_per_sample,
    total_samples, duration_ms)``.  Integer-only; raises ValueError
    on anything that is not a FLAC stream with a valid STREAMINFO."""
    if len(data) < 4 + 4 + 34 or data[:4] != b"fLaC":
        raise ValueError("flac: bad magic or truncated")
    hdr = data[4]
    if (hdr & 0x7F) != 0:   # block type 0 = STREAMINFO, must be first
        raise ValueError("flac: first block is not STREAMINFO")
    size = int.from_bytes(data[5:8], "big")
    if size < 34:
        raise ValueError("flac: STREAMINFO too short")
    b = data[8:8 + 34]
    # bytes 10..17 pack rate(20) chans(3) bits(5) total(36)
    packed = int.from_bytes(b[10:18], "big")
    rate = packed >> 44
    channels = ((packed >> 41) & 0x7) + 1
    bits = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)
    if rate == 0:
        raise ValueError("flac: zero sample rate")
    return {
        "sample_rate": rate,
        "channels": channels,
        "bits_per_sample": bits,
        "total_samples": total,
        "duration_ms": total * 1000 // rate,
    }


def encode_flac_header(rate: int = 44100, channels: int = 2,
                       bits: int = 16, total_samples: int = 0) -> bytes:
    """Synthetic FLAC stream header (STREAMINFO only, marked last
    block): every parse_flac output is closed-form from the
    arguments."""
    packed = (rate << 44) | ((channels - 1) << 41) \
        | ((bits - 1) << 36) | total_samples
    streaminfo = (b"\x00" * 10          # block sizes / frame sizes
                  + packed.to_bytes(8, "big")
                  + b"\x00" * 16)       # md5
    return (b"fLaC" + b"\x80" + (34).to_bytes(3, "big") + streaminfo)


# --- OGG (Vorbis / Opus) page walk ----------------------------------
#
# .ogg and .opus cover the remaining common crawl audio types in the
# reference's list.  Page headers (RFC 3533) plus the first packet's
# id header (Vorbis I §4.2.2 / RFC 7845 §5.1) give codec, channels,
# rate, and — from the LAST page's granule position — duration,
# without decoding audio.

MAX_OGG_PAGES = 1 << 20


def parse_ogg(data: bytes) -> dict:
    """OGG container -> ``(codec, sample_rate, channels,
    duration_ms)``.  Granule semantics: Vorbis granule = PCM samples
    at the stream rate; Opus granule = 48 kHz samples minus pre-skip
    (RFC 7845 §4).  Raises ValueError on malformed streams."""
    if len(data) < 28 or data[:4] != b"OggS":
        raise ValueError("ogg: bad capture pattern")
    pos = 0
    n = len(data)
    pages = 0
    first_payload = None
    last_granule = 0
    while pos + 27 <= n:
        if data[pos:pos + 4] != b"OggS" or data[pos + 4] != 0:
            raise ValueError(f"ogg: bad page header at {pos}")
        pages += 1
        if pages > MAX_OGG_PAGES:
            raise ValueError("ogg: too many pages")
        granule = int.from_bytes(data[pos + 6:pos + 14], "little",
                                 signed=True)
        nsegs = data[pos + 26]
        lacing = data[pos + 27:pos + 27 + nsegs]
        if len(lacing) < nsegs:
            raise ValueError("ogg: truncated lacing table")
        body_len = sum(lacing)
        body_start = pos + 27 + nsegs
        if body_start + body_len > n:
            # truncated final page: keep previous granule, stop
            break
        if first_payload is None:
            first_payload = data[body_start:body_start + body_len]
        if granule >= 0:
            last_granule = granule
        pos = body_start + body_len
    if first_payload is None:
        raise ValueError("ogg: no complete pages")
    if first_payload.startswith(b"\x01vorbis"):
        if len(first_payload) < 16:
            raise ValueError("ogg: truncated vorbis id header")
        channels = first_payload[11]
        rate = int.from_bytes(first_payload[12:16], "little")
        if rate == 0 or channels == 0:
            raise ValueError("ogg: bad vorbis id header")
        dur_ms = last_granule * 1000 // rate
        if dur_ms >= (1 << 63):
            # 63-bit granule over a tiny claimed rate must not crash
            # the operator's Arrow int64 cast (sanity bound)
            raise ValueError("ogg: implausible duration")
        return {"codec": "vorbis", "sample_rate": rate,
                "channels": channels,
                "duration_ms": dur_ms}
    if first_payload.startswith(b"OpusHead"):
        if len(first_payload) < 19:
            raise ValueError("ogg: truncated opus id header")
        channels = first_payload[9]
        pre_skip = int.from_bytes(first_payload[10:12], "little")
        rate = int.from_bytes(first_payload[12:16], "little")
        if channels == 0:
            raise ValueError("ogg: bad opus id header")
        samples = max(0, last_granule - pre_skip)
        return {"codec": "opus", "sample_rate": rate or 48000,
                "channels": channels,
                "duration_ms": samples * 1000 // 48000}
    raise ValueError("ogg: unknown codec id header")


def encode_ogg(codec: str = "vorbis", rate: int = 44100,
               channels: int = 2, granule: int = 0,
               pre_skip: int = 312, pages: int = 2) -> bytes:
    """Synthetic OGG stream: an id-header page plus ``pages - 1``
    zero-payload data pages, the last carrying ``granule`` — every
    parse_ogg output is closed-form from the arguments."""
    def page(seq: int, g: int, body: bytes, htype: int) -> bytes:
        lacing = []
        rem = len(body)
        while True:
            lacing.append(min(rem, 255))
            rem -= lacing[-1]
            if lacing[-1] < 255:
                break
        return (b"OggS" + b"\x00" + bytes([htype])
                + g.to_bytes(8, "little", signed=True)
                + (1).to_bytes(4, "little")
                + seq.to_bytes(4, "little")
                + b"\x00" * 4
                + bytes([len(lacing)]) + bytes(lacing) + body)

    if codec == "vorbis":
        ident = (b"\x01vorbis" + b"\x00\x00\x00\x00"
                 + bytes([channels])
                 + rate.to_bytes(4, "little") + b"\x00" * 13)
    else:
        ident = (b"OpusHead" + b"\x01" + bytes([channels])
                 + pre_skip.to_bytes(2, "little")
                 + rate.to_bytes(4, "little") + b"\x00\x00\x00")
    out = page(0, 0, ident, 0x02)
    for i in range(1, max(pages, 2)):
        g = granule if i == max(pages, 2) - 1 else granule * i // pages
        out += page(i, g, b"\x00\x00", 0x04 if i == pages - 1 else 0)
    return out


# --- AAC ADTS frame-header walk -------------------------------------
#
# .aac completes the reference's 9-type audio list: raw AAC streams
# ship in ADTS framing (ISO/IEC 13818-7), and the headers alone give
# rate/channels/duration — same strategy as parse_mp3.

ADTS_RATES = (96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
              16000, 12000, 11025, 8000, 7350)
MAX_ADTS_FRAMES = 1 << 20


def parse_adts(data: bytes) -> dict:
    """Walk ADTS frame headers -> ``(sample_rate, channels, n_frames,
    duration_ms, profile)``.  1024 samples per raw-data block;
    truncated FINAL frame tolerated, trailing non-sync garbage
    rejected, trailing metadata blocks (ID3v1/TAG+/APE/Lyrics3)
    accepted after a valid frame (parse_mp3's contract)."""
    pos = 0
    n = len(data)
    n_frames = 0
    rate = None
    channels = None
    profile = None
    samples = 0
    while pos + 7 <= n:
        if data[pos] != 0xFF or (data[pos + 1] & 0xF0) != 0xF0:
            if n_frames > 0 and _trailing_tag(data, pos):
                break
            raise ValueError(f"adts: bad sync at {pos}")
        if (data[pos + 1] & 0x06) != 0x00:   # layer must be 00
            raise ValueError("adts: bad layer")
        prof = (data[pos + 2] >> 6) & 0x3
        sr_idx = (data[pos + 2] >> 2) & 0xF
        if sr_idx >= len(ADTS_RATES):
            raise ValueError("adts: bad sampling index")
        ch = ((data[pos + 2] & 0x1) << 2) | (data[pos + 3] >> 6)
        frame_len = ((data[pos + 3] & 0x03) << 11) \
            | (data[pos + 4] << 3) | (data[pos + 5] >> 5)
        rdbs = (data[pos + 6] & 0x03) + 1
        if frame_len < 7:
            raise ValueError("adts: degenerate frame length")
        sr = ADTS_RATES[sr_idx]
        if rate is None:
            rate, channels, profile = sr, ch, prof
        elif sr != rate:
            raise ValueError("adts: sample-rate change mid-stream")
        n_frames += 1
        if n_frames > MAX_ADTS_FRAMES:
            raise ValueError("adts: too many frames")
        samples += 1024 * rdbs
        pos += frame_len   # truncated final frame still counts
    if n_frames == 0 or rate is None:
        raise ValueError("adts: no frames")
    if 0 < n - pos < 7:
        if data[pos] != 0xFF or (
                n - pos >= 2 and (data[pos + 1] & 0xF0) != 0xF0):
            raise ValueError(f"adts: trailing garbage at {pos}")
    return {
        "sample_rate": rate,
        "channels": channels,
        "n_frames": n_frames,
        "duration_ms": samples * 1000 // rate,
        "profile": profile,
    }


def encode_adts(n_frames: int, rate: int = 44100, channels: int = 2,
                profile: int = 1, rdbs: int = 1) -> bytes:
    """Synthetic ADTS stream: valid headers, zero payloads — every
    parse_adts output closed-form from the arguments."""
    sr_idx = ADTS_RATES.index(rate)
    out = bytearray()
    frame_len = 7 + 4   # header + 4 zero payload bytes
    for _ in range(n_frames):
        h = bytearray(7)
        h[0] = 0xFF
        h[1] = 0xF1                    # MPEG-4, layer 00, no CRC
        h[2] = (profile << 6) | (sr_idx << 2) | ((channels >> 2) & 1)
        h[3] = ((channels & 0x3) << 6) | ((frame_len >> 11) & 0x03)
        h[4] = (frame_len >> 3) & 0xFF
        h[5] = ((frame_len & 0x7) << 5) | 0x1F
        h[6] = 0xFC | (rdbs - 1)
        out += h + b"\x00" * 4
    return bytes(out)
