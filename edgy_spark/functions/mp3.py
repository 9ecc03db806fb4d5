"""From-spec MPEG audio (MP3) frame-stream parser, pure stdlib — the
header/framing layer of ISO/IEC 11172-3 (MPEG-1) and 13818-3 (MPEG-2/2.5
extension): sync walk, frame-header field decode against the published
bitrate/sample-rate tables, Layer III frame sizing, and ID3v1/ID3v2 tag
skipping.

Scope honesty: this module parses the FRAME STREAM — the layer a crawl
pipeline needs for audio metadata (duration, bitrate profile, sample
rate, channel mode) and for validating that a ``.mp3`` payload is real —
but does NOT decode samples.  Full Layer III sample reconstruction
(scalefactor/Huffman part-2-3 decode, requantization, stereo processing,
alias reduction, IMDCT, polyphase synthesis) is float-valued DSP whose
outputs are not integer-exact across implementations, so it cannot sit
under a cross-engine value hash; ``decode_mp3_samples`` raises an honest
NotImplementedError (the lossless audio lanes — WAV and FLAC,
functions/{wav,flac}.py — are the hash-gated sample decoders).

Everything integer here is exact: frame byte sizes come from the spec's
``floor(coefficient * bitrate / sample_rate) + padding`` formula, sample
counts are per-frame constants, so the oracle can reproduce every
statistic in closed form.

Reference parity: cdsmith/edgy stores media as opaque Binary attributes;
this is north-star training-pipeline scope (SURVEY.md §2 multimodal).
"""

from __future__ import annotations

# version ids (header bits 19-20)
MPEG1, MPEG2, MPEG25 = 3, 2, 0

#: Layer III bitrates in kbps by version, index 1..14 (0 = free format,
#: 15 = invalid) — ISO 11172-3 table B.2 / 13818-3 lower-rate extension.
BITRATES_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
BITRATES_V2_L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]

#: sample rates in Hz by version, index 0..2 (3 = invalid)
SAMPLE_RATES = {
    MPEG1: (44100, 48000, 32000),
    MPEG2: (22050, 24000, 16000),
    MPEG25: (11025, 12000, 8000),
}

CHANNEL_MODES = ("stereo", "joint_stereo", "dual_channel", "mono")


class Mp3Frame:
    __slots__ = (
        "offset", "version", "bitrate_kbps", "sample_rate",
        "padding", "channel_mode", "samples", "frame_bytes", "has_crc",
    )


def _parse_frame_header(data: bytes, pos: int) -> Mp3Frame:
    """Decode one 4-byte Layer III frame header at ``pos`` (ValueError on
    anything that is not a valid Layer III header)."""
    if pos + 4 > len(data):
        raise ValueError("truncated frame header")
    b0, b1, b2, b3 = data[pos : pos + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        raise ValueError("lost frame sync")
    version = (b1 >> 3) & 0x3
    if version == 1:
        raise ValueError("reserved MPEG version")
    layer = (b1 >> 1) & 0x3
    if layer != 1:  # 01 = Layer III
        raise ValueError("not Layer III")
    f = Mp3Frame()
    f.offset = pos
    f.version = version
    f.has_crc = not (b1 & 0x1)  # protection bit CLEAR means CRC present
    bitrate_idx = (b2 >> 4) & 0xF
    if bitrate_idx in (0, 15):
        raise ValueError("free-format or invalid bitrate index")
    table = BITRATES_V1_L3 if version == MPEG1 else BITRATES_V2_L3
    f.bitrate_kbps = table[bitrate_idx]
    sr_idx = (b2 >> 2) & 0x3
    if sr_idx == 3:
        raise ValueError("invalid sample-rate index")
    f.sample_rate = SAMPLE_RATES[version][sr_idx]
    f.padding = (b2 >> 1) & 0x1
    f.channel_mode = CHANNEL_MODES[(b3 >> 6) & 0x3]
    # Layer III: 1152 samples/frame (MPEG-1), 576 (MPEG-2/2.5); the size
    # coefficient is samples/8 = 144 resp. 72
    f.samples = 1152 if version == MPEG1 else 576
    coeff = 144 if version == MPEG1 else 72
    f.frame_bytes = (coeff * f.bitrate_kbps * 1000) // f.sample_rate + f.padding
    if f.frame_bytes < 4:
        raise ValueError("impossible frame size")
    return f


def _skip_id3v2(data: bytes, pos: int) -> int:
    """Skip an ID3v2 tag at ``pos`` if present (10-byte header with a
    28-bit syncsafe size, +10 footer bytes when flagged)."""
    if data[pos : pos + 3] != b"ID3" or pos + 10 > len(data):
        return pos
    flags = data[pos + 5]
    size_bytes = data[pos + 6 : pos + 10]
    if any(b & 0x80 for b in size_bytes):
        raise ValueError("non-syncsafe ID3v2 size")
    size = 0
    for b in size_bytes:
        size = (size << 7) | b
    end = pos + 10 + size + (10 if flags & 0x10 else 0)
    if end > len(data):
        raise ValueError("ID3v2 tag overruns file")
    return end


def parse_mp3_frames(data: bytes) -> list[Mp3Frame]:
    """Walk a complete MP3 stream: optional leading ID3v2 tag, then
    back-to-back Layer III frames, then an optional trailing 128-byte
    ID3v1 tag.  STRICT walk — a gap or malformed header raises ValueError
    (crawl robustness comes from the caller's on_error contract, not from
    silently resynchronizing over garbage)."""
    if len(data) < 4:
        raise ValueError("not an MP3 stream")
    try:
        pos = _skip_id3v2(data, 0)
        end = len(data)
        if end - pos >= 128 and data[end - 128 : end - 125] == b"TAG":
            end -= 128  # ID3v1 trailer
        frames: list[Mp3Frame] = []
        while pos < end:
            f = _parse_frame_header(data, pos)
            if pos + f.frame_bytes > end:
                raise ValueError("frame overruns stream")
            frames.append(f)
            pos = f.offset + f.frame_bytes
        if not frames:
            raise ValueError("no MPEG frames")
        return frames
    except ValueError:
        raise
    except (IndexError, OverflowError, MemoryError) as e:
        raise ValueError(f"malformed MP3: {type(e).__name__}: {e}") from e


def mp3_stream_stats(data: bytes) -> tuple[int, int, str, int, int, int]:
    """(n_frames, sample_rate, channel_mode, total_samples,
    sum_bitrate_kbps, audio_bytes) — every component integer-exact, so a
    SQL oracle reproduces them in closed form.  sample_rate/channel_mode
    come from the first frame (a stream that changes them mid-file is
    still summed faithfully)."""
    frames = parse_mp3_frames(data)
    return (
        len(frames),
        frames[0].sample_rate,
        frames[0].channel_mode,
        sum(f.samples for f in frames),
        sum(f.bitrate_kbps for f in frames),
        sum(f.frame_bytes for f in frames),
    )


def decode_mp3_samples(data: bytes):
    """Honest scope boundary: Layer III sample reconstruction is
    float-valued DSP (IMDCT + polyphase synthesis) that cannot sit under
    a cross-engine integer hash, and no decoder library ships in this
    environment to anchor conformance.  The hash-gated sample lanes are
    WAV and FLAC."""
    raise NotImplementedError(
        "MP3 sample decode not implemented (frame/header layer only; "
        "use the WAV/FLAC lanes for sample-exact audio)"
    )


# -- encoder (fixtures + round-trip tests) ----------------------------------


def encode_mp3_frames(
    frame_specs: list[dict],
    id3v2_size: int | None = None,
    id3v1: bool = False,
) -> bytes:
    """Build a genuine Layer III FRAME STREAM (valid headers, correct
    spec-formula frame sizes, deterministic filler payload — there is no
    real audio encoder here, and none is needed: the parser under test
    never reads payload bits).  Each spec: ``version`` (default MPEG1),
    ``bitrate_idx`` (1..14), ``sr_idx`` (0..2), ``padding`` (0/1),
    ``channel_mode`` (0..3).  ``id3v2_size`` prepends a tag with that
    payload size; ``id3v1`` appends the 128-byte trailer."""
    out = bytearray()
    if id3v2_size is not None:
        if not 0 <= id3v2_size < (1 << 28):
            raise ValueError("bad ID3v2 size")
        size = bytes(
            (id3v2_size >> s) & 0x7F for s in (21, 14, 7, 0)
        )
        out += b"ID3" + bytes((4, 0, 0)) + size + bytes(id3v2_size)
    for i, spec in enumerate(frame_specs):
        version = spec.get("version", MPEG1)
        bitrate_idx = spec["bitrate_idx"]
        sr_idx = spec.get("sr_idx", 0)
        padding = spec.get("padding", 0)
        mode = spec.get("channel_mode", 0)
        if version not in (MPEG1, MPEG2, MPEG25):
            raise ValueError("bad MPEG version")
        if not 1 <= bitrate_idx <= 14 or not 0 <= sr_idx <= 2:
            raise ValueError("bad bitrate/sample-rate index")
        b1 = 0xE0 | (version << 3) | (1 << 1) | 1  # layer III, no CRC
        b2 = (bitrate_idx << 4) | (sr_idx << 2) | (padding << 1)
        b3 = (mode & 0x3) << 6
        table = BITRATES_V1_L3 if version == MPEG1 else BITRATES_V2_L3
        sr = SAMPLE_RATES[version][sr_idx]
        coeff = 144 if version == MPEG1 else 72
        nbytes = (coeff * table[bitrate_idx] * 1000) // sr + padding
        payload = bytes((i * 7 + k) % 251 for k in range(nbytes - 4))
        out += bytes((0xFF, b1, b2, b3)) + payload
    if id3v1:
        out += b"TAG" + bytes(125)
    return bytes(out)
