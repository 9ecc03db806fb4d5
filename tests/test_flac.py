"""From-spec FLAC codec tests.

javax.sound ships no FLAC SPI in this container (and PIL is absent), so
conformance anchors on:

1. The WAV-transcode equivalence — FLAC-encode the WAV fixtures' PCM and
   decode back to bit-identical samples (the r12 verdict's prescribed
   lane), across every stereo decorrelation mode and block size shape.
2. Hand-built spec vectors (an independent MSB-first bit writer below):
   CONSTANT and FIXED subframes, Rice residuals incl. the raw-bits
   escape, the coded frame number, and both CRCs computed from the spec
   polynomials.
3. Fuzz: truncations and bit flips normalize to ValueError (CRCs catch
   payload corruption).
"""

from __future__ import annotations

import random
import struct

import pytest

from edgy_spark.functions.flac import (
    MAX_SAMPLES,
    _crc8,
    _crc16,
    decode_flac,
    encode_flac,
)
from edgy_spark.functions.wav import decode_wav, encode_wav


def test_crc_polynomials_spec_vectors():
    # CRC-8 poly 0x07: published check value for "123456789" is 0xF4
    assert _crc8(b"123456789") == 0xF4
    # CRC-16/BUYPASS (poly 0x8005, init 0, no reflection): check 0xFEE8
    assert _crc16(b"123456789") == 0xFEE8
    assert _crc8(b"") == 0
    assert _crc16(b"") == 0


def test_wav_transcode_equivalence():
    """FLAC-encode the WAV fixture formula's PCM; decoding must return the
    IDENTICAL interleaved samples and format fields the WAV codec returns."""
    for doc_id in (0, 1, 2, 7, 40, 119):
        ch = doc_id % 2 + 1
        rate = 8000 + (doc_id % 3) * 4000
        n = (doc_id % 120 + 4) * ch
        samples = []
        for k in range(n):
            v = (doc_id * 131 + k * 997) % 65536
            samples.append(v - 65536 if v >= 32768 else v)
        wav_decoded = decode_wav(encode_wav(rate, ch, samples))
        for mode in ["independent"] + (
            ["mid_side", "left_side", "right_side"] if ch == 2 else []
        ):
            flac_decoded = decode_flac(
                encode_flac(rate, ch, samples, block_size=64 if n > 64 else 192,
                            stereo_mode=mode)
            )
            assert flac_decoded == wav_decoded, (doc_id, mode)


def test_multi_frame_and_short_last_block():
    rng = random.Random(1)
    samples = [rng.randrange(-32768, 32768) for _ in range(2 * 700)]
    data = encode_flac(44100, 2, samples, block_size=256)
    assert decode_flac(data) == (44100, 2, samples)


class _BW:
    """Independent MSB-first bit writer for hand-built streams."""

    def __init__(self):
        self.bits: list[int] = []

    def w(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ws(self, v: int, n: int) -> None:
        self.w(v & ((1 << n) - 1), n)

    def bytes(self) -> bytes:
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _streaminfo(rate: int, channels: int, bps: int, total: int) -> bytes:
    bits = 0
    bits = (bits << 16) | 192
    bits = (bits << 16) | 192
    bits = (bits << 24) | 0
    bits = (bits << 24) | 0
    bits = (bits << 20) | rate
    bits = (bits << 3) | (channels - 1)
    bits = (bits << 5) | (bps - 1)
    bits = (bits << 36) | total
    bits = (bits << 128) | 0
    return b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + bits.to_bytes(34, "big")


def test_hand_vector_constant_subframe():
    """4-sample mono CONSTANT frame, every field hand-written."""
    bw = _BW()
    bw.w(0b11111111111110, 14)
    bw.w(0, 1)
    bw.w(0, 1)  # fixed blocking
    bw.w(6, 4)  # block size: 8-bit minus 1 follows
    bw.w(0b0100, 4)  # 8000 Hz from the table
    bw.w(0, 4)  # 1 channel
    bw.w(0b100, 3)  # 16-bit
    bw.w(0, 1)
    bw.w(0, 8)  # frame number 0
    bw.w(3, 8)  # block size 4 - 1
    hdr = bw.bytes()
    bw.w(_crc8(hdr), 8)
    bw.w(0, 1)
    bw.w(0, 6)  # CONSTANT
    bw.w(0, 1)  # no wasted bits
    bw.ws(-1234, 16)
    # already byte-aligned: 8 header bytes + 8 bits + 16 bits
    body = bw.bytes()
    frame = body + struct.pack(">H", _crc16(body))
    data = _streaminfo(8000, 1, 16, 4) + frame
    assert decode_flac(data) == (8000, 1, [-1234] * 4)


def test_hand_vector_fixed_order1_rice_and_escape():
    """4-sample mono FIXED order-1: warm-up 100, residuals +1, -1, +2 via
    Rice(param=1); expected samples 100, 101, 100, 102.  Then the same
    residuals through the raw-bits escape."""
    for escape in (False, True):
        bw = _BW()
        bw.w(0b11111111111110, 14)
        bw.w(0, 1)
        bw.w(0, 1)
        bw.w(6, 4)
        bw.w(0b0100, 4)
        bw.w(0, 4)
        bw.w(0b100, 3)
        bw.w(0, 1)
        bw.w(0, 8)
        bw.w(3, 8)
        hdr = bw.bytes()
        bw.w(_crc8(hdr), 8)
        bw.w(0, 1)
        bw.w(0b001001, 6)  # FIXED order 1
        bw.w(0, 1)
        bw.ws(100, 16)  # warm-up
        bw.w(0, 2)  # 4-bit Rice params
        bw.w(0, 4)  # partition order 0
        if escape:
            bw.w(0b1111, 4)  # escape
            bw.w(3, 5)  # 3 raw bits per residual
            for r in (1, -1, 2):
                bw.ws(r, 3)
        else:
            bw.w(1, 4)  # Rice param 1
            # zigzag: +1→2, -1→1, +2→4 → (q, rem) at param 1: (1,0),(0,1),(2,0)
            for q, rem in ((1, 0), (0, 1), (2, 0)):
                for _ in range(q):
                    bw.w(0, 1)
                bw.w(1, 1)
                bw.w(rem, 1)
        while len(bw.bits) % 8:
            bw.w(0, 1)
        body = bw.bytes()
        frame = body + struct.pack(">H", _crc16(body))
        data = _streaminfo(8000, 1, 16, 4) + frame
        assert decode_flac(data) == (8000, 1, [100, 101, 100, 102]), escape


def test_hand_vector_lpc_order2():
    """4-sample mono LPC order-2 vector, every field hand-written:
    coefficients [3, -2] at precision 4, shift 1 — pred = (3*s1 - 2*s2)>>1.
    Warm-ups 10, 12; residuals +1, +2 → samples 10, 12, 9, 3
    (i=2: pred (36-20)>>1 = 8, +1 = 9; i=3: pred (27-24)>>1 = 1, +2 = 3)."""
    bw = _BW()
    bw.w(0b11111111111110, 14)
    bw.w(0, 1)
    bw.w(0, 1)
    bw.w(6, 4)
    bw.w(0b0100, 4)
    bw.w(0, 4)
    bw.w(0b100, 3)
    bw.w(0, 1)
    bw.w(0, 8)
    bw.w(3, 8)  # block size 4 - 1
    hdr = bw.bytes()
    bw.w(_crc8(hdr), 8)
    bw.w(0, 1)
    bw.w(0b100001, 6)  # LPC, order = 1 + 1 = 2
    bw.w(0, 1)  # no wasted bits
    bw.ws(10, 16)
    bw.ws(12, 16)
    bw.w(4 - 1, 4)  # precision 4
    bw.ws(1, 5)  # shift 1
    bw.ws(3, 4)  # coef for s[i-1]
    bw.ws(-2, 4)  # coef for s[i-2]
    bw.w(0, 2)  # 4-bit Rice
    bw.w(0, 4)  # partition order 0
    bw.w(1, 4)  # Rice param 1
    # zigzag: +1 → 2 → (q=1, rem 0); +2 → 4 → (q=2, rem 0)
    for q, rem in ((1, 0), (2, 0)):
        for _ in range(q):
            bw.w(0, 1)
        bw.w(1, 1)
        bw.w(rem, 1)
    while len(bw.bits) % 8:
        bw.w(0, 1)
    body = bw.bytes()
    data = _streaminfo(8000, 1, 16, 4) + body + struct.pack(">H", _crc16(body))
    assert decode_flac(data) == (8000, 1, [10, 12, 9, 3])


def test_hand_vector_wasted_bits_constant():
    """CONSTANT subframe with 2 declared wasted bits: the coded value 25
    at 14 bits must decode to 25 << 2 = 100."""
    bw = _BW()
    bw.w(0b11111111111110, 14)
    bw.w(0, 1)
    bw.w(0, 1)
    bw.w(6, 4)
    bw.w(0b0100, 4)
    bw.w(0, 4)
    bw.w(0b100, 3)
    bw.w(0, 1)
    bw.w(0, 8)
    bw.w(2, 8)  # block size 3 - 1
    hdr = bw.bytes()
    bw.w(_crc8(hdr), 8)
    bw.w(0, 1)
    bw.w(0, 6)  # CONSTANT
    bw.w(1, 1)  # wasted-bits flag
    bw.w(0b01, 2)  # unary: one zero then 1 → wasted = 2
    bw.ws(25, 14)  # bps reduced 16 → 14
    while len(bw.bits) % 8:
        bw.w(0, 1)
    body = bw.bytes()
    data = _streaminfo(8000, 1, 16, 3) + body + struct.pack(">H", _crc16(body))
    assert decode_flac(data) == (8000, 1, [100] * 3)


def test_lpc_and_wasted_bits_roundtrip():
    rng = random.Random(17)
    smooth = []
    v = 0
    for _ in range(2 * 400):
        v = max(-8000, min(8000, v + rng.randrange(-40, 41)))
        smooth.append(v)
    for mode in ("independent", "mid_side", "right_side"):
        data = encode_flac(16000, 2, smooth, block_size=128,
                           stereo_mode=mode, method="lpc")
        assert decode_flac(data) == (16000, 2, smooth), mode
    # declared wasted bits: all samples share 3 zero low bits
    shifted = [s * 8 for s in smooth[:500]]
    data = encode_flac(8000, 1, shifted, block_size=100, wasted_bits=3)
    assert decode_flac(data) == (8000, 1, shifted)
    data = encode_flac(8000, 1, shifted, block_size=100,
                       method="lpc", wasted_bits=3)
    assert decode_flac(data) == (8000, 1, shifted)
    with pytest.raises(ValueError, match="wasted"):
        encode_flac(8000, 1, [1, 2, 3, 4], wasted_bits=2)


def test_coded_frame_number_multibyte():
    """A stream whose 200th frame exercises the 2-byte coded number."""
    samples = list(range(-100, 100)) * 130  # 26000 samples → 135 frames
    data = encode_flac(8000, 1, samples, block_size=192)
    assert decode_flac(data) == (8000, 1, samples)
    assert len(samples) // 192 >= 128  # at least one multi-byte frame number


def test_streaminfo_mismatch_and_crc_errors():
    samples = [10, 20, 30, 40] * 50
    data = bytearray(encode_flac(8000, 1, samples, block_size=192))
    # corrupt one payload byte near the end: CRC-16 must catch it
    data[-3] ^= 0x40
    with pytest.raises(ValueError):
        decode_flac(bytes(data))


def test_malformed_inputs_normalize_to_value_error():
    base = encode_flac(16000, 2, [i % 251 - 125 for i in range(2 * 500)])
    rng = random.Random(9)
    for cut in (0, 3, 7, 20, 40, len(base) // 2):
        with pytest.raises(ValueError):
            decode_flac(base[:cut])
    caught = 0
    for _ in range(120):
        pos = rng.randrange(4, len(base))
        mutated = bytearray(base)
        mutated[pos] ^= 1 << rng.randrange(8)
        try:
            out = decode_flac(bytes(mutated))
            # a flip the CRC can't see (e.g. inside unused padding) may
            # still decode; it must decode to the right shape
            assert out[0] == 16000 and out[1] == 2
        except ValueError:
            caught += 1
    assert caught > 60  # the CRCs catch the vast majority of flips


def test_sample_cap_before_decode():
    # STREAMINFO claiming 2^35 samples must be rejected up front
    data = _streaminfo(8000, 2, 16, 1 << 35)
    with pytest.raises(ValueError, match="too large"):
        decode_flac(data)
    assert (1 << 35) * 2 > MAX_SAMPLES


def test_not_flac_raises():
    with pytest.raises(ValueError):
        decode_flac(b"")
    with pytest.raises(ValueError):
        decode_flac(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        decode_flac(b"fLaC")  # marker but no STREAMINFO


def test_encode_flac_validates_streaminfo_field_widths():
    """STREAMINFO packs by shift-OR: out-of-width block_size/sample_rate
    would silently corrupt adjacent fields — must raise instead
    (review r13 ADVICE)."""
    pcm = [0] * 32
    with pytest.raises(ValueError, match="block_size"):
        encode_flac(44100, 1, pcm, block_size=15)
    with pytest.raises(ValueError, match="block_size"):
        encode_flac(44100, 1, pcm, block_size=65536)
    with pytest.raises(ValueError, match="sample_rate"):
        encode_flac(1 << 20, 1, pcm)
    with pytest.raises(ValueError, match="sample_rate"):
        encode_flac(0, 1, pcm)
    # boundary values stay encodable and round-trip
    out = decode_flac(encode_flac(44100, 1, pcm, block_size=16))
    assert out[2] == pcm
