"""From-spec VP8L (lossless WebP) codec tests.

The JDK's javax.imageio has no WebP plugin (and PIL is absent in this
container), so the cross-validation lane used for PNG/GIF/JPEG does not
apply here.  Conformance is anchored three ways instead:

1. HAND-BUILT bitstreams (an independent little bit-writer below, not the
   encoder) decoded against hand-computed pixels — covering simple and
   code-length-coded prefix codes, repeat codes, LZ77 backrefs through the
   2D distance map, the color cache, and meta prefix (entropy) images.
2. Arithmetic pins of the transform inverses against values computed
   by hand from the spec formulas (Select / ClampAddSubtract / Average2 /
   ColorTransformDelta).
3. Encoder round-trips across all 14 predictor modes, subtract-green,
   and palette packing widths (1/2/4/8-bit indices).
"""

from __future__ import annotations

import random
import struct

import pytest

from edgy_spark.functions.webp import (
    _DISTANCE_MAP,
    MAX_PIXELS,
    decode_webp,
    encode_webp_lossless,
)


class _BW:
    """Independent LSB-first bit writer for hand-built streams."""

    def __init__(self):
        self.bits: list[int] = []

    def w(self, v: int, n: int) -> None:  # LSB-first field
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def wc(self, code: int, n: int) -> None:  # prefix code, MSB-first
        for i in range(n - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i : i + 8]):
                b |= bit << j
            out.append(b)
        return bytes(out)


def _riff(vp8l_payload: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(vp8l_payload)) + vp8l_payload
    if len(vp8l_payload) & 1:
        chunk += b"\x00"
    body = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _header(bw: _BW, w: int, h: int) -> None:
    bw.w(0x2F, 8)
    bw.w(w - 1, 14)
    bw.w(h - 1, 14)
    bw.w(0, 1)  # alpha hint
    bw.w(0, 3)  # version


def _simple_single(bw: _BW, sym: int) -> None:
    """Simple prefix code carrying ONE symbol (zero bits per read)."""
    bw.w(1, 1)
    bw.w(0, 1)  # num_symbols - 1
    if sym < 2:
        bw.w(0, 1)
        bw.w(sym, 1)
    else:
        bw.w(1, 1)
        bw.w(sym, 8)


def _simple_pair(bw: _BW, s0: int, s1: int) -> None:
    """Simple prefix code with TWO 8-bit symbols (1 bit per read;
    canonical: smaller symbol gets code 0)."""
    bw.w(1, 1)
    bw.w(1, 1)
    bw.w(1, 1)  # first symbol in 8 bits
    bw.w(s0, 8)
    bw.w(s1, 8)


def _complex_two_len1(bw: _BW, sym_a: int, sym_b: int, alphabet: int) -> None:
    """Code-length-coded tree: two symbols at length 1, zeros elsewhere,
    exercising repeat codes 17/18.  Code-length code: {1: len1, 17: len2,
    0: len3, 18: len3} → canonical 1→0, 17→10, 0→110, 18→111."""
    assert sym_a < sym_b < alphabet
    bw.w(0, 1)  # not simple
    bw.w(19 - 4, 4)  # all 19 code-length-code lengths present
    lengths = {17: 2, 18: 3, 0: 3, 1: 1}
    for s in (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15):
        bw.w(lengths.get(s, 0), 3)
    bw.w(0, 1)  # no max_symbol

    def emit_len1():
        bw.wc(0b0, 1)

    def emit_zeros(n: int) -> None:
        while n >= 11:
            take = min(n, 138)
            bw.wc(0b111, 3)
            bw.w(take - 11, 7)
            n -= take
        while n >= 3:
            take = min(n, 10)
            bw.wc(0b10, 2)
            bw.w(take - 3, 3)
            n -= take
        for _ in range(n):
            bw.wc(0b110, 3)

    emit_zeros(sym_a)
    emit_len1()
    emit_zeros(sym_b - sym_a - 1)
    emit_len1()
    emit_zeros(alphabet - sym_b - 1)


def test_hand_vector_simple_codes_two_literals():
    """2x1 image, literal-only, simple prefix codes (hand-computed)."""
    bw = _BW()
    _header(bw, 2, 1)
    bw.w(0, 1)  # no transforms
    bw.w(0, 1)  # no color cache
    bw.w(0, 1)  # no meta prefix image
    _simple_pair(bw, 10, 20)  # green
    _simple_single(bw, 30)  # red
    _simple_single(bw, 40)  # blue
    _simple_single(bw, 255)  # alpha
    _simple_single(bw, 0)  # distance
    bw.wc(0, 1)  # green 10
    bw.wc(1, 1)  # green 20
    w, h, ch, px = decode_webp(_riff(bw.bytes()))
    assert (w, h, ch) == (2, 1, 4)
    assert px == bytes([30, 10, 40, 255, 30, 20, 40, 255])


def test_hand_vector_lz77_backref_through_distance_map():
    """3x1: one literal + a length-2 distance-1 backref (distance symbol 1
    → copy distance 2 → plane code 2 → map entry (1, 0) → pixel distance
    1).  Green tree is code-length-coded (symbol 257 needs >8 bits)."""
    bw = _BW()
    _header(bw, 3, 1)
    bw.w(0, 1)
    bw.w(0, 1)
    bw.w(0, 1)
    _complex_two_len1(bw, 10, 257, 280)  # green: literal 10, length-sym 1
    _simple_single(bw, 30)
    _simple_single(bw, 40)
    _simple_single(bw, 255)
    _simple_single(bw, 1)  # distance: always symbol 1
    bw.wc(0, 1)  # green 10 literal (canonical: 10 < 257 → code 0)
    bw.wc(1, 1)  # green 257 = length symbol 1 → length 2, no extra bits
    # distance symbol read consumes zero bits (single-symbol tree)
    w, h, ch, px = decode_webp(_riff(bw.bytes()))
    assert (w, h, ch) == (3, 1, 4)
    assert px == bytes([30, 10, 40, 255] * 3)


def test_hand_vector_color_cache_roundtrip():
    """2x1 with a 2-entry color cache: literal then a cache hit."""
    argb = 0xFF000000  # a=255, r=g=b=0
    cache_bits = 1
    key = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)
    alphabet = 256 + 24 + 2
    bw = _BW()
    _header(bw, 2, 1)
    bw.w(0, 1)  # no transforms
    bw.w(1, 1)  # color cache present
    bw.w(cache_bits, 4)
    bw.w(0, 1)  # no meta prefix image
    _complex_two_len1(bw, 0, 280 + key, alphabet)  # green: literal 0 + cache ref
    _simple_single(bw, 0)  # red
    _simple_single(bw, 0)  # blue
    _simple_single(bw, 255)  # alpha
    _simple_single(bw, 0)  # distance
    bw.wc(0, 1)  # literal green 0
    bw.wc(1, 1)  # cache symbol
    w, h, ch, px = decode_webp(_riff(bw.bytes()))
    assert (w, h, ch) == (2, 1, 4)
    assert px == bytes([0, 0, 0, 255] * 2)


def test_hand_vector_meta_prefix_image_two_groups():
    """8x1 with a meta prefix image (block bits 2 → two 4-pixel blocks),
    two prefix-code groups of single-symbol trees — the left half decodes
    through group 0, the right half through group 1, zero payload bits."""
    bw = _BW()
    _header(bw, 8, 1)
    bw.w(0, 1)  # no transforms
    bw.w(0, 1)  # no color cache
    bw.w(1, 1)  # meta prefix image present
    bw.w(0, 3)  # huffman_bits = 2 → huffman image 2x1
    # --- entropy sub-image stream (2x1, no transform/meta bits) ---
    bw.w(0, 1)  # no color cache
    _simple_pair(bw, 0, 1)  # green = meta code low byte: 0 then 1
    _simple_single(bw, 0)  # red (meta code high byte)
    _simple_single(bw, 0)  # blue
    _simple_single(bw, 255)  # alpha
    _simple_single(bw, 0)  # distance
    bw.wc(0, 1)  # meta pixel 0 → group 0
    bw.wc(1, 1)  # meta pixel 1 → group 1
    # --- group 0 trees ---
    _simple_single(bw, 10)
    _simple_single(bw, 30)
    _simple_single(bw, 40)
    _simple_single(bw, 255)
    _simple_single(bw, 0)
    # --- group 1 trees ---
    _simple_single(bw, 20)
    _simple_single(bw, 31)
    _simple_single(bw, 41)
    _simple_single(bw, 254)
    _simple_single(bw, 0)
    # payload: every tree is single-symbol → zero bits
    w, h, ch, px = decode_webp(_riff(bw.bytes()))
    assert (w, h, ch) == (8, 1, 4)
    assert px == bytes([30, 10, 40, 255] * 4 + [31, 20, 41, 254] * 4)


def test_hand_vector_color_transform_inverse():
    """1x1 image through the cross-COLOR transform, hand-computed per the
    spec: cte (g2r=32, g2b=64, r2b=16) on stored (a=255, r=50, g=8, b=80):
    delta(32,8) = (32*8)>>5 = 8 → red 58; blue 80 + (64*8)>>5=16
    + (16*58)>>5=29 (with the RESTORED red) → 125."""
    bw = _BW()
    _header(bw, 1, 1)
    bw.w(1, 1)  # transform present
    bw.w(1, 2)  # COLOR transform
    bw.w(0, 3)  # size_bits = 2 (one block covers 1x1)
    # transform sub-image (1x1): cte rides (red=r2b, green=g2b, blue=g2r)
    bw.w(0, 1)  # no color cache
    _simple_single(bw, 64)  # green = g2b
    _simple_single(bw, 16)  # red = r2b
    _simple_single(bw, 32)  # blue = g2r
    _simple_single(bw, 255)
    _simple_single(bw, 0)
    bw.w(0, 1)  # end of transforms
    bw.w(0, 1)  # no color cache
    bw.w(0, 1)  # no meta prefix image
    _simple_single(bw, 8)  # green
    _simple_single(bw, 50)  # red (stored)
    _simple_single(bw, 80)  # blue (stored)
    _simple_single(bw, 255)
    _simple_single(bw, 0)
    w, h, ch, px = decode_webp(_riff(bw.bytes()))
    assert (w, h, ch) == (1, 1, 4)
    assert px == bytes([58, 8, 125, 255])


def test_roundtrip_color_transform_combos():
    rng = random.Random(23)
    for w, h in [(1, 1), (5, 7), (16, 3)]:
        rgba = bytes(rng.randrange(256) for _ in range(w * h * 4))
        for kwargs in (
            {"color_cte": (200, 13, 77)},
            {"color_cte": (255, 128, 1), "subtract_green": True},
            {"color_cte": (32, 64, 16), "predictor_mode": 11},
            {"color_cte": (5, 250, 99), "subtract_green": True,
             "predictor_mode": 12},
        ):
            data = encode_webp_lossless(w, h, rgba, **kwargs)
            assert decode_webp(data) == (w, h, 4, rgba), (w, h, kwargs)


def test_distance_map_matches_spec_table():
    """Pin the spec's published 2D distance table: the first dozen
    entries verbatim plus spot checks deeper in (the generation rule —
    Euclidean order, |dx| then +dx-first ties — must reproduce it)."""
    assert _DISTANCE_MAP[:12] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
        (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2),
    ]
    assert _DISTANCE_MAP[12:22] == [
        (0, 3), (3, 0), (1, 3), (-1, 3), (3, 1), (-3, 1),
        (2, 3), (-2, 3), (3, 2), (-3, 2),
    ]
    assert _DISTANCE_MAP[22:24] == [(0, 4), (4, 0)]
    assert _DISTANCE_MAP[34] == (0, 5)
    assert len(_DISTANCE_MAP) == 120
    assert len(set(_DISTANCE_MAP)) == 120
    assert _DISTANCE_MAP[-1] == (8, 7)


def test_transform_arithmetic_pins():
    """Hand-computed spec-formula pins for the predictor/color helpers."""
    from edgy_spark.functions.webp import (
        _avg2,
        _clamp_add_full,
        _clamp_add_half,
        _ct_delta,
        _select,
    )

    # Average2: per-channel floor mean
    assert _avg2(0xFF00FF00, 0x00FF00FF) == 0x7F7F7F7F
    assert _avg2(0x01010101, 0x02020202) == 0x01010101
    # Select: predict T when sum|L-TL| <= sum|T-TL| else L
    t, l, tl = 0xFF000000 | (100 << 8), 0xFF000000 | (10 << 8), 0xFF000000 | (12 << 8)
    # gradient p = L + T - TL = 98: both argument orders pick the
    # neighbor closest to p — the 100-green pixel
    assert _select(t, l, tl) == t
    assert _select(l, t, tl) == t
    # ClampAddSubtractFull: clamp(L + T - TL) per channel
    assert _clamp_add_full(0x00FF0000, 0x00FF0000, 0x00000000) == 0x00FF0000
    assert _clamp_add_full(0x00100000, 0x00100000, 0x00300000) == 0x00000000
    # ClampAddSubtractHalf: ave + trunc((ave - TL)/2), clamped
    # ave(200,100)=150, TL=0 → 150 + 75 = 225
    assert _clamp_add_half(200 << 8, 100 << 8, 0) == 225 << 8
    # negative C-truncation: ave=10, TL=13 → 10 + trunc(-3/2)= 10-1 = 9
    assert _clamp_add_half(10 << 8, 10 << 8, 13 << 8) == 9 << 8
    # ColorTransformDelta: signed 3.5 fixed point, arithmetic shift
    assert _ct_delta(0, 100) == 0
    assert _ct_delta(64, 64) == 128  # 64*64 >> 5
    assert _ct_delta(255, 2) == ((-1) * 2) >> 5  # == -1 (floor shift)
    assert _ct_delta(128, 4) == ((-128) * 4) >> 5  # == -16


def test_roundtrip_all_predictor_modes_and_transform_combos():
    rng = random.Random(7)
    for w, h in [(1, 1), (4, 3), (13, 11)]:
        rgba = bytes(rng.randrange(256) for _ in range(w * h * 4))
        for kwargs in (
            [{}, {"subtract_green": True}]
            + [{"predictor_mode": m} for m in range(14)]
            + [{"subtract_green": True, "predictor_mode": 12}]
        ):
            data = encode_webp_lossless(w, h, rgba, **kwargs)
            assert decode_webp(data) == (w, h, 4, rgba), kwargs


def test_roundtrip_palette_packing_widths():
    rng = random.Random(3)
    for n_colors, w, h in [(2, 9, 4), (3, 7, 3), (4, 8, 2), (16, 10, 5), (250, 30, 9)]:
        colors = [bytes(rng.randrange(256) for _ in range(4)) for _ in range(n_colors)]
        # force every color to appear so the palette is exactly n_colors
        idx = list(range(n_colors)) + [
            rng.randrange(n_colors) for _ in range(w * h - n_colors)
        ]
        rng.shuffle(idx)
        rgba = b"".join(colors[i] for i in idx)
        data = encode_webp_lossless(w, h, rgba, palette=True)
        assert decode_webp(data) == (w, h, 4, rgba), n_colors


def test_lossy_vp8_decodes_through_container():
    """The r14 lossy lane: a genuine "VP8 " still decodes through the
    container walk via functions/vp8.py (exact flat fixture; gray 100 maps
    to BT.601 studio-swing RGB 98)."""
    from edgy_spark.functions.webp import encode_webp_lossy_flat

    data = encode_webp_lossy_flat(1, 1, [100])
    w, h, ch, px = decode_webp(data)
    assert (w, h, ch) == (16, 16, 4)
    assert set(px[0::4]) == {98} and set(px[3::4]) == {255}


def test_malformed_animation_containers_raise_value_error():
    # an ANIM with no VP8X canvas, and a VP8X announcing animation with
    # no ANIM/ANMF chunks behind it — both container inconsistencies
    for tag, payload in [
        (b"ANIM", b"\x00" * 6),
        (b"VP8X", bytes([0x02]) + b"\x00" * 9),  # animation flag, no frames
    ]:
        chunk = tag + struct.pack("<I", len(payload)) + payload
        body = b"WEBP" + chunk
        data = b"RIFF" + struct.pack("<I", len(body)) + body
        with pytest.raises(ValueError):
            decode_webp(data)


def test_standalone_alph_raises_honest_not_implemented():
    chunk = b"ALPH" + struct.pack("<I", 2) + b"\x00\x00"
    body = b"WEBP" + chunk
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError, match="ALPH"):
        decode_webp(data)


def test_vp8x_then_vp8l_and_odd_chunk_padding():
    """A VP8X header (no animation) and an odd-sized metadata chunk before
    the VP8L frame — the walk must skip both (with even padding)."""
    inner = encode_webp_lossless(2, 2, bytes(range(16)))
    vp8l_chunk = inner[12:]  # VP8L chunk incl. header (+pad if any)
    vp8x = b"VP8X" + struct.pack("<I", 10) + bytes([0x00]) * 4 + b"\x01\x00\x00\x01\x00\x00"
    meta = b"XMP " + struct.pack("<I", 3) + b"abc\x00"  # odd size + pad
    body = b"WEBP" + vp8x + meta + vp8l_chunk
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    assert decode_webp(data) == (2, 2, 4, bytes(range(16)))


def test_dimension_cap_before_allocation():
    bw = _BW()
    _header(bw, 1 << 14, 1 << 14)  # 268M pixels > MAX_PIXELS
    with pytest.raises(ValueError, match="too large"):
        decode_webp(_riff(bw.bytes()))
    assert (1 << 14) * (1 << 14) > MAX_PIXELS


def test_malformed_inputs_normalize_to_value_error():
    base = encode_webp_lossless(6, 5, bytes((i * 37) % 256 for i in range(120)))
    rng = random.Random(11)
    # (cutting ONLY the final byte can still decode — it may hold nothing
    # but bit padding — so the deepest cut is mid-payload, not len-1)
    for cut in (0, 4, 11, 13, 20, len(base) // 2):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_webp(base[:cut])
    flips = 0
    for _ in range(120):
        pos = rng.randrange(12, len(base))
        mutated = bytearray(base)
        mutated[pos] ^= 1 << rng.randrange(8)
        try:
            decode_webp(bytes(mutated))
        except (ValueError, NotImplementedError):
            flips += 1
        # any non-(ValueError|NotImplementedError) escapes and fails the test
    assert flips > 0  # most single-bit flips must be caught, none escape


def test_not_a_webp_raises():
    with pytest.raises(ValueError):
        decode_webp(b"")
    with pytest.raises(ValueError):
        decode_webp(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        decode_webp(b"\x89PNG\r\n\x1a\n" + b"\x00" * 20)


def test_chunk_overrunning_declared_riff_size_rejected():
    """A chunk whose size runs past the DECLARED RIFF size (but still
    inside the buffer) is a container inconsistency, not decodable data
    (review r13 ADVICE)."""
    inner = encode_webp_lossless(2, 2, bytes(range(16)))
    vp8l_chunk = inner[12:]
    body = b"WEBP" + vp8l_chunk
    # declare the RIFF 5 bytes SHORTER than the real body, then append
    # padding so the chunk still fits in the buffer
    data = b"RIFF" + struct.pack("<I", len(body) - 5) + body + b"\x00" * 16
    with pytest.raises(ValueError, match="truncated chunk|no image chunk"):
        decode_webp(data)


# ---------------------------------------------------------------------------
# Animated WebP (r14): ANIM/ANMF walk, composition, time sampling
# ---------------------------------------------------------------------------


def _anim_fixture():
    from edgy_spark.functions.webp import encode_webp_anim

    c0 = bytes((10, 10, 10, 255)) * 16
    f1 = bytes(
        b
        for i in range(8)
        for b in ((0, 0, 0, 0) if i % 2 == 0 else (200, 200, 200, 255))
    )
    f2 = bytes((99, 99, 99, 255)) * 8
    return encode_webp_anim(
        4, 4,
        [
            {"x": 0, "y": 0, "w": 4, "h": 4, "rgba": c0, "blend": False,
             "duration_ms": 50},
            {"x": 0, "y": 0, "w": 2, "h": 4, "rgba": f1, "blend": True,
             "dispose_bg": True, "duration_ms": 5},
            {"x": 2, "y": 0, "w": 2, "h": 4, "rgba": f2, "blend": False,
             "duration_ms": 40},
        ],
        bg_rgba=(7, 7, 7, 255),
    )


def test_anim_composition_offsets_blend_dispose():
    from edgy_spark.functions.webp import iter_webp_frames_composed

    frames = list(iter_webp_frames_composed(_anim_fixture()))
    assert len(frames) == 3
    reds = [[px[4 * k] for k in range(16)] for (_w, _h, _c, px) in frames]
    # frame 0: full replace
    assert reds[0] == [10] * 16
    # frame 1: transparent even columns show frame 0 through the blend
    assert reds[1] == [10, 200, 10, 10] * 4
    # frame 2: frame 1's rect disposed to background 7, right half 99
    assert reds[2] == [7, 7, 99, 99] * 4
    # every composed canvas is fully opaque after the full-cover frame 0
    assert all(set(px[3::4]) == {255} for (_w, _h, _c, px) in frames)


def test_anim_time_sampling_windows_and_clamp():
    from edgy_spark.functions.webp import (
        iter_time_sampled_composed_webp_frames,
    )

    # durations 50 / 5 (clamped to 100) / 40: windows [0,50), [50,150),
    # [150, inf) — ticks every 30 ms
    got = [
        (k, t, fi)
        for k, t, fi, _frame in iter_time_sampled_composed_webp_frames(
            _anim_fixture(), every_ms=30
        )
    ]
    assert got == [
        (0, 0, 0), (1, 30, 0),
        (2, 60, 1), (3, 90, 1), (4, 120, 1),
        (5, 150, 2),
    ]


def test_anim_max_samples_stops_decoding():
    from edgy_spark.functions.webp import (
        iter_time_sampled_composed_webp_frames,
    )

    # corrupt the LAST frame's chunk: sampling only the head must succeed
    data = bytearray(_anim_fixture())
    data[-10] ^= 0xFF
    head = [
        s[:3]
        for s in iter_time_sampled_composed_webp_frames(
            bytes(data), every_ms=30, max_samples=2
        )
    ]
    assert head == [(0, 0, 0), (1, 30, 0)]


def test_anim_still_api_returns_first_composed_frame():
    w, h, ch, px = decode_webp(_anim_fixture())
    assert (w, h, ch) == (4, 4, 4)
    assert set(px[0::4]) == {10}


def test_anim_lossy_vp8_frames_compose():
    from edgy_spark.functions.vp8 import encode_vp8_flat
    from edgy_spark.functions.webp import iter_webp_frames_composed

    # hand-wrap a lossy VP8 payload in an ANMF chunk
    payload = encode_vp8_flat(1, 1, [100])
    sub = b"VP8 " + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        sub += b"\x00"
    anmf_payload = (
        b"\x00\x00\x00" * 2            # x, y
        + bytes((15, 0, 0))            # w - 1
        + bytes((15, 0, 0))            # h - 1
        + b"\x64\x00\x00"              # 100 ms
        + bytes([0x02])                # no blend
        + sub
    )
    anmf = b"ANMF" + struct.pack("<I", len(anmf_payload)) + anmf_payload
    if len(anmf_payload) & 1:
        anmf += b"\x00"
    vp8x = b"VP8X" + struct.pack("<I", 10) + bytes([0x02]) + b"\x00" * 3 \
        + bytes((15, 0, 0)) + bytes((15, 0, 0))
    anim = b"ANIM" + struct.pack("<I", 6) + b"\x00" * 6
    body = b"WEBP" + vp8x + anim + anmf
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    frames = list(iter_webp_frames_composed(data))
    assert len(frames) == 1
    w, h, ch, px = frames[0]
    assert (w, h) == (16, 16)
    assert set(px[0::4]) == {98}  # BT.601 gray 100 -> RGB 98


def test_anim_container_validation():
    from edgy_spark.functions.webp import (
        encode_webp_anim,
        iter_webp_frames_composed,
    )

    rgba = bytes((1, 1, 1, 255)) * 4
    with pytest.raises(ValueError, match="even"):
        encode_webp_anim(8, 8, [{"x": 1, "y": 0, "w": 2, "h": 2, "rgba": rgba}])
    with pytest.raises(ValueError, match="outside"):
        encode_webp_anim(2, 2, [{"x": 0, "y": 0, "w": 4, "h": 1, "rgba": rgba}])
    with pytest.raises(ValueError, match="at least one"):
        encode_webp_anim(2, 2, [])
    good = encode_webp_anim(2, 2, [{"x": 0, "y": 0, "w": 2, "h": 2, "rgba": rgba}])
    # truncations raise ValueError, never crash
    for cut in range(12, len(good)):
        try:
            list(iter_webp_frames_composed(good[:cut]))
        except (ValueError, NotImplementedError):
            pass


def test_anim_alph_subchunk_is_honest():
    from edgy_spark.functions.webp import iter_webp_frames_composed

    alph_sub = b"ALPH" + struct.pack("<I", 2) + b"\x00\x00"
    anmf_payload = (
        b"\x00\x00\x00" * 2 + bytes((1, 0, 0)) + bytes((1, 0, 0))
        + b"\x64\x00\x00" + bytes([0x02]) + alph_sub
    )
    anmf = b"ANMF" + struct.pack("<I", len(anmf_payload)) + anmf_payload
    vp8x = b"VP8X" + struct.pack("<I", 10) + bytes([0x02]) + b"\x00" * 3 \
        + bytes((1, 0, 0)) + bytes((1, 0, 0))
    anim = b"ANIM" + struct.pack("<I", 6) + b"\x00" * 6
    body = b"WEBP" + vp8x + anim + anmf
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError, match="ALPH"):
        list(iter_webp_frames_composed(data))
