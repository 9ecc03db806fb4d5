"""From-spec lossy VP8 (RFC 6386) key-frame codec tests.

No external VP8 decoder exists in this container (no libwebp/PIL, and
javax.imageio has no WebP plugin), so conformance is anchored the same
way the VP8L lane's is:

1. ARITHMETIC PINS of the integer transforms against values computed by
   hand from the spec formulas (lone-DC inverse WHT == (x+3)>>3
   everywhere, lone-DC inverse DCT == (d+4)>>3 everywhere, plus a
   non-trivial two-coefficient vector worked through the §14.3
   butterflies).
2. BOOLEAN CODER round-trip property: arbitrary (prob, bit) sequences
   encode+decode identically — the encoder's carry propagation and the
   decoder's renormalization are mutually pinned.
3. EXACT RECONSTRUCTION sweep: flat-macroblock frames across all five
   intra modes (DC/V/H/TM 16x16 and B_PRED with context-coded
   B_DC/B_TM submodes) decode to the target luma bit-exactly at every
   size/mode mix — any slip anywhere in header parse, mode trees, token
   trees, contexts, dequant, prediction, or transforms breaks it.
4. CRAWL ROBUSTNESS: every truncation/corruption of a valid stream
   either raises ValueError or decodes (the §7.3 over-read convention
   pads with zero bytes — bounded, never a crash).
"""

from __future__ import annotations

import random

import pytest

from edgy_spark.functions import vp8
from edgy_spark.functions.webp import (
    decode_webp,
    decode_webp_planes,
    encode_webp_lossy_flat,
)


# ---------------------------------------------------------------------------
# 1. transform arithmetic pins
# ---------------------------------------------------------------------------


def test_inverse_wht_lone_dc_is_uniform():
    for x in (0, 8, 64, 641, -64, -640, 2040 * 8):
        block = [x] + [0] * 15
        out = vp8.inverse_wht4x4(block)
        assert out == [(x + 3) >> 3] * 16


def test_inverse_dct_lone_dc_is_uniform():
    for d in (0, 8, -8, 80, -2040, 2040):
        block = [d] + [0] * 15
        out = vp8.inverse_dct4x4(block)
        assert out == [(d + 4) >> 3] * 16


def test_inverse_dct_two_coeff_hand_vector():
    # DC=32, first vertical AC=16 (natural position 4): per §14.3 the
    # column pass gives a1=b1=32, c1=floor(16*35468/2^16)=8,
    # d1=16+floor(16*20091/2^16)=20, so column 0 becomes
    # [52, 40, 24, 12]; the row pass on [v,0,0,0] yields (v+4)>>3 in all
    # four row positions.
    block = [0] * 16
    block[0] = 32
    block[4] = 16
    out = vp8.inverse_dct4x4(block)
    expect_rows = [(52 + 4) >> 3, (40 + 4) >> 3, (24 + 4) >> 3, (12 + 4) >> 3]
    for j in range(4):
        assert out[4 * j : 4 * j + 4] == [expect_rows[j]] * 4


def test_dequant_tables_shape():
    assert len(vp8.DC_QLOOKUP) == 128 and len(vp8.AC_QLOOKUP) == 128
    assert vp8.DC_QLOOKUP[0] == 4  # the exact-flat encoder's contract
    assert all(1 <= q <= 300 for q in vp8.DC_QLOOKUP + vp8.AC_QLOOKUP)
    # monotone non-decreasing (spec property; a transposed digit breaks it)
    assert all(
        a <= b for a, b in zip(vp8.DC_QLOOKUP, vp8.DC_QLOOKUP[1:])
    )
    assert all(
        a <= b for a, b in zip(vp8.AC_QLOOKUP, vp8.AC_QLOOKUP[1:])
    )


def test_coef_prob_tables_are_valid_probabilities():
    for table in (vp8.DEFAULT_COEF_PROBS, vp8.COEF_UPDATE_PROBS):
        assert len(table) == 4
        for btype in table:
            assert len(btype) == 8
            for band in btype:
                assert len(band) == 3
                for ctx in band:
                    assert len(ctx) == 11
                    assert all(1 <= p <= 255 for p in ctx)
    for above in vp8.KF_BMODE_PROBS:
        assert len(above) == 10
        for left in above:
            assert len(left) == 9
            assert all(1 <= p <= 255 for p in left)


# ---------------------------------------------------------------------------
# 2. boolean coder round-trip property
# ---------------------------------------------------------------------------


def test_bool_coder_roundtrip_property():
    rng = random.Random(14)
    for trial in range(25):
        n = rng.randint(1, 400)
        seq = [(rng.randint(1, 254), rng.randint(0, 1)) for _ in range(n)]
        be = vp8.BoolEncoder()
        for prob, bit in seq:
            be.write_bool(prob, bit)
        data = be.done()
        bd = vp8.BoolDecoder(data)
        for prob, bit in seq:
            assert bd.read_bool(prob) == bit, f"trial {trial}"


def test_bool_coder_literal_roundtrip():
    be = vp8.BoolEncoder()
    vals = [(0x2A, 7), (0, 1), (1, 1), (0x3FFF, 14), (5, 3)]
    for v, n in vals:
        be.write_literal(v, n)
    bd = vp8.BoolDecoder(be.done())
    for v, n in vals:
        assert bd.read_literal(n) == v


def test_tree_roundtrip_all_modes():
    for tree, probs, values in (
        (vp8.KF_YMODE_TREE, vp8.KF_YMODE_PROB, range(5)),
        (vp8.UV_MODE_TREE, vp8.KF_UV_MODE_PROB, range(4)),
        (vp8.BMODE_TREE, vp8.KF_BMODE_PROBS[0][0], range(10)),
    ):
        for v in values:
            be = vp8.BoolEncoder()
            be.write_tree(tree, probs, v)
            bd = vp8.BoolDecoder(be.done())
            assert bd.read_tree(tree, probs) == v


def test_token_block_roundtrip_all_categories():
    # one level per magnitude class: 1..4 direct, then one per category,
    # incl. the 2040 the exact-flat encoder needs (8 * 255)
    rng = random.Random(7)
    for mag in (1, 2, 3, 4, 5, 6, 7, 10, 11, 18, 19, 34, 35, 66, 67, 500, 2040, 2114):
        for sign in (1, -1):
            levels = [sign * mag, 0, 3]  # exercise zero-run + trailing
            be = vp8.BoolEncoder()
            vp8.encode_block_coeffs(
                be, vp8.DEFAULT_COEF_PROBS[1], 0, rng.randint(0, 2) * 0, levels
            )
            bd = vp8.BoolDecoder(be.done())
            coeffs, eob = vp8.decode_block_coeffs(
                bd, vp8.DEFAULT_COEF_PROBS[1], 0, 0, 1, 1
            )
            assert eob == 3
            assert coeffs[vp8.ZIGZAG[0]] == sign * mag
            assert coeffs[vp8.ZIGZAG[1]] == 0
            assert coeffs[vp8.ZIGZAG[2]] == 3


# ---------------------------------------------------------------------------
# 3. exact reconstruction sweeps
# ---------------------------------------------------------------------------


def _assert_exact(mb_w: int, mb_h: int, lumas: list[int], modes: list[int]):
    payload = vp8.encode_vp8_flat(mb_w, mb_h, lumas, modes=modes)
    w, h, y, u, v = vp8.decode_vp8(payload)
    assert (w, h) == (mb_w * 16, mb_h * 16)
    for mb, target in enumerate(lumas):
        mr, mc = mb // mb_w, mb % mb_w
        vals = {
            y[(mr * 16 + j) * w + mc * 16 + i]
            for j in range(16)
            for i in range(16)
        }
        assert vals == {target}, f"mb {mb} mode {modes[mb]}"
    assert set(u) == {128} and set(v) == {128}


def test_exact_reconstruction_each_mode_alone():
    for mode in (vp8.DC_PRED, vp8.V_PRED, vp8.H_PRED, vp8.TM_PRED, vp8.B_PRED):
        lumas = [7, 254, 128, 33, 99, 180]
        _assert_exact(3, 2, lumas, [mode] * 6)


def test_exact_reconstruction_mode_mix_sweep():
    rng = random.Random(29)
    for _ in range(12):
        mw, mh = rng.randint(1, 4), rng.randint(1, 4)
        n = mw * mh
        lumas = [rng.randrange(256) for _ in range(n)]
        modes = [rng.randrange(5) for _ in range(n)]
        _assert_exact(mw, mh, lumas, modes)


def test_exact_reconstruction_extreme_values():
    # residuals at the token-category ceiling: |8r| == 2040 (category 6)
    _assert_exact(2, 1, [0, 255], [vp8.DC_PRED, vp8.DC_PRED])
    _assert_exact(2, 1, [255, 0], [vp8.B_PRED, vp8.B_PRED])


def test_webp_container_roundtrip_and_rgba_path():
    data = encode_webp_lossy_flat(2, 1, [50, 250], modes=[0, 4])
    w, h, y, u, v = decode_webp_planes(data)
    assert (w, h) == (32, 16)
    assert set(y[:16]) == {50} and set(y[16:32]) == {250}
    # the RGBA presentation path: gray 50 -> BT.601 studio-swing 40
    w2, h2, ch, px = decode_webp(data)
    assert (w2, h2, ch) == (32, 16, 4)
    assert px[0:3] == bytes((40, 40, 40))
    assert px[3] == 255


def test_loop_filter_smoke_normal_and_simple():
    # a 16-step MB edge sits inside the level-32 edge limit
    # ((32+2)*2 + 32 = 100 >= 16*2 + 8), so the deblocker pulls the edge
    # pixels toward each other; a 255-step edge is OUTSIDE the mask and
    # must be preserved (the filter protects real edges).  §15 arithmetic
    # for the normal filter at this edge: w = clamp(-16 + 3*16) = 32,
    # a = (27*32 + 63) >> 7 = 7 -> 107/109; the simple filter's
    # common_adjust gives f1 = f2 = 4 -> 104/112.
    for ftype, expect in ((0, (107, 109)), (1, (104, 112))):
        payload = vp8.encode_vp8_flat(
            2, 1, [100, 116], filter_level=32, filter_type=ftype
        )
        w, h, y, u, v = vp8.decode_vp8(payload)
        assert y[8 * w + 2] == 100  # deep interior untouched
        assert (y[8 * w + 15], y[8 * w + 16]) == expect
    # hard 255-step edge: mask fails, edge preserved even at high level
    payload = vp8.encode_vp8_flat(2, 1, [0, 255], filter_level=32)
    w, h, y, _u, _v = vp8.decode_vp8(payload)
    assert y[8 * w + 15] == 0 and y[8 * w + 16] == 255
    # and level 0 is a strict no-op
    payload = vp8.encode_vp8_flat(2, 1, [100, 116])
    w, h, y, _u, _v = vp8.decode_vp8(payload)
    assert y[8 * w + 15] == 100 and y[8 * w + 16] == 116


# ---------------------------------------------------------------------------
# 4. crawl robustness
# ---------------------------------------------------------------------------


def test_truncation_never_crashes():
    payload = vp8.encode_vp8_flat(2, 2, [1, 2, 3, 4], modes=[0, 4, 2, 3])
    for k in range(len(payload)):
        try:
            vp8.decode_vp8(payload[:k])
        except ValueError:
            pass  # the expected loud path


def test_corruption_never_crashes():
    rng = random.Random(99)
    payload = bytearray(vp8.encode_vp8_flat(2, 1, [10, 200], modes=[4, 0]))
    for _ in range(120):
        i = rng.randrange(len(payload))
        orig = payload[i]
        payload[i] = rng.randrange(256)
        try:
            vp8.decode_vp8(bytes(payload))
        except ValueError:
            pass
        payload[i] = orig


def test_rejects_non_keyframe_and_bad_magic():
    payload = bytearray(vp8.encode_vp8_flat(1, 1, [100]))
    bad = bytearray(payload)
    bad[0] |= 1  # inter-frame bit
    with pytest.raises(ValueError, match="inter frame"):
        vp8.decode_vp8(bytes(bad))
    bad = bytearray(payload)
    bad[3] = 0x00  # start code
    with pytest.raises(ValueError, match="start code"):
        vp8.decode_vp8(bytes(bad))


def test_encoder_validates_inputs():
    with pytest.raises(ValueError):
        vp8.encode_vp8_flat(1, 1, [256])
    with pytest.raises(ValueError):
        vp8.encode_vp8_flat(2, 1, [1])
    with pytest.raises(ValueError):
        vp8.encode_vp8_flat(1, 1, [1], q_index=3)
    with pytest.raises(ValueError):
        vp8.encode_vp8_flat(1, 1, [1], modes=[9])
    with pytest.raises(ValueError):
        vp8.encode_vp8_flat(1, 1, [1], filter_level=64)


def test_planes_decoder_rejects_lossless():
    from edgy_spark.functions.webp import encode_webp_lossless

    rgba = bytes(range(4)) * 4
    data = encode_webp_lossless(2, 2, rgba)
    with pytest.raises(ValueError, match="no YUV planes"):
        decode_webp_planes(data)


# ---------------------------------------------------------------------------
# r14 second wave: decoder paths real encoders use — token partitions,
# mb_no_coeff_skip, segmentation map
# ---------------------------------------------------------------------------


def test_multiple_token_partitions_roundtrip():
    lumas = [(i * 53) % 256 for i in range(16)]
    modes = [i % 5 for i in range(16)]
    base = vp8.decode_vp8(vp8.encode_vp8_flat(4, 4, lumas, modes=modes))
    for n in (2, 4, 8):
        payload = vp8.encode_vp8_flat(
            4, 4, lumas, modes=modes, token_partitions=n
        )
        assert vp8.decode_vp8(payload) == base, n
        # the size table really is 3 bytes per partition except the last
        first_part = payload[0] | (payload[1] << 8) | (payload[2] << 16)
        assert len(payload) > 10 + (first_part >> 5) + 3 * (n - 1)


def test_mb_skip_flags_roundtrip_and_shrink():
    # all-equal lumas in DC mode: every MB after the first predicts
    # exactly and codes as a skip — the stream must shrink and still
    # reconstruct bit-identically
    lumas = [100] * 12
    plain = vp8.encode_vp8_flat(4, 3, lumas)
    skippy = vp8.encode_vp8_flat(4, 3, lumas, mb_skip=True)
    assert vp8.decode_vp8(plain) == vp8.decode_vp8(skippy)
    assert len(skippy) < len(plain)
    w = 64
    y = vp8.decode_vp8(skippy)[2]
    assert set(y) == {100}
    # and skip interacts correctly with B_PRED rows (no Y2 context reset)
    modes = [vp8.B_PRED if i % 3 == 0 else vp8.DC_PRED for i in range(12)]
    a = vp8.decode_vp8(vp8.encode_vp8_flat(4, 3, lumas, modes=modes))
    b = vp8.decode_vp8(
        vp8.encode_vp8_flat(4, 3, lumas, modes=modes, mb_skip=True)
    )
    assert a == b


def test_segmentation_map_roundtrip():
    lumas = [(i * 37 + 5) % 256 for i in range(9)]
    segs = [i % 4 for i in range(9)]
    base = vp8.decode_vp8(vp8.encode_vp8_flat(3, 3, lumas))
    seg = vp8.decode_vp8(vp8.encode_vp8_flat(3, 3, lumas, segments=segs))
    # zero per-segment deltas: identical reconstruction, map path executed
    assert base == seg


def test_all_knobs_combined_exact():
    import random as _random

    rng = _random.Random(77)
    lumas = [rng.choice([7, 7, 200, 133]) for _ in range(20)]
    modes = [rng.randrange(5) for _ in range(20)]
    payload = vp8.encode_vp8_flat(
        5, 4, lumas, modes=modes, token_partitions=4, mb_skip=True,
        segments=[i % 4 for i in range(20)],
    )
    w, h, y, u, v = vp8.decode_vp8(payload)
    for mb in range(20):
        mr, mc = mb // 5, mb % 5
        vals = {
            y[(mr * 16 + j) * w + mc * 16 + i]
            for j in range(16)
            for i in range(16)
        }
        assert vals == {lumas[mb]}, mb


# ---------------------------------------------------------------------------
# 5. general (AC-coefficient) reconstruction pin — the r14 fast-path split
# ---------------------------------------------------------------------------


def test_general_ac_reconstruction_hand_frame():
    """Hand-written one-macroblock key frame whose luma blocks carry an AC
    coefficient and whose U blocks are lone-DC: pins the r14 reconstruction
    split (DC-only shortcut vs full inverse DCT, row-slice writes) against
    a naive pred + transform reference built from the public §14 functions.
    encode_vp8_flat can only emit DC-only blocks, so this is the one frame
    in the suite that drives the general branch end-to-end."""
    import struct as _struct

    probs = vp8.DEFAULT_COEF_PROBS
    # --- header (mirrors encode_vp8_flat: q_index 0, no filter, 1 part) ---
    be = vp8.BoolEncoder()
    be.write_literal(0, 1)          # color space
    be.write_literal(0, 1)          # clamping
    be.write_bool(128, 0)           # segmentation disabled
    be.write_literal(0, 1)          # filter type
    be.write_literal(0, 6)          # filter level 0
    be.write_literal(0, 3)          # sharpness
    be.write_bool(128, 0)           # lf delta disabled
    be.write_literal(0, 2)          # 1 token partition
    be.write_literal(0, 7)          # q_index 0
    for _ in range(5):              # quantizer deltas absent
        be.write_bool(128, 0)
    be.write_bool(128, 1)           # refresh entropy probs
    for t in range(4):              # no coef prob updates
        for b in range(8):
            for c in range(3):
                for pi in range(11):
                    be.write_bool(vp8.COEF_UPDATE_PROBS[t][b][c][pi], 0)
    be.write_bool(128, 0)           # mb_no_coeff_skip off
    # --- mode record: one MB, DC_PRED luma + DC_PRED chroma ---
    be.write_tree(vp8.KF_YMODE_TREE, vp8.KF_YMODE_PROB, vp8.DC_PRED)
    be.write_tree(vp8.UV_MODE_TREE, vp8.KF_UV_MODE_PROB, vp8.DC_PRED)
    part1 = be.done()

    # --- tokens: Y2 lone DC, Y blocks with an AC coeff (zero then nonzero
    # token — general branch), U lone DC (fast path with nonzero residual),
    # V blocks zero+AC (general branch at chroma geometry) ---
    te = vp8.BoolEncoder()
    nz = vp8.encode_block_coeffs(te, probs[1], 0, 0, [6])      # Y2: level 6
    assert nz == 1
    above_y, left_y = [0] * 4, [0] * 4
    for sb in range(16):
        sr, sc = sb // 4, sb % 4
        ctx = above_y[sc] + left_y[sr]
        nz = vp8.encode_block_coeffs(te, probs[0], 1, ctx, [0, 7])
        above_y[sc] = left_y[sr] = nz
    for levels in ([5], [0, 3]):   # U then V
        a_ctx, l_ctx = [0] * 2, [0] * 2
        for sb in range(4):
            sr, sc = sb // 2, sb % 2
            ctx = a_ctx[sc] + l_ctx[sr]
            nz = vp8.encode_block_coeffs(te, probs[2], 0, ctx, levels)
            a_ctx[sc] = l_ctx[sr] = nz
    tokens = te.done()

    tag = (len(part1) << 5) | (1 << 4) | 0
    payload = (
        bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
        + b"\x9d\x01\x2a"
        + _struct.pack("<HH", 16, 16)
        + part1
        + tokens
    )
    w, h, y, u, v = vp8.decode_vp8(payload)
    assert (w, h) == (16, 16)

    # --- naive reference: pred 128 everywhere (no neighbors), Y2 WHT DC
    # distribution, per-block inverse DCT, arithmetic clamp ---
    def clamp(x):
        return 0 if x < 0 else (255 if x > 255 else x)

    # q_index 0 factors: y1ac=4, y2dc=8, uvdc=4, uvac=4 (RFC tables)
    y2_out = vp8.inverse_wht4x4([6 * 8] + [0] * 15)
    exp_y = [[0] * 16 for _ in range(16)]
    for sb in range(16):
        sr, sc = sb // 4, sb % 4
        block = [0] * 16
        block[0] = y2_out[sb]
        # levels [0, 7] at scan positions 1, 2 -> natural ZIGZAG[2] = 4
        block[vp8.ZIGZAG[2]] = 7 * 4
        res = vp8.inverse_dct4x4(block)
        for j in range(4):
            for i in range(4):
                exp_y[sr * 4 + j][sc * 4 + i] = clamp(128 + res[4 * j + i])
    for j in range(16):
        got = list(y[j * 16 : (j + 1) * 16])
        assert got == exp_y[j], f"luma row {j}"

    res_u = vp8.inverse_dct4x4([5 * 4] + [0] * 15)
    assert set(res_u) == {(20 + 4) >> 3}
    assert set(u) == {clamp(128 + res_u[0])}

    block_v = [0] * 16
    block_v[vp8.ZIGZAG[1]] = 3 * 4
    res_v = vp8.inverse_dct4x4(block_v)
    exp_v = [[0] * 8 for _ in range(8)]
    for sb in range(4):
        sr, sc = sb // 2, sb % 2
        for j in range(4):
            for i in range(4):
                exp_v[sr * 4 + j][sc * 4 + i] = clamp(128 + res_v[4 * j + i])
    for j in range(8):
        got = list(v[j * 8 : (j + 1) * 8])
        assert got == exp_v[j], f"V row {j}"
