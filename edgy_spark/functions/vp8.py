"""From-spec lossy VP8 (WebP "VP8 " chunk) key-frame decoder + a minimal
DC-only intra encoder, pure stdlib — RFC 6386 (intra-frame coding only;
inter frames cannot occur in a still WebP, `webp.py` rejects them).

Decoder surface
---------------
``decode_vp8(payload) -> (width, height, y, u, v)`` — full key-frame
decode: boolean arithmetic decoder (§7), frame header incl. segmentation
and loop-filter deltas (§9), intra modes for 16x16 / chroma / all ten
B_PRED subblock modes (§11-12), token-tree residual decode with the
band/context probability model (§13), dequantization (§14.1), the exact
integer inverse WHT and DCT (§14.2-14.3), and both the simple and normal
in-loop deblocking filters (§15).  Output planes are the cropped Y
(width*height bytes) and 4:2:0 U/V.

Encoder surface
---------------
``encode_vp8_flat(mb_w, mb_h, lumas, q_index=0) -> payload`` — a genuine
VP8 key-frame bitstream of flat 16x16 macroblocks: every MB is coded
DC_PRED (16x16) with a single Y2 DC coefficient chosen so the integer
transforms reconstruct the target EXACTLY.  With q_index=0 the Y2 DC
dequant factor is 8, the inverse WHT of a lone DC x yields (x+3)>>3 in
all 16 subblock positions, and the inverse DCT of a lone DC d yields
(d+4)>>3 in all 16 pixels — so level 8*r dequantizes to 64*r and
round-trips to residual r for ANY integer r in [-255, 255].  That is the
same bit-exactness device the baseline-JPEG gate uses (DC-only blocks,
`jpeg.py`), and it makes a lossy codec oracle-predictable: decoded
MB luma == target luma, per pixel.  Chroma is coded all-zero (target
128 == prediction everywhere).  loop_filter_level is 0, so the deblocker
is a no-op on fixture streams and exactness survives end-to-end.

Conformance honesty
-------------------
The fixed probability tables (default coefficient probs, their update
probs, and the key-frame B-mode probs) are transcribed from the RFC 6386
text.  Encoder and decoder SHARE the tables, so a transcription slip
cannot break this module's round-trip (which is what the driver gate and
the test suite pin); it would only desynchronize against third-party
encoders.  No external VP8 vectors or decoders exist in this container
(no libwebp/PIL), so cross-implementation conformance is anchored the
same way the VP8L lane's is: spec-derived structure + round-trip + the
javax-style independent checks where a JVM decoder exists (none ships
for VP8).

Reference parity: cdsmith/edgy has no media pipeline; this is part of
the training-data surface (SURVEY.md §2 multimodal lane).
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# §14.1 dequantization lookup tables
# ---------------------------------------------------------------------------

DC_QLOOKUP = [
    4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17,
    18, 19, 20, 20, 21, 21, 22, 22, 23, 23, 24, 25, 25, 26, 27, 28,
    29, 30, 31, 32, 33, 34, 35, 36, 37, 37, 38, 39, 40, 41, 42, 43,
    44, 45, 46, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
    59, 60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74,
    75, 76, 76, 77, 78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89,
    91, 93, 95, 96, 98, 100, 101, 102, 104, 106, 108, 110, 112, 114, 116, 118,
    122, 124, 126, 128, 130, 132, 134, 136, 138, 140, 143, 145, 148, 151, 154, 157,
]

AC_QLOOKUP = [
    4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
    20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35,
    36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51,
    52, 53, 54, 55, 56, 57, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76,
    78, 80, 82, 84, 86, 88, 90, 92, 94, 96, 98, 100, 102, 104, 106, 108,
    110, 112, 114, 116, 119, 122, 125, 128, 131, 134, 137, 140, 143, 146, 149, 152,
    155, 158, 161, 164, 167, 170, 173, 177, 181, 185, 189, 193, 197, 201, 205, 209,
    213, 217, 221, 225, 229, 234, 239, 245, 249, 254, 259, 264, 269, 274, 279, 284,
]

# §13.3 scan order and coefficient bands
ZIGZAG = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]
COEFF_BANDS = [0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7]

# §13.2 token values: categories code (base, n_extra_bits); extra bits are
# decoded MSB-first, each with its own probability.
CAT_BASE = [5, 7, 11, 19, 35, 67]
CAT_PROBS = [
    [159],
    [165, 145],
    [173, 148, 140],
    [176, 155, 140, 135],
    [180, 157, 141, 134, 130],
    [254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129],
]

# ---------------------------------------------------------------------------
# §13.5 default token probabilities, [block_type][band][context][11]
# block types: 0 = Y after Y2 (first coeff 1), 1 = Y2, 2 = chroma,
# 3 = Y without Y2 (B_PRED macroblocks).
# ---------------------------------------------------------------------------

DEFAULT_COEF_PROBS = [
    [  # block type 0
        [[253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128],
         [189, 129, 242, 255, 227, 213, 255, 219, 128, 128, 128],
         [106, 126, 227, 252, 214, 209, 255, 255, 128, 128, 128]],
        [[1, 98, 248, 255, 236, 226, 255, 255, 128, 128, 128],
         [181, 133, 238, 254, 221, 234, 255, 154, 128, 128, 128],
         [78, 134, 202, 247, 198, 180, 255, 219, 128, 128, 128]],
        [[1, 185, 249, 255, 243, 255, 128, 128, 128, 128, 128],
         [184, 150, 247, 255, 236, 224, 128, 128, 128, 128, 128],
         [77, 110, 216, 255, 236, 230, 128, 128, 128, 128, 128]],
        [[1, 101, 251, 255, 241, 255, 128, 128, 128, 128, 128],
         [170, 139, 241, 252, 236, 209, 255, 255, 128, 128, 128],
         [37, 116, 196, 243, 228, 255, 255, 255, 128, 128, 128]],
        [[1, 204, 254, 255, 245, 255, 128, 128, 128, 128, 128],
         [207, 160, 250, 255, 238, 128, 128, 128, 128, 128, 128],
         [102, 103, 225, 255, 210, 240, 128, 128, 128, 128, 128]],
        [[1, 152, 252, 255, 240, 255, 128, 128, 128, 128, 128],
         [177, 135, 243, 255, 234, 225, 128, 128, 128, 128, 128],
         [80, 129, 211, 255, 194, 224, 128, 128, 128, 128, 128]],
        [[1, 1, 243, 255, 243, 240, 128, 128, 128, 128, 128],
         [1, 1, 240, 255, 239, 255, 128, 128, 128, 128, 128],
         [1, 1, 245, 255, 241, 255, 128, 128, 128, 128, 128]],
        [[1, 1, 251, 255, 255, 128, 128, 128, 128, 128, 128],
         [203, 1, 248, 255, 255, 128, 128, 128, 128, 128, 128],
         [137, 1, 177, 255, 255, 128, 128, 128, 128, 128, 128]],
    ],
    [  # block type 1 (Y2)
        [[198, 35, 237, 223, 193, 187, 162, 160, 145, 155, 62],
         [131, 45, 198, 221, 172, 176, 220, 157, 252, 221, 1],
         [68, 47, 146, 208, 149, 167, 221, 162, 255, 223, 128]],
        [[1, 149, 241, 255, 221, 224, 255, 255, 128, 128, 128],
         [184, 141, 234, 253, 222, 220, 255, 199, 128, 128, 128],
         [81, 99, 181, 242, 176, 190, 249, 202, 255, 255, 128]],
        [[1, 129, 232, 253, 214, 197, 242, 196, 255, 255, 128],
         [99, 121, 210, 250, 201, 198, 255, 202, 128, 128, 128],
         [23, 91, 163, 242, 170, 187, 247, 210, 255, 255, 128]],
        [[1, 200, 246, 255, 234, 255, 128, 128, 128, 128, 128],
         [109, 178, 241, 255, 231, 245, 255, 255, 128, 128, 128],
         [44, 130, 201, 253, 205, 192, 255, 255, 128, 128, 128]],
        [[1, 132, 239, 251, 219, 209, 255, 165, 128, 128, 128],
         [94, 136, 225, 251, 218, 190, 255, 255, 128, 128, 128],
         [22, 100, 174, 245, 186, 161, 255, 199, 128, 128, 128]],
        [[1, 182, 249, 255, 232, 235, 128, 128, 128, 128, 128],
         [124, 143, 241, 255, 227, 234, 128, 128, 128, 128, 128],
         [35, 77, 181, 251, 193, 211, 255, 205, 128, 128, 128]],
        [[1, 157, 247, 255, 236, 231, 255, 255, 128, 128, 128],
         [121, 141, 235, 255, 225, 227, 255, 255, 128, 128, 128],
         [45, 99, 188, 251, 195, 217, 255, 224, 128, 128, 128]],
        [[1, 1, 251, 255, 213, 255, 128, 128, 128, 128, 128],
         [203, 1, 248, 255, 255, 128, 128, 128, 128, 128, 128],
         [137, 1, 177, 255, 255, 128, 128, 128, 128, 128, 128]],
    ],
    [  # block type 2 (chroma)
        [[253, 9, 248, 251, 207, 208, 255, 192, 128, 128, 128],
         [175, 13, 224, 243, 193, 185, 249, 198, 255, 255, 128],
         [73, 17, 171, 221, 161, 179, 236, 167, 255, 234, 128]],
        [[1, 95, 247, 253, 212, 183, 255, 255, 128, 128, 128],
         [239, 90, 244, 250, 211, 209, 255, 255, 128, 128, 128],
         [155, 77, 195, 248, 188, 195, 255, 255, 128, 128, 128]],
        [[1, 24, 239, 251, 218, 219, 255, 205, 128, 128, 128],
         [201, 51, 219, 255, 196, 186, 128, 128, 128, 128, 128],
         [69, 46, 190, 239, 201, 218, 255, 228, 128, 128, 128]],
        [[1, 191, 251, 255, 255, 128, 128, 128, 128, 128, 128],
         [223, 165, 249, 255, 213, 255, 128, 128, 128, 128, 128],
         [141, 124, 248, 255, 255, 128, 128, 128, 128, 128, 128]],
        [[1, 16, 248, 255, 255, 128, 128, 128, 128, 128, 128],
         [190, 36, 230, 255, 236, 255, 128, 128, 128, 128, 128],
         [149, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128]],
        [[1, 226, 255, 128, 128, 128, 128, 128, 128, 128, 128],
         [247, 192, 255, 128, 128, 128, 128, 128, 128, 128, 128],
         [240, 128, 255, 128, 128, 128, 128, 128, 128, 128, 128]],
        [[1, 134, 252, 255, 255, 128, 128, 128, 128, 128, 128],
         [213, 62, 250, 255, 255, 128, 128, 128, 128, 128, 128],
         [55, 93, 255, 128, 128, 128, 128, 128, 128, 128, 128]],
        [[128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128],
         [128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128],
         [128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128]],
    ],
    [  # block type 3 (Y without Y2)
        [[202, 24, 213, 235, 186, 191, 220, 160, 240, 175, 255],
         [126, 38, 166, 203, 150, 165, 226, 161, 255, 244, 128],
         [61, 46, 138, 188, 135, 122, 237, 158, 255, 255, 128]],
        [[1, 112, 230, 250, 199, 191, 247, 159, 255, 255, 128],
         [166, 109, 228, 252, 211, 215, 255, 223, 128, 128, 128],
         [39, 77, 162, 232, 172, 180, 245, 178, 255, 255, 128]],
        [[1, 52, 220, 246, 198, 199, 249, 220, 255, 255, 128],
         [124, 74, 191, 243, 183, 193, 250, 221, 255, 255, 128],
         [24, 71, 130, 219, 154, 170, 243, 182, 255, 255, 128]],
        [[1, 182, 225, 249, 219, 240, 255, 224, 128, 128, 128],
         [149, 150, 226, 252, 216, 205, 255, 171, 128, 128, 128],
         [28, 108, 170, 242, 183, 194, 254, 223, 255, 255, 128]],
        [[1, 81, 230, 252, 204, 203, 255, 192, 128, 128, 128],
         [123, 102, 209, 247, 188, 196, 255, 233, 128, 128, 128],
         [20, 95, 153, 243, 164, 173, 255, 203, 128, 128, 128]],
        [[1, 222, 248, 255, 216, 213, 128, 128, 128, 128, 128],
         [168, 175, 246, 252, 235, 205, 255, 255, 128, 128, 128],
         [47, 116, 215, 255, 211, 212, 255, 255, 128, 128, 128]],
        [[1, 121, 236, 253, 212, 214, 255, 255, 128, 128, 128],
         [141, 84, 213, 252, 201, 202, 255, 219, 128, 128, 128],
         [42, 80, 160, 240, 162, 185, 255, 205, 128, 128, 128]],
        [[1, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128],
         [244, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128],
         [238, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128]],
    ],
]

# §13.4 probabilities governing the per-prob "update?" flags in the frame
# header (the decoder reads 4*8*3*11 booleans, each against its entry here,
# even when no update happens).
COEF_UPDATE_PROBS = [
    [
        [[255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
         [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
         [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255]],
        [[176, 246, 255, 255, 255, 255, 255, 255, 255, 255, 255],
         [223, 241, 252, 255, 255, 255, 255, 255, 255, 255, 255],
         [249, 253, 253, 255, 255, 255, 255, 255, 255, 255, 255]],
        [[255, 244, 252, 255, 255, 255, 255, 255, 255, 255, 255],
         [234, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255],
         [253, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255]],
        [[255, 246, 254, 255, 255, 255, 255, 255, 255, 255, 255],
         [239, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255],
         [254, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255]],
        [[255, 248, 254, 255, 255, 255, 255, 255, 255, 255, 255],
         [251, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255],
         [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255]],
        [[255, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255],
         [251, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255],
         [254, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255]],
        [[255, 254, 253, 255, 254, 255, 255, 255, 255, 255, 255],
         [250, 255, 254, 255, 254, 255, 255, 255, 255, 255, 255],
         [254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255]],
        [[255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
         [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
         [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255]],
    ],
    [
        [[217, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
         [225, 252, 241, 253, 255, 255, 254, 255, 255, 255, 255],
         [234, 250, 241, 250, 253, 255, 253, 254, 255, 255, 255]],
        [[255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255],
         [223, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255],
         [238, 253, 254, 254, 255, 255, 255, 255, 255, 255, 255]],
        [[255, 248, 254, 255, 255, 255, 255, 255, 255, 255, 255],
         [249, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255],
         [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255]],
        [[255, 253, 255, 255, 255, 255, 255, 255, 255, 255, 255],
         [247, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255],
         [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255]],
        [[255, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255],
         [252, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
         [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255]],
        [[255, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255],
         [253, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
         [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255]],
        [[255, 254, 253, 255, 255, 255, 255, 255, 255, 255, 255],
         [250, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
         [254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255]],
        [[255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
         [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
         [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255]],
    ],
    [
        [[186, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
         [234, 251, 244, 254, 255, 255, 255, 255, 255, 255, 255],
         [251, 251, 243, 253, 254, 255, 254, 255, 255, 255, 255]],
        [[255, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255],
         [236, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255],
         [251, 253, 253, 254, 254, 255, 255, 255, 255, 255, 255]],
        [[255, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255],
         [254, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255],
         [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255]],
        [[255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255],
         [254, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255],
         [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255]],
        [[255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
         [254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
         [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255]],
        [[255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
         [254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
         [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255]],
        [[255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
         [254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
         [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255]],
        [[255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
         [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
         [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255]],
    ],
    [
        [[248, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
         [250, 254, 252, 254, 255, 255, 255, 255, 255, 255, 255],
         [248, 254, 249, 253, 255, 255, 255, 255, 255, 255, 255]],
        [[255, 253, 255, 255, 255, 255, 255, 255, 255, 255, 255],
         [246, 253, 253, 255, 255, 255, 255, 255, 255, 255, 255],
         [252, 254, 251, 254, 254, 255, 255, 255, 255, 255, 255]],
        [[255, 254, 252, 255, 255, 255, 255, 255, 255, 255, 255],
         [248, 254, 253, 255, 255, 255, 255, 255, 255, 255, 255],
         [253, 255, 254, 254, 255, 255, 255, 255, 255, 255, 255]],
        [[255, 251, 254, 255, 255, 255, 255, 255, 255, 255, 255],
         [245, 251, 254, 255, 255, 255, 255, 255, 255, 255, 255],
         [253, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255]],
        [[255, 251, 253, 255, 255, 255, 255, 255, 255, 255, 255],
         [252, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255],
         [255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255]],
        [[255, 252, 255, 255, 255, 255, 255, 255, 255, 255, 255],
         [249, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255],
         [255, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255]],
        [[255, 255, 253, 255, 255, 255, 255, 255, 255, 255, 255],
         [250, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
         [254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255]],
        [[255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
         [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255],
         [255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255]],
    ],
]

# The 4*8*3*11 = 1,056 update probabilities flattened in stream order —
# both the header parser and the flat encoder walk this per frame, so the
# walk runs as one tight local-variable loop instead of 1,056 method calls.
_COEF_UPDATE_FLAT = tuple(
    p for btype in COEF_UPDATE_PROBS for band in btype for cx in band for p in cx
)

# ---------------------------------------------------------------------------
# §11.2 key-frame intra mode coding
# ---------------------------------------------------------------------------

# 16x16 luma modes
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
# 4x4 subblock modes
(B_DC_PRED, B_TM_PRED, B_VE_PRED, B_HE_PRED, B_LD_PRED,
 B_RD_PRED, B_VR_PRED, B_VL_PRED, B_HD_PRED, B_HU_PRED) = range(10)

KF_YMODE_TREE = [-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED]
KF_YMODE_PROB = [145, 156, 163, 128]

UV_MODE_TREE = [-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED]
KF_UV_MODE_PROB = [142, 114, 183]

BMODE_TREE = [
    -B_DC_PRED, 2,
    -B_TM_PRED, 4,
    -B_VE_PRED, 6,
    8, 12,
    -B_HE_PRED, 10,
    -B_RD_PRED, -B_VR_PRED,
    -B_LD_PRED, 14,
    -B_VL_PRED, 16,
    -B_HD_PRED, -B_HU_PRED,
]

# §11.4 kf_bmode_prob[above_mode][left_mode][9] — context-conditioned
# subblock mode probabilities for key frames.
KF_BMODE_PROBS = [
    [[231, 120, 48, 89, 115, 113, 120, 152, 112],
     [152, 179, 64, 126, 170, 118, 46, 70, 95],
     [175, 69, 143, 80, 85, 82, 72, 155, 103],
     [56, 58, 10, 171, 218, 189, 17, 13, 152],
     [144, 71, 10, 38, 171, 213, 144, 34, 26],
     [114, 26, 17, 163, 44, 195, 21, 10, 173],
     [121, 24, 80, 195, 26, 62, 44, 64, 85],
     [170, 46, 55, 19, 136, 160, 33, 206, 71],
     [63, 20, 8, 114, 114, 208, 12, 9, 226],
     [81, 40, 11, 96, 182, 84, 29, 16, 36]],
    [[134, 183, 89, 137, 98, 101, 106, 165, 148],
     [72, 187, 100, 130, 157, 111, 32, 75, 80],
     [66, 102, 167, 99, 74, 62, 40, 234, 128],
     [41, 53, 9, 178, 241, 141, 26, 8, 107],
     [104, 79, 12, 27, 217, 255, 87, 17, 7],
     [74, 43, 26, 146, 73, 166, 49, 23, 157],
     [65, 38, 105, 160, 51, 52, 31, 115, 128],
     [87, 68, 71, 44, 114, 51, 15, 186, 23],
     [47, 41, 14, 110, 182, 183, 21, 17, 194],
     [66, 45, 25, 102, 197, 189, 23, 18, 22]],
    [[88, 88, 147, 150, 42, 46, 45, 196, 205],
     [43, 97, 183, 117, 85, 38, 35, 179, 61],
     [39, 53, 200, 87, 26, 21, 43, 232, 171],
     [56, 34, 51, 104, 114, 102, 29, 93, 77],
     [107, 54, 32, 26, 51, 1, 81, 43, 31],
     [39, 28, 85, 171, 58, 165, 90, 98, 64],
     [34, 22, 116, 206, 23, 34, 43, 166, 73],
     [68, 25, 106, 22, 64, 171, 36, 225, 114],
     [34, 16, 112, 21, 102, 217, 57, 43, 22],
     [26, 35, 32, 24, 192, 3, 9, 215, 15]],
    [[193, 101, 35, 159, 215, 111, 89, 46, 111],
     [60, 148, 31, 172, 219, 228, 21, 18, 111],
     [112, 113, 77, 85, 179, 255, 38, 120, 114],
     [40, 42, 1, 196, 245, 209, 10, 25, 109],
     [100, 80, 8, 43, 154, 1, 51, 26, 71],
     [88, 43, 29, 140, 166, 213, 37, 43, 154],
     [61, 63, 30, 155, 67, 45, 68, 1, 209],
     [142, 78, 78, 16, 255, 128, 34, 197, 171],
     [41, 40, 5, 102, 211, 183, 4, 1, 221],
     [51, 50, 17, 168, 209, 192, 23, 25, 82]],
    [[125, 98, 42, 88, 104, 85, 117, 175, 82],
     [95, 84, 53, 89, 128, 100, 113, 101, 45],
     [75, 79, 123, 47, 51, 128, 81, 171, 1],
     [57, 17, 5, 71, 102, 57, 53, 41, 49],
     [115, 21, 2, 10, 102, 255, 166, 23, 6],
     [38, 33, 13, 121, 57, 73, 26, 1, 85],
     [41, 10, 67, 138, 77, 110, 90, 47, 114],
     [101, 29, 16, 10, 85, 128, 101, 196, 26],
     [57, 18, 10, 102, 102, 213, 34, 20, 43],
     [117, 20, 15, 36, 163, 128, 68, 1, 26]],
    [[138, 31, 36, 171, 27, 166, 38, 44, 229],
     [67, 87, 58, 169, 82, 115, 26, 59, 179],
     [63, 59, 90, 180, 59, 166, 93, 73, 154],
     [40, 40, 21, 116, 143, 209, 34, 39, 175],
     [57, 46, 22, 24, 128, 1, 54, 17, 37],
     [69, 23, 29, 128, 83, 199, 46, 44, 101],
     [52, 46, 55, 116, 60, 98, 45, 96, 222],
     [101, 21, 52, 72, 217, 219, 44, 232, 201],
     [38, 35, 19, 102, 128, 213, 20, 23, 144],
     [75, 45, 32, 73, 115, 205, 49, 33, 57]],
    [[185, 92, 16, 145, 133, 143, 69, 43, 59],
     [61, 135, 19, 134, 144, 178, 31, 40, 75],
     [110, 34, 52, 188, 88, 168, 80, 176, 92],
     [47, 62, 14, 104, 151, 170, 40, 36, 111],
     [102, 61, 10, 29, 132, 1, 103, 22, 10],
     [80, 26, 23, 160, 56, 187, 39, 34, 150],
     [65, 13, 25, 148, 34, 44, 105, 12, 87],
     [128, 48, 21, 12, 134, 213, 60, 244, 52],
     [52, 31, 12, 108, 170, 183, 24, 15, 106],
     [59, 36, 10, 111, 161, 128, 37, 23, 58]],
    [[126, 38, 54, 44, 94, 187, 34, 224, 160],
     [51, 95, 69, 51, 119, 120, 27, 204, 113],
     [46, 22, 130, 33, 74, 171, 34, 244, 163],
     [51, 29, 25, 73, 122, 157, 24, 135, 105],
     [100, 35, 16, 17, 86, 128, 74, 156, 46],
     [45, 16, 39, 96, 67, 187, 32, 150, 126],
     [34, 17, 90, 69, 33, 95, 31, 226, 119],
     [70, 37, 62, 16, 99, 171, 29, 241, 110],
     [39, 24, 24, 76, 114, 171, 17, 91, 126],
     [46, 26, 28, 42, 134, 92, 26, 212, 60]],
    [[133, 44, 14, 88, 125, 176, 12, 14, 239],
     [57, 83, 21, 111, 154, 182, 11, 20, 220],
     [71, 29, 43, 88, 96, 167, 24, 60, 206],
     [35, 41, 4, 123, 190, 201, 8, 14, 202],
     [87, 47, 4, 24, 134, 255, 34, 11, 98],
     [51, 23, 13, 110, 95, 198, 21, 9, 194],
     [44, 28, 22, 124, 65, 84, 24, 10, 216],
     [94, 33, 27, 22, 145, 213, 20, 171, 146],
     [32, 23, 4, 88, 173, 205, 6, 6, 245],
     [42, 32, 8, 106, 172, 177, 12, 11, 175]],
    [[136, 62, 36, 84, 117, 128, 40, 47, 77],
     [53, 83, 45, 83, 129, 127, 35, 63, 62],
     [57, 40, 81, 58, 69, 100, 45, 132, 39],
     [37, 29, 11, 101, 163, 138, 26, 31, 66],
     [93, 32, 9, 16, 114, 255, 113, 32, 18],
     [46, 27, 21, 109, 79, 123, 43, 24, 82],
     [42, 18, 55, 103, 46, 74, 44, 76, 48],
     [79, 36, 34, 18, 104, 171, 39, 203, 44],
     [38, 24, 12, 89, 129, 171, 19, 17, 98],
     [57, 32, 21, 65, 128, 107, 39, 38, 34]],
]


# ---------------------------------------------------------------------------
# §7 boolean arithmetic decoder / §8 encoder
# ---------------------------------------------------------------------------


class BoolDecoder:
    """RFC 6386 §7.3 boolean decoder.  Reading past the end of the
    partition yields zero bytes (the spec's over-read convention); the
    caller bounds semantic damage via dimension checks."""

    __slots__ = ("data", "pos", "range", "value", "bit_count")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.range = 255
        self.value = (self._byte() << 8) | self._byte()
        self.bit_count = 0

    def _byte(self) -> int:
        b = self.data[self.pos] if self.pos < len(self.data) else 0
        self.pos += 1
        return b

    def read_bool(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                self.value |= self._byte()
        return ret

    def read_literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bool(128)
        return v

    def read_signed(self, n: int) -> int:
        """Magnitude-then-sign literal (header delta convention)."""
        v = self.read_literal(n)
        return -v if self.read_bool(128) else v

    def read_tree(self, tree: list[int], probs: list[int], start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.read_bool(probs[i >> 1])]
            if i <= 0:
                return -i


class BoolEncoder:
    """RFC 6386 §8.1 boolean encoder (carry-propagating)."""

    __slots__ = ("out", "range", "bottom", "bit_count")

    def __init__(self) -> None:
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def _carry(self) -> None:
        i = len(self.out) - 1
        while i >= 0 and self.out[i] == 0xFF:
            self.out[i] = 0
            i -= 1
        if i >= 0:
            self.out[i] += 1

    def write_bool(self, prob: int, value: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if value:
            self.bottom += split
            if self.bottom > 0xFFFFFFFF:  # carry out of the 32-bit window
                self._carry()
                self.bottom &= 0xFFFFFFFF
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & 0x80000000:
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= 0xFFFFFF
                self.bit_count = 8

    def write_literal(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.write_bool(128, (v >> i) & 1)

    def write_tree(self, tree: list[int], probs: list[int], value: int) -> None:
        # walk from the root, emitting the branch bits on the path to value
        path: list[tuple[int, int]] = []

        def find(i: int) -> bool:
            for b in (0, 1):
                t = tree[i + b]
                if t <= 0:
                    if -t == value:
                        path.append((i >> 1, b))
                        return True
                elif find(t):
                    path.append((i >> 1, b))
                    return True
            return False

        if not find(0):
            raise ValueError(f"value {value} not in tree")
        for node, bit in reversed(path):
            self.write_bool(probs[node], bit)

    def done(self) -> bytes:
        for _ in range(32):
            self.write_bool(128, 0)
        return bytes(self.out)


# ---------------------------------------------------------------------------
# §14.2 / §14.3 exact integer inverse transforms
# ---------------------------------------------------------------------------

_C1 = 20091  # cospi8sqrt2 - 1, Q16
_C2 = 35468  # sinpi8sqrt2, Q16


def inverse_dct4x4(block: list[int]) -> list[int]:
    """§14.3 inverse DCT, natural-order 16-coefficient input/output."""
    tmp = [0] * 16
    for i in range(4):
        a1 = block[i] + block[i + 8]
        b1 = block[i] - block[i + 8]
        t1 = (block[i + 4] * _C2) >> 16
        t2 = block[i + 12] + ((block[i + 12] * _C1) >> 16)
        c1 = t1 - t2
        t1 = block[i + 4] + ((block[i + 4] * _C1) >> 16)
        t2 = (block[i + 12] * _C2) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[i + 12] = a1 - d1
        tmp[i + 4] = b1 + c1
        tmp[i + 8] = b1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = tmp[r] + tmp[r + 2]
        b1 = tmp[r] - tmp[r + 2]
        t1 = (tmp[r + 1] * _C2) >> 16
        t2 = tmp[r + 3] + ((tmp[r + 3] * _C1) >> 16)
        c1 = t1 - t2
        t1 = tmp[r + 1] + ((tmp[r + 1] * _C1) >> 16)
        t2 = (tmp[r + 3] * _C2) >> 16
        d1 = t1 + t2
        out[r] = (a1 + d1 + 4) >> 3
        out[r + 3] = (a1 - d1 + 4) >> 3
        out[r + 1] = (b1 + c1 + 4) >> 3
        out[r + 2] = (b1 - c1 + 4) >> 3
    return out


def inverse_wht4x4(block: list[int]) -> list[int]:
    """§14.2 inverse Walsh-Hadamard for the Y2 (DC) block."""
    tmp = [0] * 16
    for i in range(4):
        a1 = block[i] + block[i + 12]
        b1 = block[i + 4] + block[i + 8]
        c1 = block[i + 4] - block[i + 8]
        d1 = block[i] - block[i + 12]
        tmp[i] = a1 + b1
        tmp[i + 4] = c1 + d1
        tmp[i + 8] = a1 - b1
        tmp[i + 12] = d1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = tmp[r] + tmp[r + 3]
        b1 = tmp[r + 1] + tmp[r + 2]
        c1 = tmp[r + 1] - tmp[r + 2]
        d1 = tmp[r] - tmp[r + 3]
        out[r] = (a1 + b1 + 3) >> 3
        out[r + 1] = (c1 + d1 + 3) >> 3
        out[r + 2] = (a1 - b1 + 3) >> 3
        out[r + 3] = (d1 - c1 + 3) >> 3
    return out


# ---------------------------------------------------------------------------
# §13 residual token decoding
# ---------------------------------------------------------------------------


def decode_block_coeffs(
    bd: BoolDecoder,
    probs_for_type: list[list[list[int]]],
    first_coeff: int,
    ctx: int,
    dq_dc: int,
    dq_ac: int,
) -> tuple[list[int], int]:
    """Decode one 4x4 block's tokens; returns (natural-order dequantized
    coefficients, end-of-block position in scan order).  ``ctx`` is the
    left+above nonzero context (0..2)."""
    coeffs = [0] * 16
    i = first_coeff
    skip_eob = False
    while i < 16:
        p = probs_for_type[COEFF_BANDS[i]][ctx]
        if not skip_eob and not bd.read_bool(p[0]):
            break
        if not bd.read_bool(p[1]):
            i += 1
            ctx = 0
            skip_eob = True  # EOB cannot immediately follow a zero token
            continue
        skip_eob = False
        if not bd.read_bool(p[2]):
            val = 1
            ctx = 1
        else:
            ctx = 2
            if not bd.read_bool(p[3]):
                if not bd.read_bool(p[4]):
                    val = 2
                else:
                    val = 3 if not bd.read_bool(p[5]) else 4
            else:
                if not bd.read_bool(p[6]):
                    cat = 0 if not bd.read_bool(p[7]) else 1
                else:
                    if not bd.read_bool(p[8]):
                        cat = 2 if not bd.read_bool(p[9]) else 3
                    else:
                        cat = 4 if not bd.read_bool(p[10]) else 5
                extra = 0
                for ep in CAT_PROBS[cat]:
                    extra = (extra << 1) | bd.read_bool(ep)
                val = CAT_BASE[cat] + extra
        if bd.read_bool(128):
            val = -val
        coeffs[ZIGZAG[i]] = val * (dq_dc if i == 0 else dq_ac)
        i += 1
    return coeffs, i


def encode_block_coeffs(
    be: BoolEncoder,
    probs_for_type: list[list[list[int]]],
    first_coeff: int,
    ctx: int,
    levels: list[int],
) -> int:
    """Encode quantized ``levels`` (scan order, positions first_coeff..15,
    trailing zeros trimmed by the caller passing a short list) followed by
    EOB.  Returns the block's nonzero flag for neighbor contexts."""
    i = first_coeff
    skip_eob = False
    for lv in levels:
        p = probs_for_type[COEFF_BANDS[i]][ctx]
        if not skip_eob:
            be.write_bool(p[0], 1)  # not EOB
        mag = abs(lv)
        if mag == 0:
            be.write_bool(p[1], 0)
            ctx = 0
            skip_eob = True
            i += 1
            continue
        skip_eob = False
        be.write_bool(p[1], 1)
        if mag == 1:
            be.write_bool(p[2], 0)
            ctx = 1
        else:
            be.write_bool(p[2], 1)
            ctx = 2
            if mag <= 4:
                be.write_bool(p[3], 0)
                if mag == 2:
                    be.write_bool(p[4], 0)
                else:
                    be.write_bool(p[4], 1)
                    be.write_bool(p[5], 0 if mag == 3 else 1)
            else:
                be.write_bool(p[3], 1)
                cat = next(
                    c for c in range(5, -1, -1)
                    if mag >= CAT_BASE[c]
                )
                if cat <= 1:
                    be.write_bool(p[6], 0)
                    be.write_bool(p[7], cat)
                else:
                    be.write_bool(p[6], 1)
                    if cat <= 3:
                        be.write_bool(p[8], 0)
                        be.write_bool(p[9], cat - 2)
                    else:
                        be.write_bool(p[8], 1)
                        be.write_bool(p[10], cat - 4)
                extra = mag - CAT_BASE[cat]
                eps = CAT_PROBS[cat]
                for bit_i, ep in enumerate(eps):
                    be.write_bool(ep, (extra >> (len(eps) - 1 - bit_i)) & 1)
        be.write_bool(128, 1 if lv < 0 else 0)
        i += 1
    if i < 16:
        p = probs_for_type[COEFF_BANDS[i]][ctx]
        if not skip_eob:
            be.write_bool(p[0], 0)  # EOB
    return 1 if i > first_coeff else 0


# ---------------------------------------------------------------------------
# §12 intra prediction.  Planes are padded: one border row of 127 above the
# frame, one border column of 129 at the left, corner (top-left) 127, and a
# 4-px 127 extension right of the top border row (above-right of the top MB
# row) — the RFC reference decoder's border convention.
# ---------------------------------------------------------------------------


class _Plane:
    """A byte plane with the VP8 prediction border; (x, y) in image coords,
    border cells at x == -1 / y == -1."""

    __slots__ = ("w", "h", "stride", "buf")

    def __init__(self, w: int, h: int) -> None:
        self.w = w
        self.h = h
        self.stride = w + 1 + 4  # left border + above-right extension
        buf = bytearray(self.stride * (h + 1))
        buf[: self.stride] = b"\x7f" * self.stride  # above row (+corner/ext)
        for y in range(1, h + 1):
            buf[y * self.stride] = 129  # left border (right padding stays 0)
        self.buf = buf

    def get(self, x: int, y: int) -> int:
        return self.buf[(y + 1) * self.stride + (x + 1)]

    def set(self, x: int, y: int, v: int) -> None:
        self.buf[(y + 1) * self.stride + (x + 1)] = v

    def finish_row_padding(self, y: int) -> None:
        """After image row y reconstructs fully, replicate the last pixel
        into the right extension so above-right reads off the frame edge
        see the RFC's replicated value."""
        row = (y + 1) * self.stride
        last = self.buf[row + self.w]
        self.buf[row + self.w + 1 : row + self.stride] = bytes(
            (last,)
        ) * (self.stride - self.w - 1)


def _clamp255(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


# clamp lookup for TM-style pred sums: left + above - corner in [-255, 510];
# index with v + 255.  bytes indexing returns int, no function call.
_CL = bytes(_clamp255(v - 255) for v in range(766))


def _pred_dc(plane: _Plane, x0: int, y0: int, size: int) -> list[int]:
    have_above = y0 > 0
    have_left = x0 > 0
    if have_above and have_left:
        s = sum(plane.get(x0 + i, y0 - 1) for i in range(size))
        s += sum(plane.get(x0 - 1, y0 + i) for i in range(size))
        dc = (s + size) >> (5 if size == 16 else 4)
    elif have_above:
        s = sum(plane.get(x0 + i, y0 - 1) for i in range(size))
        dc = (s + (size >> 1)) >> (4 if size == 16 else 3)
    elif have_left:
        s = sum(plane.get(x0 - 1, y0 + i) for i in range(size))
        dc = (s + (size >> 1)) >> (4 if size == 16 else 3)
    else:
        dc = 128
    return [dc] * (size * size)


def _pred_v(plane: _Plane, x0: int, y0: int, size: int) -> list[int]:
    above = [plane.get(x0 + i, y0 - 1) for i in range(size)]
    return above * size


def _pred_h(plane: _Plane, x0: int, y0: int, size: int) -> list[int]:
    out = []
    for j in range(size):
        left = plane.get(x0 - 1, y0 + j)
        out.extend([left] * size)
    return out


def _pred_tm(plane: _Plane, x0: int, y0: int, size: int) -> list[int]:
    tl = plane.get(x0 - 1, y0 - 1)
    above = [plane.get(x0 + i, y0 - 1) for i in range(size)]
    out = []
    cl = _CL
    for j in range(size):
        base = plane.get(x0 - 1, y0 + j) - tl + 255
        out.extend(cl[base + a] for a in above)
    return out


_PRED_16 = {DC_PRED: _pred_dc, V_PRED: _pred_v, H_PRED: _pred_h, TM_PRED: _pred_tm}


def _avg3(a: int, b: int, c: int) -> int:
    return (a + 2 * b + c + 2) >> 2


def _avg2(a: int, b: int) -> int:
    return (a + b + 1) >> 1


def _pred_b(
    plane: _Plane,
    x0: int,
    y0: int,
    mode: int,
    ar_override: list[int] | None = None,
) -> list[int]:
    """§12.3 — the ten 4x4 subblock predictors.  A = above 4, AR = above-
    right 4, L = left 4, P = corner.  ``ar_override`` supplies the above-
    right pixels for column-3 subblocks below the MB's top row, which per
    the spec come from the row above the MACROBLOCK (the "down copy")."""
    a = [plane.get(x0 + i, y0 - 1) for i in range(8)]  # A0..3, AR0..3
    if ar_override is not None:
        a[4:8] = ar_override
    left = [plane.get(x0 - 1, y0 + j) for j in range(4)]
    p = plane.get(x0 - 1, y0 - 1)
    out = [0] * 16
    if mode == B_DC_PRED:
        s = sum(a[:4]) + sum(left)
        dc = (s + 4) >> 3
        return [dc] * 16
    if mode == B_TM_PRED:
        cl = _CL
        for j in range(4):
            base = left[j] - p + 255
            r = 4 * j
            out[r] = cl[base + a[0]]
            out[r + 1] = cl[base + a[1]]
            out[r + 2] = cl[base + a[2]]
            out[r + 3] = cl[base + a[3]]
        return out
    if mode == B_VE_PRED:
        row = [
            _avg3(p, a[0], a[1]),
            _avg3(a[0], a[1], a[2]),
            _avg3(a[1], a[2], a[3]),
            _avg3(a[2], a[3], a[4]),
        ]
        return row * 4
    if mode == B_HE_PRED:
        rows = [
            _avg3(p, left[0], left[1]),
            _avg3(left[0], left[1], left[2]),
            _avg3(left[1], left[2], left[3]),
            _avg3(left[2], left[3], left[3]),
        ]
        for j in range(4):
            for i in range(4):
                out[4 * j + i] = rows[j]
        return out
    if mode == B_LD_PRED:
        for j in range(4):
            for i in range(4):
                k = i + j
                if k < 6:
                    out[4 * j + i] = _avg3(a[k], a[k + 1], a[k + 2])
                else:
                    out[4 * j + i] = _avg3(a[6], a[7], a[7])
        return out
    if mode == B_RD_PRED:
        e = [
            _avg3(left[3], left[2], left[1]),
            _avg3(left[2], left[1], left[0]),
            _avg3(left[1], left[0], p),
            _avg3(left[0], p, a[0]),
            _avg3(p, a[0], a[1]),
            _avg3(a[0], a[1], a[2]),
            _avg3(a[1], a[2], a[3]),
        ]
        for j in range(4):
            for i in range(4):
                out[4 * j + i] = e[i - j + 3]
        return out
    if mode == B_VR_PRED:
        # rows 0/1 are explicit; row j >= 2 repeats row j-2 shifted right
        v = {}
        v[(0, 0)] = _avg2(p, a[0]); v[(0, 1)] = _avg2(a[0], a[1])
        v[(0, 2)] = _avg2(a[1], a[2]); v[(0, 3)] = _avg2(a[2], a[3])
        v[(1, 0)] = _avg3(left[0], p, a[0]); v[(1, 1)] = _avg3(p, a[0], a[1])
        v[(1, 2)] = _avg3(a[0], a[1], a[2]); v[(1, 3)] = _avg3(a[1], a[2], a[3])
        v[(2, 0)] = _avg3(left[1], left[0], p); v[(3, 0)] = _avg3(left[2], left[1], left[0])
        for j in range(4):
            for i in range(4):
                if j >= 2 and i >= 1:
                    out[4 * j + i] = out[4 * (j - 2) + (i - 1)]
                else:
                    out[4 * j + i] = v[(j, i)]
        return out
    if mode == B_VL_PRED:
        v = {}
        v[(0, 0)] = _avg2(a[0], a[1]); v[(0, 1)] = _avg2(a[1], a[2])
        v[(0, 2)] = _avg2(a[2], a[3]); v[(0, 3)] = _avg2(a[3], a[4])
        v[(1, 0)] = _avg3(a[0], a[1], a[2]); v[(1, 1)] = _avg3(a[1], a[2], a[3])
        v[(1, 2)] = _avg3(a[2], a[3], a[4]); v[(1, 3)] = _avg3(a[3], a[4], a[5])
        # the two "extra" down-right cells
        v[(2, 3)] = _avg3(a[4], a[5], a[6]); v[(3, 3)] = _avg3(a[5], a[6], a[7])
        for j in range(4):
            for i in range(4):
                if (j, i) == (2, 3) or (j, i) == (3, 3):
                    out[4 * j + i] = v[(j, i)]
                elif j % 2 == 0:
                    out[4 * j + i] = v[(0, i + (j // 2))]
                else:
                    out[4 * j + i] = v[(1, i + (j // 2))]
        return out
    if mode == B_HD_PRED:
        # cols 0/1 are explicit; col i >= 2 repeats row j-1, col i-2
        v = {}
        v[(0, 0)] = _avg2(p, left[0]); v[(0, 1)] = _avg3(left[0], p, a[0])
        v[(0, 2)] = _avg3(p, a[0], a[1]); v[(0, 3)] = _avg3(a[0], a[1], a[2])
        v[(1, 0)] = _avg2(left[0], left[1]); v[(1, 1)] = _avg3(p, left[0], left[1])
        v[(2, 0)] = _avg2(left[1], left[2]); v[(2, 1)] = _avg3(left[0], left[1], left[2])
        v[(3, 0)] = _avg2(left[2], left[3]); v[(3, 1)] = _avg3(left[1], left[2], left[3])
        for j in range(4):
            for i in range(4):
                if (j, i) in v:
                    out[4 * j + i] = v[(j, i)]
                else:
                    out[4 * j + i] = out[4 * (j - 1) + (i - 2)]
        return out
    if mode == B_HU_PRED:
        v = [
            _avg2(left[0], left[1]),
            _avg3(left[0], left[1], left[2]),
            _avg2(left[1], left[2]),
            _avg3(left[1], left[2], left[3]),
            _avg2(left[2], left[3]),
            _avg3(left[2], left[3], left[3]),
            left[3], left[3],
        ]
        for j in range(4):
            for i in range(4):
                k = 2 * j + i
                out[4 * j + i] = v[k] if k < 8 else left[3]
        return out
    raise ValueError(f"bad B mode {mode}")


# ---------------------------------------------------------------------------
# §9 frame header
# ---------------------------------------------------------------------------


class FrameHeader:
    __slots__ = (
        "width", "height", "mb_w", "mb_h",
        "seg_enabled", "seg_update_map", "seg_abs", "seg_quant", "seg_lf",
        "seg_tree_probs",
        "filter_type", "filter_level", "sharpness",
        "lf_delta_enabled", "ref_lf_deltas", "mode_lf_deltas",
        "q_index", "y1dc_delta", "y2dc_delta", "y2ac_delta",
        "uvdc_delta", "uvac_delta",
        "coef_probs", "no_skip", "skip_prob", "n_partitions",
    )


def _parse_header(bd: BoolDecoder, hdr: FrameHeader) -> None:
    bd.read_literal(1)  # color space
    bd.read_literal(1)  # clamping type
    hdr.seg_enabled = bd.read_bool(128)
    hdr.seg_update_map = 0
    hdr.seg_abs = 0
    hdr.seg_quant = [0, 0, 0, 0]
    hdr.seg_lf = [0, 0, 0, 0]
    hdr.seg_tree_probs = [255, 255, 255]
    if hdr.seg_enabled:
        hdr.seg_update_map = bd.read_bool(128)
        update_data = bd.read_bool(128)
        if update_data:
            hdr.seg_abs = bd.read_bool(128)
            for i in range(4):
                if bd.read_bool(128):
                    hdr.seg_quant[i] = bd.read_signed(7)
            for i in range(4):
                if bd.read_bool(128):
                    hdr.seg_lf[i] = bd.read_signed(6)
        if hdr.seg_update_map:
            for i in range(3):
                if bd.read_bool(128):
                    hdr.seg_tree_probs[i] = bd.read_literal(8)
    hdr.filter_type = bd.read_literal(1)  # 1 = simple
    hdr.filter_level = bd.read_literal(6)
    hdr.sharpness = bd.read_literal(3)
    hdr.lf_delta_enabled = bd.read_bool(128)
    hdr.ref_lf_deltas = [0, 0, 0, 0]
    hdr.mode_lf_deltas = [0, 0, 0, 0]
    if hdr.lf_delta_enabled:
        if bd.read_bool(128):  # update flag
            for i in range(4):
                if bd.read_bool(128):
                    hdr.ref_lf_deltas[i] = bd.read_signed(6)
            for i in range(4):
                if bd.read_bool(128):
                    hdr.mode_lf_deltas[i] = bd.read_signed(6)
    hdr.n_partitions = 1 << bd.read_literal(2)
    hdr.q_index = bd.read_literal(7)
    hdr.y1dc_delta = bd.read_signed(4) if bd.read_bool(128) else 0
    hdr.y2dc_delta = bd.read_signed(4) if bd.read_bool(128) else 0
    hdr.y2ac_delta = bd.read_signed(4) if bd.read_bool(128) else 0
    hdr.uvdc_delta = bd.read_signed(4) if bd.read_bool(128) else 0
    hdr.uvac_delta = bd.read_signed(4) if bd.read_bool(128) else 0
    bd.read_bool(128)  # refresh_entropy_probs — single still frame, no-op
    hdr.coef_probs = [
        [[row[:] for row in band] for band in btype]
        for btype in DEFAULT_COEF_PROBS
    ]
    # §13.4 coefficient probability updates: 1,056 conditional bools per
    # frame.  The boolean-decoder state rides in locals through the loop
    # (identical arithmetic to read_bool, including the past-the-end
    # zero-byte convention) and is written back at the end; the rare
    # update literal re-enters through the method path.
    data, dlen = bd.data, len(bd.data)
    pos, rng, value, bits = bd.pos, bd.range, bd.value, bd.bit_count
    flat_i = 0
    for t in range(4):
        probs_t = hdr.coef_probs[t]
        for b in range(8):
            for c in range(3):
                row = probs_t[b][c]
                for pi in range(11):
                    prob = _COEF_UPDATE_FLAT[flat_i]
                    flat_i += 1
                    split = 1 + (((rng - 1) * prob) >> 8)
                    big = split << 8
                    if value >= big:
                        bit = 1
                        rng -= split
                        value -= big
                    else:
                        bit = 0
                        rng = split
                    while rng < 128:
                        value <<= 1
                        rng <<= 1
                        bits += 1
                        if bits == 8:
                            bits = 0
                            value |= data[pos] if pos < dlen else 0
                            pos += 1
                    if bit:
                        bd.pos, bd.range, bd.value, bd.bit_count = (
                            pos, rng, value, bits,
                        )
                        row[pi] = bd.read_literal(8)
                        pos, rng, value, bits = (
                            bd.pos, bd.range, bd.value, bd.bit_count,
                        )
    bd.pos, bd.range, bd.value, bd.bit_count = pos, rng, value, bits
    hdr.no_skip = bd.read_bool(128)
    hdr.skip_prob = bd.read_literal(8) if hdr.no_skip else 0


def _clamp_q(q: int) -> int:
    return 0 if q < 0 else (127 if q > 127 else q)


def _dequant_factors(hdr: FrameHeader, seg: int) -> tuple[int, ...]:
    q = hdr.q_index
    if hdr.seg_enabled:
        q = hdr.seg_quant[seg] if hdr.seg_abs else q + hdr.seg_quant[seg]
    q = _clamp_q(q)
    y1dc = DC_QLOOKUP[_clamp_q(q + hdr.y1dc_delta)]
    y1ac = AC_QLOOKUP[q]
    y2dc = DC_QLOOKUP[_clamp_q(q + hdr.y2dc_delta)] * 2
    y2ac = AC_QLOOKUP[_clamp_q(q + hdr.y2ac_delta)] * 155 // 100
    if y2ac < 8:
        y2ac = 8
    uvdc = DC_QLOOKUP[_clamp_q(q + hdr.uvdc_delta)]
    if uvdc > 132:
        uvdc = 132
    uvac = AC_QLOOKUP[_clamp_q(q + hdr.uvac_delta)]
    return y1dc, y1ac, y2dc, y2ac, uvdc, uvac


# ---------------------------------------------------------------------------
# §15 loop filter
# ---------------------------------------------------------------------------


def _s(v: int) -> int:
    """u8 -> s8 (value - 128 as signed)."""
    return v - 128


def _u(v: int) -> int:
    """clamp s8 and convert back to u8."""
    if v < -128:
        v = -128
    elif v > 127:
        v = 127
    return v + 128


def _c8(v: int) -> int:
    return -128 if v < -128 else (127 if v > 127 else v)


class _Edge:
    """Adapter giving the filters pixel access across an edge: ``px(k)``
    reads offset k (negative = before the edge), ``set(k, v)`` writes."""

    __slots__ = ("plane", "x", "y", "dx", "dy")

    def __init__(self, plane: _Plane, x: int, y: int, horizontal: bool) -> None:
        self.plane = plane
        self.x = x
        self.y = y
        self.dx = 0 if horizontal else 1
        self.dy = 1 if horizontal else 0

    def px(self, k: int) -> int:
        return self.plane.get(self.x + k * self.dx, self.y + k * self.dy)

    def set(self, k: int, v: int) -> None:
        self.plane.set(self.x + k * self.dx, self.y + k * self.dy, v)


def _common_adjust(e: _Edge, use_outer: bool) -> int:
    p1, p0, q0, q1 = _s(e.px(-2)), _s(e.px(-1)), _s(e.px(0)), _s(e.px(1))
    a = _c8((p1 - q1) if use_outer else 0)
    a = _c8(a + 3 * (q0 - p0))
    f1 = _c8(a + 4) >> 3
    f2 = _c8(a + 3) >> 3
    e.set(0, _u(q0 - f1))
    e.set(-1, _u(p0 + f2))
    return f1


def _simple_filter(e: _Edge, edge_limit: int) -> None:
    p1, p0, q0, q1 = _s(e.px(-2)), _s(e.px(-1)), _s(e.px(0)), _s(e.px(1))
    if abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= edge_limit:
        _common_adjust(e, True)


def _filter_mask(e: _Edge, interior: int, edge: int) -> bool:
    p3, p2, p1, p0 = e.px(-4), e.px(-3), e.px(-2), e.px(-1)
    q0, q1, q2, q3 = e.px(0), e.px(1), e.px(2), e.px(3)
    return (
        abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= edge
        and abs(p3 - p2) <= interior and abs(p2 - p1) <= interior
        and abs(p1 - p0) <= interior and abs(q1 - q0) <= interior
        and abs(q2 - q1) <= interior and abs(q3 - q2) <= interior
    )


def _hev(e: _Edge, thresh: int) -> bool:
    return (
        abs(e.px(-2) - e.px(-1)) > thresh or abs(e.px(1) - e.px(0)) > thresh
    )


def _subblock_filter(e: _Edge, hev_t: int, interior: int, edge: int) -> None:
    if not _filter_mask(e, interior, edge):
        return
    if _hev(e, hev_t):
        _common_adjust(e, True)
    else:
        f1 = _common_adjust(e, False)
        a = (f1 + 1) >> 1
        e.set(1, _u(_s(e.px(1)) - a))
        e.set(-2, _u(_s(e.px(-2)) + a))


def _mb_filter(e: _Edge, hev_t: int, interior: int, edge: int) -> None:
    if not _filter_mask(e, interior, edge):
        return
    if _hev(e, hev_t):
        _common_adjust(e, True)
        return
    p2, p1, p0 = _s(e.px(-3)), _s(e.px(-2)), _s(e.px(-1))
    q0, q1, q2 = _s(e.px(0)), _s(e.px(1)), _s(e.px(2))
    w = _c8(_c8(p1 - q1) + 3 * (q0 - p0))
    a = _c8((27 * w + 63) >> 7)
    e.set(0, _u(q0 - a))
    e.set(-1, _u(p0 + a))
    a = _c8((18 * w + 63) >> 7)
    e.set(1, _u(q1 - a))
    e.set(-2, _u(p1 + a))
    a = _c8((9 * w + 63) >> 7)
    e.set(2, _u(q2 - a))
    e.set(-3, _u(p2 + a))


def _loop_filter_frame(
    hdr: FrameHeader,
    y: _Plane,
    u: _Plane,
    v: _Plane,
    mb_info: list[tuple[int, int, bool]],
) -> None:
    """mb_info[mb_row*mb_w + mb_col] = (segment, ymode, has_coeffs)."""
    mb_w, mb_h = hdr.mb_w, hdr.mb_h
    for mb_row in range(mb_h):
        for mb_col in range(mb_w):
            seg, ymode, has_coeffs = mb_info[mb_row * mb_w + mb_col]
            level = hdr.filter_level
            if hdr.seg_enabled:
                level = (
                    hdr.seg_lf[seg] if hdr.seg_abs else level + hdr.seg_lf[seg]
                )
            if hdr.lf_delta_enabled:
                level += hdr.ref_lf_deltas[0]  # key frame: INTRA_FRAME ref
                if ymode == B_PRED:
                    level += hdr.mode_lf_deltas[0]
            level = 0 if level < 0 else (63 if level > 63 else level)
            if level == 0:
                continue
            interior = level
            if hdr.sharpness:
                interior >>= 2 if hdr.sharpness > 4 else 1
                if interior > 9 - hdr.sharpness:
                    interior = 9 - hdr.sharpness
            if interior < 1:
                interior = 1
            # key-frame high-edge-variance threshold
            hev_t = 2 if level >= 40 else (1 if level >= 15 else 0)
            mb_edge = (level + 2) * 2 + interior
            sub_edge = level * 2 + interior
            inner = has_coeffs or ymode == B_PRED
            x0, y0 = mb_col * 16, mb_row * 16
            cx0, cy0 = mb_col * 8, mb_row * 8
            if hdr.filter_type == 1:  # simple: luma only
                if mb_col:
                    for j in range(16):
                        _simple_filter(_Edge(y, x0, y0 + j, False), mb_edge)
                if inner:
                    for i in (4, 8, 12):
                        for j in range(16):
                            _simple_filter(
                                _Edge(y, x0 + i, y0 + j, False), sub_edge
                            )
                if mb_row:
                    for i in range(16):
                        _simple_filter(_Edge(y, x0 + i, y0, True), mb_edge)
                if inner:
                    for jj in (4, 8, 12):
                        for i in range(16):
                            _simple_filter(
                                _Edge(y, x0 + i, y0 + jj, True), sub_edge
                            )
                continue
            if mb_col:
                for j in range(16):
                    _mb_filter(_Edge(y, x0, y0 + j, False), hev_t, interior, mb_edge)
                for j in range(8):
                    _mb_filter(_Edge(u, cx0, cy0 + j, False), hev_t, interior, mb_edge)
                    _mb_filter(_Edge(v, cx0, cy0 + j, False), hev_t, interior, mb_edge)
            if inner:
                for i in (4, 8, 12):
                    for j in range(16):
                        _subblock_filter(
                            _Edge(y, x0 + i, y0 + j, False), hev_t, interior, sub_edge
                        )
                for j in range(8):
                    _subblock_filter(_Edge(u, cx0 + 4, cy0 + j, False), hev_t, interior, sub_edge)
                    _subblock_filter(_Edge(v, cx0 + 4, cy0 + j, False), hev_t, interior, sub_edge)
            if mb_row:
                for i in range(16):
                    _mb_filter(_Edge(y, x0 + i, y0, True), hev_t, interior, mb_edge)
                for i in range(8):
                    _mb_filter(_Edge(u, cx0 + i, cy0, True), hev_t, interior, mb_edge)
                    _mb_filter(_Edge(v, cx0 + i, cy0, True), hev_t, interior, mb_edge)
            if inner:
                for jj in (4, 8, 12):
                    for i in range(16):
                        _subblock_filter(
                            _Edge(y, x0 + i, y0 + jj, True), hev_t, interior, sub_edge
                        )
                for i in range(8):
                    _subblock_filter(_Edge(u, cx0 + i, cy0 + 4, True), hev_t, interior, sub_edge)
                    _subblock_filter(_Edge(v, cx0 + i, cy0 + 4, True), hev_t, interior, sub_edge)


# ---------------------------------------------------------------------------
# top-level decode
# ---------------------------------------------------------------------------

MAX_PIXELS = 16_000_000  # crawl-robustness cap, same contract as webp.py

_SEG_TREE = [2, 4, -0, -1, -2, -3]
_IMPLIED_B = {DC_PRED: B_DC_PRED, V_PRED: B_VE_PRED, H_PRED: B_HE_PRED, TM_PRED: B_TM_PRED}


def _decode_vp8(payload: bytes) -> tuple[int, int, bytes, bytes, bytes]:
    if len(payload) < 10:
        raise ValueError("truncated VP8 frame")
    tag = payload[0] | (payload[1] << 8) | (payload[2] << 16)
    if tag & 1:
        raise ValueError("VP8 inter frame cannot start a stream")
    first_part_size = tag >> 5
    if payload[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 start code")
    w = struct.unpack_from("<H", payload, 6)[0] & 0x3FFF
    h = struct.unpack_from("<H", payload, 8)[0] & 0x3FFF
    if w == 0 or h == 0:
        raise ValueError("bad VP8 dimensions")
    if w * h > MAX_PIXELS:
        raise ValueError("image too large")
    if 10 + first_part_size > len(payload):
        raise ValueError("first partition overruns frame")
    hdr = FrameHeader()
    hdr.width, hdr.height = w, h
    hdr.mb_w, hdr.mb_h = (w + 15) // 16, (h + 15) // 16
    bd = BoolDecoder(payload[10 : 10 + first_part_size])
    _parse_header(bd, hdr)
    rest = payload[10 + first_part_size :]
    n_part = hdr.n_partitions
    sizes_len = 3 * (n_part - 1)
    if len(rest) < sizes_len:
        raise ValueError("token partition size table overruns frame")
    parts: list[BoolDecoder] = []
    off = sizes_len
    for p in range(n_part):
        if p < n_part - 1:
            psz = rest[3 * p] | (rest[3 * p + 1] << 8) | (rest[3 * p + 2] << 16)
        else:
            psz = len(rest) - off
        if psz < 0 or off + psz > len(rest):
            raise ValueError("token partition overruns frame")
        parts.append(BoolDecoder(rest[off : off + psz]))
        off += psz

    mb_w, mb_h = hdr.mb_w, hdr.mb_h
    y_plane = _Plane(mb_w * 16, mb_h * 16)
    u_plane = _Plane(mb_w * 8, mb_h * 8)
    v_plane = _Plane(mb_w * 8, mb_h * 8)

    dq_by_seg = [_dequant_factors(hdr, s) for s in range(4)]

    # entropy contexts
    above_y = [0] * (mb_w * 4)
    above_u = [0] * (mb_w * 2)
    above_v = [0] * (mb_w * 2)
    above_y2 = [0] * mb_w
    # subblock modes for B_PRED context (bottom row of each above MB)
    above_bmodes = [[B_DC_PRED] * 4 for _ in range(mb_w)]

    mb_info: list[tuple[int, int, bool]] = []

    # decode ALL mode records first (they live in partition 1, contiguous),
    # then the residual partitions (which depend on modes for block types)
    modes: list[tuple[int, int, int, list[int], int]] = []  # seg, skip, ymode, bmodes, uvmode
    for mb_row in range(mb_h):
        left_bmodes = [B_DC_PRED] * 4
        for mb_col in range(mb_w):
            seg = 0
            if hdr.seg_enabled and hdr.seg_update_map:
                seg = bd.read_tree(_SEG_TREE, hdr.seg_tree_probs)
            skip = bd.read_bool(hdr.skip_prob) if hdr.no_skip else 0
            ymode = bd.read_tree(KF_YMODE_TREE, KF_YMODE_PROB)
            bmodes = [B_DC_PRED] * 16
            if ymode == B_PRED:
                for sb in range(16):
                    sr, sc = sb // 4, sb % 4
                    above_m = (
                        bmodes[sb - 4] if sr else above_bmodes[mb_col][sc]
                    )
                    left_m = bmodes[sb - 1] if sc else left_bmodes[sr]
                    bmodes[sb] = bd.read_tree(
                        BMODE_TREE, KF_BMODE_PROBS[above_m][left_m]
                    )
            else:
                bmodes = [_IMPLIED_B[ymode]] * 16
            above_bmodes[mb_col] = bmodes[12:16]
            left_bmodes = [bmodes[3], bmodes[7], bmodes[11], bmodes[15]]
            uvmode = bd.read_tree(UV_MODE_TREE, KF_UV_MODE_PROB)
            modes.append((seg, skip, ymode, bmodes, uvmode))

    for mb_row in range(mb_h):
        td = parts[mb_row % n_part]
        left_y = [0] * 4
        left_u = [0] * 2
        left_v = [0] * 2
        left_y2 = 0
        for mb_col in range(mb_w):
            seg, skip, ymode, bmodes, uvmode = modes[mb_row * mb_w + mb_col]
            y1dc, y1ac, y2dc, y2ac, uvdc, uvac = dq_by_seg[seg]
            has_y2 = ymode != B_PRED
            x0, y0 = mb_col * 16, mb_row * 16
            cx0, cy0 = mb_col * 8, mb_row * 8
            y2_out = None
            blocks: list[list[int]] | None = None
            eobs: list[int] | None = None
            has_coeffs = False
            if skip:
                # no residual tokens: every block reconstructs as pure
                # prediction (§11.1), contexts reset (§13.4)
                for i in range(4):
                    above_y[mb_col * 4 + i] = left_y[i] = 0
                for i in range(2):
                    above_u[mb_col * 2 + i] = left_u[i] = 0
                    above_v[mb_col * 2 + i] = left_v[i] = 0
                if has_y2:
                    above_y2[mb_col] = left_y2 = 0
            else:
                blocks = []
                eobs = []
                probs = hdr.coef_probs
                if has_y2:
                    ctx = above_y2[mb_col] + left_y2
                    coeffs, eob = decode_block_coeffs(
                        td, probs[1], 0, ctx, y2dc, y2ac
                    )
                    nz = 1 if eob > 0 else 0
                    above_y2[mb_col] = left_y2 = nz
                    has_coeffs = has_coeffs or nz
                    y2_out = inverse_wht4x4(coeffs)
                ytype = 0 if has_y2 else 3
                first = 1 if has_y2 else 0
                for sb in range(16):
                    sr, sc = sb // 4, sb % 4
                    ctx = above_y[mb_col * 4 + sc] + left_y[sr]
                    coeffs, eob = decode_block_coeffs(
                        td, probs[ytype], first, ctx, y1dc, y1ac
                    )
                    nz = 1 if eob > first else 0
                    above_y[mb_col * 4 + sc] = left_y[sr] = nz
                    has_coeffs = has_coeffs or nz
                    blocks.append(coeffs)
                    eobs.append(eob)
                for plane_i, (a_ctx, l_ctx) in enumerate(
                    ((above_u, left_u), (above_v, left_v))
                ):
                    for sb in range(4):
                        sr, sc = sb // 2, sb % 2
                        ctx = a_ctx[mb_col * 2 + sc] + l_ctx[sr]
                        coeffs, eob = decode_block_coeffs(
                            td, probs[2], 0, ctx, uvdc, uvac
                        )
                        nz = 1 if eob > 0 else 0
                        a_ctx[mb_col * 2 + sc] = l_ctx[sr] = nz
                        has_coeffs = has_coeffs or nz
                        blocks.append(coeffs)
                        eobs.append(eob)

            # ---- reconstruct luma ----
            # Rows write as 4-px slices into the plane buffer.  An eob at
            # or before scan position 1 means every AC coefficient is zero
            # (for has_y2 blocks the DC arrives from the Y2 transform), so
            # the inverse DCT of the block is the lone-DC constant
            # (dc + 4) >> 3 in all 16 cells — the same identity
            # test_inverse_dct_lone_dc_is_uniform pins.  A skip MB is the
            # r == 0 case of that path.
            ybuf, ystride = y_plane.buf, y_plane.stride
            if has_y2 and y2_out is not None and blocks is not None:
                for sb in range(16):
                    blocks[sb][0] = y2_out[sb]
            if ymode != B_PRED:
                pred = _PRED_16[ymode](y_plane, x0, y0, 16)
                for sb in range(16):
                    sr, sc = sb // 4, sb % 4
                    prow = sr * 64 + sc * 4  # (sr*4)*16 + sc*4
                    row0 = (y0 + sr * 4 + 1) * ystride + x0 + sc * 4 + 1
                    if skip:
                        r = (y2_out[sb] + 4) >> 3 if y2_out is not None else 0
                        dc_only = True
                    else:
                        dc_only = eobs[sb] <= 1
                        r = (blocks[sb][0] + 4) >> 3 if dc_only else 0
                    if dc_only:
                        if r == 0:
                            for j in range(4):
                                p0 = prow + j * 16
                                rj = row0 + j * ystride
                                ybuf[rj : rj + 4] = pred[p0 : p0 + 4]
                        else:
                            for j in range(4):
                                p0 = prow + j * 16
                                rj = row0 + j * ystride
                                ybuf[rj : rj + 4] = [
                                    0 if (v := p + r) < 0
                                    else (255 if v > 255 else v)
                                    for p in pred[p0 : p0 + 4]
                                ]
                    else:
                        res = inverse_dct4x4(blocks[sb])
                        for j in range(4):
                            p0 = prow + j * 16
                            r0 = 4 * j
                            rj = row0 + j * ystride
                            ybuf[rj : rj + 4] = [
                                0 if (v := pred[p0 + i] + res[r0 + i]) < 0
                                else (255 if v > 255 else v)
                                for i in range(4)
                            ]
            else:
                # above-right pixels for column-3 subblocks come from the
                # row above the MACROBLOCK for every subblock row (§12.3)
                ar = [
                    y_plane.get(x0 + 16 + i, y0 - 1) for i in range(4)
                ]
                for sb in range(16):
                    sr, sc = sb // 4, sb % 4
                    bx, by = x0 + sc * 4, y0 + sr * 4
                    pred = _pred_b(
                        y_plane, bx, by, bmodes[sb],
                        ar if sc == 3 and sr > 0 else None,
                    )
                    row0 = (by + 1) * ystride + bx + 1
                    if skip:
                        dc_only, r = True, 0
                    else:
                        dc_only = eobs[sb] <= 1
                        r = (blocks[sb][0] + 4) >> 3 if dc_only else 0
                    if dc_only:
                        if r == 0:
                            for j in range(4):
                                rj = row0 + j * ystride
                                ybuf[rj : rj + 4] = pred[4 * j : 4 * j + 4]
                        else:
                            for j in range(4):
                                rj = row0 + j * ystride
                                ybuf[rj : rj + 4] = [
                                    0 if (v := p + r) < 0
                                    else (255 if v > 255 else v)
                                    for p in pred[4 * j : 4 * j + 4]
                                ]
                    else:
                        res = inverse_dct4x4(blocks[sb])
                        for j in range(4):
                            rj = row0 + j * ystride
                            ybuf[rj : rj + 4] = [
                                0 if (v := pred[4 * j + i] + res[4 * j + i]) < 0
                                else (255 if v > 255 else v)
                                for i in range(4)
                            ]
            # ---- reconstruct chroma ----
            for pi, plane in ((0, u_plane), (1, v_plane)):
                pred = _PRED_16[uvmode](plane, cx0, cy0, 8)
                cbuf, cstride = plane.buf, plane.stride
                for sb in range(4):
                    sr, sc = sb // 2, sb % 2
                    bidx = 16 + pi * 4 + sb
                    prow = sr * 32 + sc * 4  # (sr*4)*8 + sc*4
                    row0 = (cy0 + sr * 4 + 1) * cstride + cx0 + sc * 4 + 1
                    if skip:
                        dc_only, r = True, 0
                    else:
                        dc_only = eobs[bidx] <= 1
                        r = (blocks[bidx][0] + 4) >> 3 if dc_only else 0
                    if dc_only:
                        if r == 0:
                            for j in range(4):
                                p0 = prow + j * 8
                                rj = row0 + j * cstride
                                cbuf[rj : rj + 4] = pred[p0 : p0 + 4]
                        else:
                            for j in range(4):
                                p0 = prow + j * 8
                                rj = row0 + j * cstride
                                cbuf[rj : rj + 4] = [
                                    0 if (v := p + r) < 0
                                    else (255 if v > 255 else v)
                                    for p in pred[p0 : p0 + 4]
                                ]
                    else:
                        res = inverse_dct4x4(blocks[bidx])
                        for j in range(4):
                            p0 = prow + j * 8
                            r0 = 4 * j
                            rj = row0 + j * cstride
                            cbuf[rj : rj + 4] = [
                                0 if (v := pred[p0 + i] + res[r0 + i]) < 0
                                else (255 if v > 255 else v)
                                for i in range(4)
                            ]
            mb_info.append((seg, ymode, has_coeffs))
        for j in range(16):
            y_plane.finish_row_padding(mb_row * 16 + j)
        for j in range(8):
            u_plane.finish_row_padding(mb_row * 8 + j)
            v_plane.finish_row_padding(mb_row * 8 + j)

    if hdr.filter_level:
        _loop_filter_frame(hdr, y_plane, u_plane, v_plane, mb_info)

    # crop to the declared dimensions
    y_out = bytearray(w * h)
    for j in range(h):
        row = (j + 1) * y_plane.stride + 1
        y_out[j * w : (j + 1) * w] = y_plane.buf[row : row + w]
    cw, ch = (w + 1) // 2, (h + 1) // 2
    u_out = bytearray(cw * ch)
    v_out = bytearray(cw * ch)
    for j in range(ch):
        row = (j + 1) * u_plane.stride + 1
        u_out[j * cw : (j + 1) * cw] = u_plane.buf[row : row + cw]
        row = (j + 1) * v_plane.stride + 1
        v_out[j * cw : (j + 1) * cw] = v_plane.buf[row : row + cw]
    return w, h, bytes(y_out), bytes(u_out), bytes(v_out)


def decode_vp8(payload: bytes) -> tuple[int, int, bytes, bytes, bytes]:
    """Decode a VP8 key frame to ``(width, height, y, u, v)`` planes
    (Y full-res, U/V 4:2:0).  Malformed input raises ValueError."""
    try:
        return _decode_vp8(payload)
    except ValueError:
        raise
    except (struct.error, IndexError, OverflowError, MemoryError, KeyError) as e:
        raise ValueError(f"malformed VP8: {type(e).__name__}: {e}") from e


def yuv420_to_rgba(
    w: int, h: int, y: bytes, u: bytes, v: bytes
) -> bytes:
    """Presentation-layer conversion (NOT part of RFC 6386): ITU-R BT.601
    studio-swing YCbCr -> RGB with nearest-neighbor 2x upsampled chroma,
    the common integer formulation.  Opaque alpha."""
    cw = (w + 1) // 2
    out = bytearray(w * h * 4)
    for j in range(h):
        for i in range(w):
            c = y[j * w + i] - 16
            d = u[(j // 2) * cw + i // 2] - 128
            e = v[(j // 2) * cw + i // 2] - 128
            o = 4 * (j * w + i)
            out[o] = _clamp255((298 * c + 409 * e + 128) >> 8)
            out[o + 1] = _clamp255((298 * c - 100 * d - 208 * e + 128) >> 8)
            out[o + 2] = _clamp255((298 * c + 516 * d + 128) >> 8)
            out[o + 3] = 255
    return bytes(out)


# ---------------------------------------------------------------------------
# encoder — exact flat-macroblock key frames
# ---------------------------------------------------------------------------
def encode_vp8_flat(
    mb_w: int,
    mb_h: int,
    lumas: list[int],
    modes: list[int] | None = None,
    q_index: int = 0,
    filter_level: int = 0,
    filter_type: int = 0,
    token_partitions: int = 1,
    mb_skip: bool = False,
    segments: list[int] | None = None,
) -> bytes:
    """Encode a key frame of flat 16x16 macroblocks (luma ``lumas[mb]`` in
    raster order, chroma 128 everywhere) that the §14 integer transforms
    reconstruct EXACTLY (see module docstring).  ``modes[mb]`` selects the
    intra mode per macroblock (DC/V/H/TM 16x16 or B_PRED; default all DC).
    On flat content every 16x16 prediction is constant, and for B_PRED the
    B_DC/B_TM submode pair (alternated per subblock) also predicts each
    4x4 constant — so a lone DC residual codes the block exactly: for the
    Y2 path level 8*r dequantizes through WHT+DCT to residual r, and for
    the B_PRED (type 3) path level 2*r dequantizes by y1dc=4 to 8*r and
    through the DCT to r.  Predictions are computed with the DECODER's own
    predictor functions against a model plane, so encoder and decoder
    cannot disagree.  Requires q_index == 0 (dc quant 4).  Returns the raw
    VP8 payload (no RIFF container).

    Coverage knobs (each exercises a decoder path real encoders use):

    - ``filter_level``/``filter_type``: the §15 in-loop deblocker; nonzero
      levels smooth block edges, so bit-exactness holds only at the
      default 0 (the gate fixture's setting).
    - ``token_partitions`` (1/2/4/8): rows of macroblocks round-robin
      across N token partitions with the 3-byte size table (§9.5).
    - ``mb_skip``: enables mb_no_coeff_skip; an MB whose every residual
      is zero is coded as a skip flag and NO token data (§9.10/§11.1).
    - ``segments``: per-MB segment ids (0..3) coded through the segment
      tree with update_map on (quantizer/loop-filter deltas stay zero, so
      exactness is unaffected while the map-parse path executes).
    """
    if q_index != 0:
        raise ValueError("exact flat coding requires q_index 0")
    if not (0 <= filter_level <= 63 and filter_type in (0, 1)):
        raise ValueError("bad loop filter parameters")
    if token_partitions not in (1, 2, 4, 8):
        raise ValueError("token_partitions must be 1, 2, 4, or 8")
    if len(lumas) != mb_w * mb_h:
        raise ValueError("lumas must have mb_w*mb_h entries")
    if not all(0 <= v <= 255 for v in lumas):
        raise ValueError("luma out of range")
    if mb_w < 1 or mb_h < 1 or mb_w * 16 > 0x3FFF or mb_h * 16 > 0x3FFF:
        raise ValueError("bad macroblock dimensions")
    if modes is None:
        modes = [DC_PRED] * (mb_w * mb_h)
    if len(modes) != mb_w * mb_h or not all(
        m in (DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED) for m in modes
    ):
        raise ValueError("bad mode list")
    if segments is not None and (
        len(segments) != mb_w * mb_h or not all(0 <= s <= 3 for s in segments)
    ):
        raise ValueError("bad segment list")

    skip_prob = 128

    # --- header (first partition) ---
    be = BoolEncoder()
    be.write_literal(0, 1)  # color space
    be.write_literal(0, 1)  # clamping
    if segments is None:
        be.write_bool(128, 0)  # segmentation disabled
    else:
        be.write_bool(128, 1)  # segmentation enabled
        be.write_bool(128, 1)  # update the MB segmentation map
        be.write_bool(128, 0)  # no feature data (quant/lf deltas stay 0)
        for _ in range(3):  # keep default 255 segment tree probs
            be.write_bool(128, 0)
    be.write_literal(filter_type, 1)
    be.write_literal(filter_level, 6)  # 0 (the default) keeps exactness
    be.write_literal(0, 3)  # sharpness
    be.write_bool(128, 0)  # lf delta disabled
    be.write_literal(token_partitions.bit_length() - 1, 2)
    be.write_literal(q_index, 7)
    for _ in range(5):  # y1dc / y2dc / y2ac / uvdc / uvac deltas absent
        be.write_bool(128, 0)
    be.write_bool(128, 1)  # refresh entropy probs
    # 1,056 zero update flags in one tight loop — same arithmetic as
    # write_bool(prob, 0) (value 0 never adds to bottom, so the only carry
    # source is the renormalization shift), state in locals.
    out = be.out
    rng, bottom, bits = be.range, be.bottom, be.bit_count
    for prob in _COEF_UPDATE_FLAT:
        rng = 1 + (((rng - 1) * prob) >> 8)
        while rng < 128:
            rng <<= 1
            if bottom & 0x80000000:
                i = len(out) - 1
                while i >= 0 and out[i] == 0xFF:
                    out[i] = 0
                    i -= 1
                if i >= 0:
                    out[i] += 1
            bottom = (bottom << 1) & 0xFFFFFFFF
            bits -= 1
            if bits == 0:
                out.append((bottom >> 24) & 0xFF)
                bottom &= 0xFFFFFF
                bits = 8
    be.range, be.bottom, be.bit_count = rng, bottom, bits
    be.write_bool(128, 1 if mb_skip else 0)
    if mb_skip:
        be.write_literal(skip_prob, 8)

    def submode_for(mb: int, sb: int) -> int:
        return B_TM_PRED if (mb + sb) % 2 else B_DC_PRED

    # --- single pass: mode records into part1, residual tokens into the
    # round-robin token partitions, predictions against the model plane ---
    tes = [BoolEncoder() for _ in range(token_partitions)]
    y_model = _Plane(mb_w * 16, mb_h * 16)
    above_y = [0] * (mb_w * 4)
    above_u = [0] * (mb_w * 2)
    above_v = [0] * (mb_w * 2)
    above_y2 = [0] * mb_w
    above_bmodes = [[B_DC_PRED] * 4 for _ in range(mb_w)]
    probs = DEFAULT_COEF_PROBS
    for mb_row in range(mb_h):
        te = tes[mb_row % token_partitions]
        left_bmodes = [B_DC_PRED] * 4
        left_y = [0] * 4
        left_u = [0] * 2
        left_v = [0] * 2
        left_y2 = 0
        for mb_col in range(mb_w):
            mb = mb_row * mb_w + mb_col
            target = lumas[mb]
            m = modes[mb]
            x0, y0 = mb_col * 16, mb_row * 16

            # compute the per-block residual levels first (skip needs them
            # before the mode record is written)
            if m != B_PRED:
                pred = _PRED_16[m](y_model, x0, y0, 16)
                if len(set(pred)) != 1:
                    raise AssertionError(
                        "flat-content 16x16 prediction not constant"
                    )
                y2_level = 8 * (target - pred[0])
                sub_levels = None
                all_zero = y2_level == 0
                bmodes = [_IMPLIED_B[m]] * 16
            else:
                bmodes = [submode_for(mb, sb) for sb in range(16)]
                sub_levels = []
                for sb in range(16):
                    sr, sc = sb // 4, sb % 4
                    bx, by = x0 + sc * 4, y0 + sr * 4
                    pred = _pred_b(y_model, bx, by, bmodes[sb], None)
                    if len(set(pred)) != 1:
                        raise AssertionError(
                            "flat-content 4x4 prediction not constant"
                        )
                    sub_levels.append(2 * (target - pred[0]))
                    # fill as we go: later subblocks predict from earlier
                    mbuf, mstride = y_model.buf, y_model.stride
                    tgt4 = bytes((target,)) * 4
                    for j in range(4):
                        rj = (by + j + 1) * mstride + bx + 1
                        mbuf[rj : rj + 4] = tgt4
                y2_level = 0
                all_zero = all(lv == 0 for lv in sub_levels)
            skip = 1 if (mb_skip and all_zero) else 0

            # ---- mode record (first partition) ----
            if segments is not None:
                be.write_tree(_SEG_TREE, [255, 255, 255], segments[mb])
            if mb_skip:
                be.write_bool(skip_prob, skip)
            be.write_tree(KF_YMODE_TREE, KF_YMODE_PROB, m)
            if m == B_PRED:
                for sb in range(16):
                    sr, sc = sb // 4, sb % 4
                    above_m = bmodes[sb - 4] if sr else above_bmodes[mb_col][sc]
                    left_m = bmodes[sb - 1] if sc else left_bmodes[sr]
                    be.write_tree(
                        BMODE_TREE, KF_BMODE_PROBS[above_m][left_m], bmodes[sb]
                    )
            above_bmodes[mb_col] = bmodes[12:16]
            left_bmodes = [bmodes[3], bmodes[7], bmodes[11], bmodes[15]]
            be.write_tree(UV_MODE_TREE, KF_UV_MODE_PROB, DC_PRED)

            # ---- token record (round-robin partition) ----
            if skip:
                # §13.4 context reset: y/u/v zeroed; y2 too when present
                for i in range(4):
                    above_y[mb_col * 4 + i] = left_y[i] = 0
                for i in range(2):
                    above_u[mb_col * 2 + i] = left_u[i] = 0
                    above_v[mb_col * 2 + i] = left_v[i] = 0
                if m != B_PRED:
                    above_y2[mb_col] = left_y2 = 0
            elif m != B_PRED:
                ctx = above_y2[mb_col] + left_y2
                nz = encode_block_coeffs(
                    te, probs[1], 0, ctx, [y2_level] if y2_level else []
                )
                above_y2[mb_col] = left_y2 = nz
                for sb in range(16):
                    sr, sc = sb // 4, sb % 4
                    ctx = above_y[mb_col * 4 + sc] + left_y[sr]
                    nz = encode_block_coeffs(te, probs[0], 1, ctx, [])
                    above_y[mb_col * 4 + sc] = left_y[sr] = nz
            else:
                for sb in range(16):
                    sr, sc = sb // 4, sb % 4
                    lv = sub_levels[sb]
                    ctx = above_y[mb_col * 4 + sc] + left_y[sr]
                    nz = encode_block_coeffs(
                        te, probs[3], 0, ctx, [lv] if lv else []
                    )
                    above_y[mb_col * 4 + sc] = left_y[sr] = nz
                # B_PRED MB: no Y2 block, its context carries through
            if not skip:
                for a_ctx, l_ctx in ((above_u, left_u), (above_v, left_v)):
                    for sb in range(4):
                        sr, sc = sb // 2, sb % 2
                        ctx = a_ctx[mb_col * 2 + sc] + l_ctx[sr]
                        nz = encode_block_coeffs(te, probs[2], 0, ctx, [])
                        a_ctx[mb_col * 2 + sc] = l_ctx[sr] = nz

            if m != B_PRED:
                # reconstruction == target everywhere
                mbuf, mstride = y_model.buf, y_model.stride
                tgt16 = bytes((target,)) * 16
                for j in range(16):
                    rj = (y0 + j + 1) * mstride + x0 + 1
                    mbuf[rj : rj + 16] = tgt16
        for j in range(16):
            y_model.finish_row_padding(mb_row * 16 + j)
    part1 = be.done()
    token_parts = [te.done() for te in tes]

    w, h = mb_w * 16, mb_h * 16
    tag = (len(part1) << 5) | (1 << 4) | 0  # show_frame, version 0, keyframe
    head = bytes(
        (tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF)
    ) + b"\x9d\x01\x2a" + struct.pack("<HH", w, h)
    sizes = b"".join(
        struct.pack("<I", len(p))[:3] for p in token_parts[:-1]
    )
    return head + part1 + sizes + b"".join(token_parts)
