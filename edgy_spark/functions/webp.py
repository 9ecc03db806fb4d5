"""Pure-stdlib WebP codec — VP8L (lossless) decode written from the public
WebP container + lossless bitstream specification (RFC 9649 / the Google
"WebP Lossless Bitstream Specification"), no third-party libraries.

Scope (the crawl-robust contract shared with functions/{png,jpeg,gif}.py):

- RIFF container walk: ``VP8X`` extended header, ``VP8L`` lossless frames
  (fully decoded), ``VP8 `` lossy key frames (fully decoded via the
  from-spec RFC 6386 intra decoder in functions/vp8.py, presented as RGBA
  through a BT.601 conversion — native planes via
  :func:`decode_webp_planes`), ``ANIM``/``ANMF`` animations (composed
  frame iteration + time sampling via :func:`iter_webp_frames_composed` /
  :func:`iter_time_sampled_composed_webp_frames`; the still API returns
  the first composed frame, GIF's convention), ``ALPH`` lossy alpha
  (``NotImplementedError`` — skipping it would silently drop alpha).
- VP8L: LSB-first bit reader, canonical prefix codes (simple two-symbol and
  full code-length-coded forms incl. the 16/17/18 repeat codes and the
  max_symbol short-circuit), optional color cache, meta prefix (entropy)
  images, LZ77 backward references through the 120-entry 2D distance map,
  and all four transforms inverted in reverse stream order: PREDICTOR (all
  14 modes), COLOR (signed 3.5 fixed-point cross-channel deltas),
  SUBTRACT_GREEN, and COLOR_INDEXING (palette with 1/2/4/8-bit packed
  indices).
- Every malformed-input failure (truncated stream, bad prefix code,
  out-of-range backref, oversized dims) surfaces as ``ValueError``;
  header-implied allocations are capped by MAX_PIXELS BEFORE allocating.

The encoder (:func:`encode_webp_lossless`) exists for fixtures and
round-trip property tests: literal-only entropy coding (no LZ77), optional
forward SUBTRACT_GREEN / single-mode PREDICTOR / COLOR_INDEXING transforms,
real canonical prefix codes built by package-merge.  The JDK's javax.imageio
cannot read WebP, so the cross-validation lane used for PNG/GIF/JPEG does
not apply; conformance is anchored by hand-computed spec vectors
(tests/test_webp.py) plus encoder round-trips.

Reference behavior parity note: the reference engine (cdsmith/edgy) stores
media as opaque Binary attributes (/root/reference/src/Edgy/Node.hs:73-81);
decode semantics here are north-star scope, not reference parity.
"""

from __future__ import annotations

import struct

from edgy_spark.functions import vp8 as _vp8
from edgy_spark.functions.gif import blend_rgba_rect, iter_time_samples_shared

MAX_PIXELS = 64_000_000

#: transform types, spec §4.2 (3.x in RFC numbering)
_PREDICTOR = 0
_COLOR = 1
_SUBTRACT_GREEN = 2
_COLOR_INDEXING = 3

#: code-length-code read order, spec §5.2.2
_CODE_LENGTH_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

#: green/length/cache alphabet: 256 literals + 24 length prefix codes
_NUM_LITERALS = 256
_NUM_LENGTH_CODES = 24
_NUM_DISTANCE_CODES = 40


def _distance_map() -> list[tuple[int, int]]:
    """The 120-entry 2D neighborhood behind short distance codes, spec
    §5.2.3: all (dx, dy) with dy in 0..7 and dx in -7..8 (dy=0 restricted
    to dx>=1), ordered by Euclidean distance with ties broken by smaller
    |dx| first and positive dx before negative."""
    cands = [
        (dx, dy)
        for dy in range(8)
        for dx in range(-7, 9)
        if dy > 0 or dx >= 1
    ]
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]), p[0] < 0))
    assert len(cands) == 120
    return cands


_DISTANCE_MAP = _distance_map()


class _BitReader:
    """LSB-first bit reader over the VP8L payload (DEFLATE bit order)."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bit = 0

    def read(self, n: int) -> int:
        # batched form of the per-bit loop: raises exactly when any of the
        # n bits would come from a byte past the end of the payload
        if n == 0:
            return 0
        data = self.data
        idx = (self.pos << 3) + self.bit
        last = idx + n - 1
        if (last >> 3) >= len(data):
            raise ValueError("truncated VP8L stream")
        v = (
            int.from_bytes(data[idx >> 3 : (last >> 3) + 1], "little")
            >> (idx & 7)
        ) & ((1 << n) - 1)
        idx += n
        self.pos = idx >> 3
        self.bit = idx & 7
        return v


class _Tree:
    """Canonical prefix code: decode bit-by-bit (code = code<<1 | bit,
    DEFLATE-style reversed-key canonical order).  A single-symbol tree
    consumes ZERO bits per symbol (spec: simple codes may carry one
    symbol; libwebp's table builder special-cases one-symbol codes)."""

    __slots__ = ("single", "codes", "max_len")

    def __init__(self, lengths: dict[int, int]) -> None:
        used = {s: l for s, l in lengths.items() if l > 0}
        if not used:
            raise ValueError("empty prefix code")
        if len(used) == 1:
            self.single = next(iter(used))
            self.codes: dict[int, int] = {}
            self.max_len = 0
            return
        self.single = None
        # canonical assignment: sort by (length, symbol), increment code
        kraft = sum(1 << (15 - l) for l in used.values())
        if kraft != 1 << 15:
            raise ValueError("invalid prefix code (not complete)")
        code = 0
        prev_len = 0
        self.codes = {}
        for sym in sorted(used, key=lambda s: (used[s], s)):
            length = used[sym]
            code <<= length - prev_len
            self.codes[(length << 16) | code] = sym  # int key: no tuple alloc per bit
            code += 1
            prev_len = length
        self.max_len = max(used.values())

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        # bit-by-bit walk with the reader state in locals (one state
        # write-back per symbol instead of one read() call per bit)
        data = br.data
        idx = (br.pos << 3) + br.bit
        end = len(data) << 3
        code = 0
        codes = self.codes
        for length in range(1, self.max_len + 1):
            if idx >= end:
                raise ValueError("truncated VP8L stream")
            code = (code << 1) | ((data[idx >> 3] >> (idx & 7)) & 1)
            idx += 1
            sym = codes.get((length << 16) | code)
            if sym is not None:
                br.pos = idx >> 3
                br.bit = idx & 7
                return sym
        br.pos = idx >> 3
        br.bit = idx & 7
        raise ValueError("invalid prefix code bits")


def _read_code_lengths(br: _BitReader, lc_tree: _Tree, num_symbols: int) -> dict[int, int]:
    """Spec §5.2.2: decode per-symbol code lengths with repeat codes
    16 (repeat previous nonzero, 2 extra bits, 3..6), 17 (zeros, 3 bits,
    3..10), 18 (zeros, 7 bits, 11..138) and the optional max_symbol cap."""
    if br.read(1):  # use max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
        if max_symbol > num_symbols:
            raise ValueError("max_symbol exceeds alphabet")
    else:
        max_symbol = num_symbols
    lengths: dict[int, int] = {}
    symbol = 0
    prev_len = 8  # spec default
    while symbol < num_symbols:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = lc_tree.read(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len != 0:
                prev_len = code_len
        else:
            slot = code_len - 16
            extra = (2, 3, 7)[slot]
            base = (3, 3, 11)[slot]
            repeat = br.read(extra) + base
            if symbol + repeat > num_symbols:
                raise ValueError("code-length repeat overflows alphabet")
            fill = prev_len if code_len == 16 else 0
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return lengths


def _read_tree(br: _BitReader, alphabet: int) -> _Tree:
    """One prefix code, spec §5.2.1/5.2.2 — the simple (1-2 symbol) form
    or the full code-length-coded form."""
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        s0 = br.read(8 if first_8bit else 1)
        lengths = {s0: 1}
        if num_symbols == 2:
            s1 = br.read(8)
            if s1 == s0:
                raise ValueError("duplicate symbol in simple code")
            lengths[s1] = 1
        if max(lengths) >= alphabet:
            raise ValueError("simple-code symbol out of alphabet")
        return _Tree(lengths)  # one used symbol → zero-bit code (see _Tree)
    num_codes = br.read(4) + 4
    if num_codes > len(_CODE_LENGTH_ORDER):
        raise ValueError("invalid code-length count")
    lc_lengths: dict[int, int] = {}
    for i in range(num_codes):
        lc_lengths[_CODE_LENGTH_ORDER[i]] = br.read(3)
    # the code-length code itself is canonical over <=19 symbols (a single
    # used symbol again collapses to the zero-bit tree)
    lc_tree = _Tree(lc_lengths)
    lengths = _read_code_lengths(br, lc_tree, alphabet)
    return _Tree(lengths)


def _subsample_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _copy_length(br: _BitReader, sym: int) -> int:
    """Length/distance prefix decoding, spec §5.2.3."""
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + br.read(extra) + 1


def _plane_code_to_distance(xsize: int, plane_code: int) -> int:
    if plane_code > 120:
        return plane_code - 120
    dx, dy = _DISTANCE_MAP[plane_code - 1]
    dist = dy * xsize + dx
    return dist if dist >= 1 else 1


class _Transform:
    __slots__ = ("kind", "xsize", "ysize", "size_bits", "data", "n_colors", "pack_bits")

    def __init__(self, kind: int, xsize: int, ysize: int) -> None:
        self.kind = kind
        self.xsize = xsize  # image width AT READ TIME (post earlier packing)
        self.ysize = ysize
        self.size_bits = 0
        self.data: list[int] = []
        self.n_colors = 0
        self.pack_bits = 0


def _decode_image_stream(
    br: _BitReader, xsize: int, ysize: int, is_level0: bool
) -> tuple[list[int], list[_Transform], int]:
    """Spec §5/§6 DecodeImageStream: returns (ARGB pixel list in scan
    order, transforms in stream order, the possibly packed xsize)."""
    transforms: list[_Transform] = []
    seen_kinds: set[int] = set()
    if is_level0:
        while br.read(1):
            kind = br.read(2)
            if kind in seen_kinds:
                raise ValueError("transform type repeated")
            seen_kinds.add(kind)
            tr = _Transform(kind, xsize, ysize)
            if kind in (_PREDICTOR, _COLOR):
                tr.size_bits = br.read(3) + 2
                bw = _subsample_size(xsize, tr.size_bits)
                bh = _subsample_size(ysize, tr.size_bits)
                tr.data, _, _ = _decode_image_stream(br, bw, bh, False)
            elif kind == _COLOR_INDEXING:
                tr.n_colors = br.read(8) + 1
                if tr.n_colors <= 2:
                    tr.pack_bits = 3
                elif tr.n_colors <= 4:
                    tr.pack_bits = 2
                elif tr.n_colors <= 16:
                    tr.pack_bits = 1
                else:
                    tr.pack_bits = 0
                pal, _, _ = _decode_image_stream(br, tr.n_colors, 1, False)
                # palette entries are delta-coded componentwise, spec §4.2.4
                out = []
                prev = 0
                for p in pal:
                    cur = (
                        (((prev >> 24) + (p >> 24)) & 0xFF) << 24
                        | (((prev >> 16) + (p >> 16)) & 0xFF & 0xFF) << 16
                        | ((((prev >> 8) & 0xFF) + ((p >> 8) & 0xFF)) & 0xFF) << 8
                        | ((prev + p) & 0xFF)
                    )
                    out.append(cur)
                    prev = cur
                tr.data = out
                xsize = _subsample_size(xsize, tr.pack_bits)
            elif kind == _SUBTRACT_GREEN:
                pass
            transforms.append(tr)

    # color cache, spec §5.2.3
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("invalid color cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    # meta prefix image, spec §5.2.1
    entropy_image: list[int] | None = None
    huffman_bits = 0
    huffman_xsize = 0
    num_groups = 1
    if is_level0 and br.read(1):
        huffman_bits = br.read(3) + 2
        huffman_xsize = _subsample_size(xsize, huffman_bits)
        huffman_ysize = _subsample_size(ysize, huffman_bits)
        entropy_image, _, _ = _decode_image_stream(br, huffman_xsize, huffman_ysize, False)
        num_groups = 1 + max(((p >> 8) & 0xFFFF) for p in entropy_image)

    green_alpha = _NUM_LITERALS + _NUM_LENGTH_CODES + cache_size
    groups = []
    for _ in range(num_groups):
        groups.append(
            (
                _read_tree(br, green_alpha),
                _read_tree(br, 256),  # red
                _read_tree(br, 256),  # blue
                _read_tree(br, 256),  # alpha
                _read_tree(br, _NUM_DISTANCE_CODES),
            )
        )

    n = xsize * ysize
    if n > MAX_PIXELS:
        raise ValueError("image too large")
    pixels: list[int] = []
    group = groups[0]
    last_meta = (-1, -1)

    def insert_cache(argb: int) -> None:
        if cache_size:
            cache[(0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - cache_bits)] = argb

    while len(pixels) < n:
        pos = len(pixels)
        x = pos % xsize
        y = pos // xsize
        if entropy_image is not None:
            key = (x >> huffman_bits, y >> huffman_bits)
            if key != last_meta:
                last_meta = key
                meta = entropy_image[key[1] * huffman_xsize + key[0]]
                group = groups[(meta >> 8) & 0xFFFF]
        g_tree, r_tree, b_tree, a_tree, d_tree = group
        s = g_tree.read(br)
        if s < _NUM_LITERALS:
            red = r_tree.read(br)
            blue = b_tree.read(br)
            alpha = a_tree.read(br)
            argb = (alpha << 24) | (red << 16) | (s << 8) | blue
            pixels.append(argb)
            insert_cache(argb)
        elif s < _NUM_LITERALS + _NUM_LENGTH_CODES:
            length = _copy_length(br, s - _NUM_LITERALS)
            dist_code = _copy_length(br, d_tree.read(br))
            dist = _plane_code_to_distance(xsize, dist_code)
            if dist > pos or pos + length > n:
                raise ValueError("backward reference out of range")
            for _ in range(length):
                argb = pixels[-dist]
                pixels.append(argb)
                insert_cache(argb)
            last_meta = (-1, -1)  # position may have jumped blocks mid-copy
        else:
            idx = s - (_NUM_LITERALS + _NUM_LENGTH_CODES)
            if idx >= cache_size:
                raise ValueError("color cache index out of range")
            pixels.append(cache[idx])
    return pixels, transforms, xsize


# -- transform inverses ------------------------------------------------------


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) >> 1) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8
        | ((a & 0xFF) + (b & 0xFF)) >> 1
    )


def _select(t: int, l: int, tl: int) -> int:
    p = 0
    for sh in (24, 16, 8, 0):
        lc = (l >> sh) & 0xFF
        tc = (t >> sh) & 0xFF
        tlc = (tl >> sh) & 0xFF
        p += abs(lc - tlc) - abs(tc - tlc)
    return t if p <= 0 else l


def _clamp_add_full(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        out |= max(0, min(255, v)) << sh
    return out


def _clamp_add_half(l: int, t: int, tl: int) -> int:
    ave = _avg2(l, t)
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        b = (tl >> sh) & 0xFF
        d = a - b
        # C truncation toward zero (libwebp (a - b) / 2 on ints)
        half = abs(d) >> 1
        v = a + (half if d >= 0 else -half)
        out |= max(0, min(255, v)) << sh
    return out


def _add_pixels(residual: int, pred: int) -> int:
    return (
        (((residual >> 24) + (pred >> 24)) & 0xFF) << 24
        | ((((residual >> 16) & 0xFF) + ((pred >> 16) & 0xFF)) & 0xFF) << 16
        | ((((residual >> 8) & 0xFF) + ((pred >> 8) & 0xFF)) & 0xFF) << 8
        | (((residual & 0xFF) + (pred & 0xFF)) & 0xFF)
    )


def _inverse_predictor(px: list[int], w: int, h: int, tr: _Transform) -> list[int]:
    """Spec §4.2.2: residual + prediction per channel mod 256; block-wise
    predictor modes from the transform sub-image's green channel.  Edge
    rules: (0,0) predicts opaque black; row 0 predicts L; column 0
    predicts T; TR for the rightmost column is the pixel at scan index
    (y-1)*w + w == leftmost pixel of the current row."""
    bw = _subsample_size(w, tr.size_bits)
    out: list[int] = []
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if i == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = out[i - 1]  # L
            elif x == 0:
                pred = out[i - w]  # T
            else:
                mode = (tr.data[(y >> tr.size_bits) * bw + (x >> tr.size_bits)] >> 8) & 0xFF
                left = out[i - 1]
                top = out[i - w]
                tl = out[i - w - 1]
                trp = out[i - w + 1]
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = left
                elif mode == 2:
                    pred = top
                elif mode == 3:
                    pred = trp
                elif mode == 4:
                    pred = tl
                elif mode == 5:
                    pred = _avg2(_avg2(left, trp), top)
                elif mode == 6:
                    pred = _avg2(left, tl)
                elif mode == 7:
                    pred = _avg2(left, top)
                elif mode == 8:
                    pred = _avg2(tl, top)
                elif mode == 9:
                    pred = _avg2(top, trp)
                elif mode == 10:
                    pred = _avg2(_avg2(left, tl), _avg2(top, trp))
                elif mode == 11:
                    pred = _select(top, left, tl)
                elif mode == 12:
                    pred = _clamp_add_full(left, top, tl)
                elif mode == 13:
                    pred = _clamp_add_half(left, top, tl)
                else:
                    raise ValueError(f"invalid predictor mode {mode}")
            out.append(_add_pixels(px[i], pred))
    return out


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: signed 3.5 fixed point, arithmetic shift."""
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


def _inverse_color(px: list[int], w: int, h: int, tr: _Transform) -> list[int]:
    """Spec §4.2.3: green_to_red rides the transform pixel's blue channel,
    green_to_blue its green, red_to_blue its red; red_to_blue applies with
    the ALREADY-RESTORED red."""
    bw = _subsample_size(w, tr.size_bits)
    out = []
    for y in range(h):
        for x in range(w):
            argb = px[y * w + x]
            cte = tr.data[(y >> tr.size_bits) * bw + (x >> tr.size_bits)]
            g2r = cte & 0xFF
            g2b = (cte >> 8) & 0xFF
            r2b = (cte >> 16) & 0xFF
            green = (argb >> 8) & 0xFF
            red = ((argb >> 16) & 0xFF) + _ct_delta(g2r, green)
            red &= 0xFF
            blue = (argb & 0xFF) + _ct_delta(g2b, green) + _ct_delta(r2b, red)
            blue &= 0xFF
            out.append((argb & 0xFF00FF00) | (red << 16) | blue)
    return out


def _inverse_subtract_green(px: list[int]) -> list[int]:
    out = []
    for argb in px:
        g = (argb >> 8) & 0xFF
        r = (((argb >> 16) & 0xFF) + g) & 0xFF
        b = ((argb & 0xFF) + g) & 0xFF
        out.append((argb & 0xFF00FF00) | (r << 16) | b)
    return out


def _inverse_color_indexing(
    px: list[int], packed_w: int, h: int, tr: _Transform
) -> list[int]:
    """Spec §4.2.4: indices ride the green channel, packed LSB-first when
    the palette is small; out-of-palette indices resolve to transparent
    black (the 256-entry zero-filled palette convention)."""
    palette = tr.data + [0] * (256 - len(tr.data))
    bits = tr.pack_bits
    w = tr.xsize  # width BEFORE packing (read-time xsize)
    if bits == 0:
        return [palette[(p >> 8) & 0xFF] for p in px]
    per = 1 << bits  # pixels per packed byte... per packed GREEN sample
    bpp = 8 >> bits
    mask = (1 << bpp) - 1
    out = []
    for y in range(h):
        for x in range(w):
            packed = px[y * packed_w + (x >> bits)]
            green = (packed >> 8) & 0xFF
            idx = (green >> ((x & (per - 1)) * bpp)) & mask
            out.append(palette[idx])
    return out


def _decode_vp8l(payload: bytes) -> tuple[int, int, int, bytes]:
    br = _BitReader(payload)
    if br.read(8) != 0x2F:
        raise ValueError("bad VP8L signature")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unsupported VP8L version")
    if w * h > MAX_PIXELS:
        raise ValueError("image too large")
    px, transforms, coded_w = _decode_image_stream(br, w, h, True)
    # invert in reverse stream order; track the buffer's current width
    cur_w = coded_w
    for tr in reversed(transforms):
        if tr.kind == _PREDICTOR:
            px = _inverse_predictor(px, cur_w, h, tr)
        elif tr.kind == _COLOR:
            px = _inverse_color(px, cur_w, h, tr)
        elif tr.kind == _SUBTRACT_GREEN:
            px = _inverse_subtract_green(px)
        elif tr.kind == _COLOR_INDEXING:
            px = _inverse_color_indexing(px, cur_w, h, tr)
            cur_w = tr.xsize
    if cur_w != w or len(px) != w * h:
        raise ValueError("decoded size mismatch")
    out = bytearray(w * h * 4)
    for i, argb in enumerate(px):
        out[4 * i] = (argb >> 16) & 0xFF
        out[4 * i + 1] = (argb >> 8) & 0xFF
        out[4 * i + 2] = argb & 0xFF
        out[4 * i + 3] = (argb >> 24) & 0xFF
    return w, h, 4, bytes(out)


def _parse_vp8_dims(payload: bytes) -> tuple[int, int]:
    """Lossy VP8 key-frame header, enough to validate and size the frame
    (RFC 6386 §9.1) before the honest NotImplementedError."""
    if len(payload) < 10:
        raise ValueError("truncated VP8 frame")
    tag = payload[0] | (payload[1] << 8) | (payload[2] << 16)
    if tag & 1:
        raise ValueError("VP8 inter frame cannot start a stream")
    if payload[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 start code")
    w = struct.unpack_from("<H", payload, 6)[0] & 0x3FFF
    h = struct.unpack_from("<H", payload, 8)[0] & 0x3FFF
    if w == 0 or h == 0:
        raise ValueError("bad VP8 dimensions")
    return w, h


def _decode_webp(data: bytes) -> tuple[int, int, int, bytes]:
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    riff_size = struct.unpack_from("<I", data, 4)[0]
    end = min(len(data), 8 + riff_size)
    pos = 12
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        # a chunk must fit inside the DECLARED RIFF size, not just the
        # buffer — an overrun is a container inconsistency (review r13)
        if pos + 8 + size > end:
            raise ValueError("truncated chunk")
        payload = data[pos + 8 : pos + 8 + size]
        if tag == b"VP8L":
            return _decode_vp8l(payload)
        if tag == b"VP8 ":
            _parse_vp8_dims(payload)  # fast container-level validation
            w, h, y, u, v = _vp8.decode_vp8(payload)
            return w, h, 4, _vp8.yuv420_to_rgba(w, h, y, u, v)
        if tag == b"ALPH":
            # skipping it would decode the lossy frame with its alpha
            # silently dropped — honest boundary instead
            raise NotImplementedError("lossy alpha (ALPH) not implemented")
        if tag in (b"ANIM", b"ANMF"):
            # the still API's convention for animations mirrors GIF's
            # decode_gif: the FIRST composed frame
            w, h, ch, px = next(iter_webp_frames_composed(data))
            return w, h, ch, px
        if tag == b"VP8X":
            if size < 10:
                raise ValueError("truncated VP8X header")
            # an animation flag just announces ANIM/ANMF chunks ahead;
            # the walk reaches them and composes the first frame
        pos += 8 + size + (size & 1)  # chunks are even-padded
    raise ValueError("no image chunk in WebP container")


def decode_webp(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a WebP into ``(width, height, 4, RGBA bytes)``.  VP8L frames
    decode natively; lossy "VP8 " key frames decode through functions/vp8.py
    with a BT.601 YUV->RGBA presentation conversion (use
    :func:`decode_webp_planes` for the native planes); animations return
    the FIRST composed frame (GIF's still-lane convention); standalone
    lossy alpha (ALPH) raises NotImplementedError — an honest scope
    boundary.  EVERY malformed-input failure surfaces as ValueError
    (struct/index errors from fuzzed or truncated crawl bytes are
    normalized)."""
    try:
        return _decode_webp(data)
    except (ValueError, NotImplementedError):
        raise
    except (struct.error, IndexError, OverflowError, MemoryError) as e:
        raise ValueError(f"malformed WebP: {type(e).__name__}: {e}") from e


# -- encoder (fixtures + round-trip property tests) --------------------------


class _BitWriter:
    __slots__ = ("out", "cur", "bit")

    def __init__(self) -> None:
        self.out = bytearray()
        self.cur = 0
        self.bit = 0

    def write(self, v: int, n: int) -> None:
        # batched form of the per-bit loop (low n bits of v, LSB first)
        cur = self.cur | ((v & ((1 << n) - 1)) << self.bit)
        bit = self.bit + n
        out = self.out
        while bit >= 8:
            out.append(cur & 0xFF)
            cur >>= 8
            bit -= 8
        self.cur = cur
        self.bit = bit

    def write_code(self, code: int, length: int) -> None:
        """Prefix codes go MSB-first into the LSB-first stream (DEFLATE):
        reverse the code's bits, then emit them as one LSB-first write."""
        r = 0
        for _ in range(length):
            r = (r << 1) | (code & 1)
            code >>= 1
        self.write(r, length)

    def done(self) -> bytes:
        if self.bit:
            self.out.append(self.cur)
            self.cur = 0
            self.bit = 0
        return bytes(self.out)


def _single_block_size_bits(width: int, height: int, what: str) -> int:
    """The size_bits whose single block covers the whole image (the
    fixture encoder writes one transform element for PREDICTOR/COLOR)."""
    size_bits = 2
    while (1 << size_bits) < max(width, height):
        size_bits += 1
    if size_bits > 9:
        raise ValueError(f"image too large for single-block {what}")
    return size_bits


def _package_merge(freqs: dict[int, int], limit: int) -> dict[int, int]:
    """Length-limited optimal prefix code lengths (package-merge)."""
    items = sorted((f, s) for s, f in freqs.items() if f > 0)
    if not items:
        raise ValueError("empty histogram")
    if len(items) == 1:
        return {items[0][1]: 1}
    if len(items) > (1 << limit):
        raise ValueError("alphabet exceeds length limit capacity")
    packages: list[tuple[int, tuple[int, ...]]] = []
    singles = [(f, (s,)) for f, s in items]
    for _ in range(limit):
        merged = sorted(packages + singles)
        packages = [
            (merged[i][0] + merged[i + 1][0], merged[i][1] + merged[i + 1][1])
            for i in range(0, len(merged) - 1, 2)
        ]
    lengths = {s: 0 for _, s in items}
    for _, syms in packages[: len(items) - 1]:
        for s in syms:
            lengths[s] += 1
    return lengths


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) in canonical (length, symbol) order."""
    code = 0
    prev = 0
    out: dict[int, tuple[int, int]] = {}
    for sym in sorted((s for s, l in lengths.items() if l > 0), key=lambda s: (lengths[s], s)):
        length = lengths[sym]
        code <<= length - prev
        out[sym] = (code, length)
        code += 1
        prev = length
    return out


def _write_tree(bw: _BitWriter, hist: dict[int, int], alphabet: int) -> dict[int, tuple[int, int]]:
    """Serialize one prefix code (simple form for <=2 symbols, else the
    code-length-coded form with 17/18 zero-run codes) and return the
    symbol->(code,length) map for the payload writer."""
    used = sorted(s for s, f in hist.items() if f > 0)
    if not used:
        used = [0]
        hist = {0: 1}
    if len(used) <= 2 and max(used) < 256:
        bw.write(1, 1)  # simple
        bw.write(len(used) - 1, 1)
        if len(used) == 1:
            s0 = used[0]
            if s0 < 2:
                bw.write(0, 1)  # 1-bit first symbol
                bw.write(s0, 1)
            else:
                bw.write(1, 1)
                bw.write(s0, 8)
            return {s0: (0, 0)}  # zero-bit code
        bw.write(1, 1)  # 8-bit first symbol
        bw.write(used[0], 8)
        bw.write(used[1], 8)
        return {used[0]: (0, 1), used[1]: (1, 1)}
    # complex form
    lengths = _package_merge({s: hist[s] for s in used}, 15)
    bw.write(0, 1)
    # code-length sequence over the full alphabet with zero-run codes
    seq: list[tuple[int, int]] = []  # (code-length symbol, extra bits value or -1)
    i = 0
    while i < alphabet:
        l = lengths.get(i, 0)
        if l == 0:
            run = 0
            while i + run < alphabet and lengths.get(i + run, 0) == 0:
                run += 1
            rem = run
            while rem >= 11:
                take = min(rem, 138)
                seq.append((18, take - 11))
                rem -= take
            while rem >= 3:
                take = min(rem, 10)
                seq.append((17, take - 3))
                rem -= take
            for _ in range(rem):
                seq.append((0, -1))
            i += run
        else:
            seq.append((l, -1))
            i += 1
    lc_hist: dict[int, int] = {}
    for s, _ in seq:
        lc_hist[s] = lc_hist.get(s, 0) + 1
    lc_lengths = _package_merge(lc_hist, 7)
    if len([s for s in lc_hist if lc_hist[s] > 0]) == 1:
        # single code-length symbol: give it length 1 (decoder's zero-bit
        # single-symbol tree reads no bits; declared length may be 1)
        only = next(iter(lc_hist))
        lc_lengths = {only: 1}
    bw.write(19 - 4, 4)  # write all 19 code-length-code lengths
    for s in _CODE_LENGTH_ORDER:
        bw.write(lc_lengths.get(s, 0), 3)
    lc_codes = _canonical_codes(lc_lengths)
    if len(lc_codes) == 1:
        only = next(iter(lc_codes))
        lc_codes = {only: (0, 0)}  # decoder consumes zero bits
    bw.write(0, 1)  # no max_symbol
    for s, extra in seq:
        c, l = lc_codes[s]
        bw.write_code(c, l)
        if s == 17:
            bw.write(extra, 3)
        elif s == 18:
            bw.write(extra, 7)
    codes = _canonical_codes(lengths)
    if len(codes) == 1:
        only = next(iter(codes))
        codes = {only: (0, 0)}
    return codes


def _write_literal_image(bw: _BitWriter, px: list[int], meta_allowed: bool) -> None:
    """Entropy-code a pixel list as pure literals: no color cache, no meta
    prefix image, one prefix-code group."""
    bw.write(0, 1)  # no color cache
    if meta_allowed:
        bw.write(0, 1)  # no meta prefix image
    g_hist: dict[int, int] = {}
    r_hist: dict[int, int] = {}
    b_hist: dict[int, int] = {}
    a_hist: dict[int, int] = {}
    for argb in px:
        g_hist[(argb >> 8) & 0xFF] = g_hist.get((argb >> 8) & 0xFF, 0) + 1
        r_hist[(argb >> 16) & 0xFF] = r_hist.get((argb >> 16) & 0xFF, 0) + 1
        b_hist[argb & 0xFF] = b_hist.get(argb & 0xFF, 0) + 1
        a_hist[(argb >> 24) & 0xFF] = a_hist.get((argb >> 24) & 0xFF, 0) + 1
    g_codes = _write_tree(bw, g_hist, _NUM_LITERALS + _NUM_LENGTH_CODES)
    r_codes = _write_tree(bw, r_hist, 256)
    b_codes = _write_tree(bw, b_hist, 256)
    a_codes = _write_tree(bw, a_hist, 256)
    _write_tree(bw, {0: 1}, _NUM_DISTANCE_CODES)  # unused distance tree
    for argb in px:
        c, l = g_codes[(argb >> 8) & 0xFF]
        bw.write_code(c, l)
        c, l = r_codes[(argb >> 16) & 0xFF]
        bw.write_code(c, l)
        c, l = b_codes[argb & 0xFF]
        bw.write_code(c, l)
        c, l = a_codes[(argb >> 24) & 0xFF]
        bw.write_code(c, l)


def encode_webp_lossless(
    width: int,
    height: int,
    rgba: bytes,
    *,
    subtract_green: bool = False,
    predictor_mode: int | None = None,
    palette: bool = False,
    color_cte: tuple[int, int, int] | None = None,
) -> bytes:
    """Encode RGBA bytes to a genuine VP8L WebP (fixture/round-trip lane).
    Literal-only entropy coding with real canonical prefix codes; optional
    forward transforms exercise the decoder's inverse paths: SUBTRACT_GREEN,
    a single-mode PREDICTOR (one block covering the image, modes 0-13),
    COLOR_INDEXING (<=256 distinct colors, packed when small), and the
    cross-COLOR transform with one fixed element ``color_cte =
    (green_to_red, green_to_blue, red_to_blue)`` bytes covering the image."""
    if len(rgba) != width * height * 4:
        raise ValueError("rgba length mismatch")
    if not 1 <= width <= 1 << 14 or not 1 <= height <= 1 << 14:
        raise ValueError("dimensions out of VP8L range")
    px = [
        (rgba[4 * i + 3] << 24) | (rgba[4 * i] << 16) | (rgba[4 * i + 1] << 8) | rgba[4 * i + 2]
        for i in range(width * height)
    ]
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(int(any(p >> 24 != 0xFF for p in px)), 1)
    bw.write(0, 3)  # version
    coded_w = width

    if palette:
        colors: list[int] = []
        index_of: dict[int, int] = {}
        for p in px:
            if p not in index_of:
                index_of[p] = len(colors)
                colors.append(p)
        if len(colors) > 256:
            raise ValueError("palette transform needs <=256 distinct colors")
        n = len(colors)
        pack_bits = 3 if n <= 2 else 2 if n <= 4 else 1 if n <= 16 else 0
        bw.write(1, 1)
        bw.write(_COLOR_INDEXING, 2)
        bw.write(n - 1, 8)
        # delta-code the palette componentwise
        deltas = []
        prev = 0
        for c in colors:
            d = (
                (((c >> 24) - (prev >> 24)) & 0xFF) << 24
                | ((((c >> 16) & 0xFF) - ((prev >> 16) & 0xFF)) & 0xFF) << 16
                | ((((c >> 8) & 0xFF) - ((prev >> 8) & 0xFF)) & 0xFF) << 8
                | (((c & 0xFF) - (prev & 0xFF)) & 0xFF)
            )
            deltas.append(d)
            prev = c
        _write_literal_image(bw, deltas, meta_allowed=False)
        # pack indices into the green channel
        coded_w = _subsample_size(width, pack_bits)
        bpp = 8 >> pack_bits
        per = 1 << pack_bits
        packed: list[int] = []
        for y in range(height):
            for cx in range(coded_w):
                g = 0
                for k in range(per):
                    x = cx * per + k
                    if x < width:
                        g |= index_of[px[y * width + x]] << (k * bpp)
                packed.append(0xFF000000 | (g << 8))
        px = packed
    if subtract_green:
        bw.write(1, 1)
        bw.write(_SUBTRACT_GREEN, 2)
        px = [
            (p & 0xFF00FF00)
            | ((((p >> 16) & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF) << 16
            | ((p & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF
            for p in px
        ]
    if color_cte is not None:
        if palette:
            raise ValueError("fixture encoder: color transform over palette unsupported")
        g2r, g2b, r2b = color_cte
        if not all(0 <= v <= 255 for v in (g2r, g2b, r2b)):
            raise ValueError("color transform element bytes out of range")
        size_bits = _single_block_size_bits(width, height, "color transform")
        bw.write(1, 1)
        bw.write(_COLOR, 2)
        bw.write(size_bits - 2, 3)
        _write_literal_image(
            bw, [0xFF000000 | (r2b << 16) | (g2b << 8) | g2r], meta_allowed=False
        )
        # forward: the inverse ADDS delta(g2r, green) to red and
        # delta(g2b, green) + delta(r2b, RESTORED red) to blue, so the
        # stored channels subtract those deltas of the ORIGINAL values
        fwd = []
        for p in px:
            green = (p >> 8) & 0xFF
            red = (p >> 16) & 0xFF
            blue = p & 0xFF
            s_red = (red - _ct_delta(g2r, green)) & 0xFF
            s_blue = (blue - _ct_delta(g2b, green) - _ct_delta(r2b, red)) & 0xFF
            fwd.append((p & 0xFF00FF00) | (s_red << 16) | s_blue)
        px = fwd
    if predictor_mode is not None:
        if not 0 <= predictor_mode <= 13:
            raise ValueError("predictor mode out of range")
        if palette:
            raise ValueError("fixture encoder: predictor over palette unsupported")
        size_bits = _single_block_size_bits(width, height, "predictor")
        bw.write(1, 1)
        bw.write(_PREDICTOR, 2)
        bw.write(size_bits - 2, 3)
        _write_literal_image(
            bw, [0xFF000000 | (predictor_mode << 8)], meta_allowed=False
        )
        # forward transform: residual = pixel - prediction (per channel),
        # predictions computed from the ALREADY-FINAL pixels (decoder
        # reconstructs incrementally, so forward uses original neighbors)
        res: list[int] = []
        tr = _Transform(_PREDICTOR, coded_w, height)
        tr.size_bits = size_bits
        tr.data = [0xFF000000 | (predictor_mode << 8)]
        w = coded_w
        for y in range(height):
            for x in range(w):
                i = y * w + x
                if i == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = px[i - 1]
                elif x == 0:
                    pred = px[i - w]
                else:
                    left, top, tl, trp = px[i - 1], px[i - w], px[i - w - 1], px[i - w + 1]
                    pred = {
                        0: 0xFF000000, 1: left, 2: top, 3: trp, 4: tl,
                        5: _avg2(_avg2(left, trp), top),
                        6: _avg2(left, tl), 7: _avg2(left, top),
                        8: _avg2(tl, top), 9: _avg2(top, trp),
                        10: _avg2(_avg2(left, tl), _avg2(top, trp)),
                        11: _select(top, left, tl),
                        12: _clamp_add_full(left, top, tl),
                        13: _clamp_add_half(left, top, tl),
                    }[predictor_mode]
                res.append(
                    (((px[i] >> 24) - (pred >> 24)) & 0xFF) << 24
                    | ((((px[i] >> 16) & 0xFF) - ((pred >> 16) & 0xFF)) & 0xFF) << 16
                    | ((((px[i] >> 8) & 0xFF) - ((pred >> 8) & 0xFF)) & 0xFF) << 8
                    | (((px[i] & 0xFF) - (pred & 0xFF)) & 0xFF)
                )
        px = res
    bw.write(0, 1)  # end of transforms
    _write_literal_image(bw, px, meta_allowed=True)
    payload = bw.done()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def encode_webp_lossy_flat(
    mb_w: int,
    mb_h: int,
    lumas: list[int],
    modes: list[int] | None = None,
) -> bytes:
    """Wrap :func:`vp8.encode_vp8_flat` in a WebP RIFF container — a
    genuine LOSSY "VP8 " still whose flat-macroblock content the integer
    transforms reconstruct exactly (see vp8.py module docstring)."""
    payload = _vp8.encode_vp8_flat(mb_w, mb_h, lumas, modes=modes)
    chunk = b"VP8 " + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def decode_webp_planes(data: bytes) -> tuple[int, int, bytes, bytes, bytes]:
    """Decode a LOSSY WebP to its native (width, height, Y, U, V) planes —
    no YUV->RGB presentation conversion, so Y-plane statistics stay
    integer-exact for the oracle gate.  Lossless (VP8L) frames raise
    ValueError (their native space is RGBA; use :func:`decode_webp`)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    riff_size = struct.unpack_from("<I", data, 4)[0]
    end = min(len(data), 8 + riff_size)
    pos = 12
    try:
        while pos + 8 <= end:
            tag = data[pos : pos + 4]
            size = struct.unpack_from("<I", data, pos + 4)[0]
            if pos + 8 + size > end:
                raise ValueError("truncated chunk")
            payload = data[pos + 8 : pos + 8 + size]
            if tag == b"VP8 ":
                return _vp8.decode_vp8(payload)
            if tag == b"VP8L":
                raise ValueError("lossless WebP has no YUV planes")
            if tag == b"ALPH":
                # same honest boundary as the RGBA lane: skipping it
                # would return planes whose alpha is silently dropped
                raise NotImplementedError(
                    "lossy alpha (ALPH) not implemented"
                )
            if tag in (b"ANIM", b"ANMF"):
                raise NotImplementedError("animated WebP not implemented")
            pos += 8 + size + (size & 1)
    except (struct.error, IndexError, OverflowError, MemoryError) as e:
        raise ValueError(f"malformed WebP: {type(e).__name__}: {e}") from e
    raise ValueError("no VP8 chunk in WebP container")


# ---------------------------------------------------------------------------
# Animated WebP (VP8X + ANIM/ANMF) — r14: the GIF composition machinery's
# analogue over per-frame VP8L/VP8 payloads (WebP container spec;
# reference parity note: media decode is north-star scope, the reference
# stores Binary attributes only).
# ---------------------------------------------------------------------------


def _int24(b: bytes, off: int) -> int:
    return b[off] | (b[off + 1] << 8) | (b[off + 2] << 16)


def _pack24(v: int) -> bytes:
    return bytes((v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF))


def _decode_frame_payload(sub: bytes) -> tuple[int, int, bytes]:
    """Decode the image subchunks inside an ANMF payload to RGBA; ALPH
    (lossy alpha) is an honest NotImplementedError."""
    pos = 0
    while pos + 8 <= len(sub):
        tag = sub[pos : pos + 4]
        size = struct.unpack_from("<I", sub, pos + 4)[0]
        if pos + 8 + size > len(sub):
            raise ValueError("truncated frame subchunk")
        payload = sub[pos + 8 : pos + 8 + size]
        if tag == b"ALPH":
            raise NotImplementedError("lossy alpha (ALPH) not implemented")
        if tag == b"VP8L":
            w, h, _ch, px = _decode_vp8l(payload)
            return w, h, px
        if tag == b"VP8 ":
            w, h, y, u, v = _vp8.decode_vp8(payload)
            return w, h, _vp8.yuv420_to_rgba(w, h, y, u, v)
        pos += 8 + size + (size & 1)
    raise ValueError("no image chunk in ANMF frame")


def iter_webp_frames_composed(data: bytes, with_duration: bool = False):
    """Yield each animation frame COMPOSED onto the canvas —
    ``(width, height, 4, rgba)`` tuples (prefixed with the frame's
    duration in ms when ``with_duration``) — honoring frame offsets,
    alpha blending vs replacement, and dispose-to-background, per the
    WebP container spec's pseudocode (integer arithmetic; fixtures keep
    alpha in {0, 255} so no hash depends on blend rounding).  Composition
    state is one canvas; decode is lazy, so a caller over crawl bytes can
    bank the head frames before a mid-stream corruption raises (the GIF
    iterators' banking contract)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    riff_size = struct.unpack_from("<I", data, 4)[0]
    end = min(len(data), 8 + riff_size)
    pos = 12
    canvas_w = canvas_h = 0
    bg = (0, 0, 0, 0)
    canvas: bytearray | None = None
    saw_anim = False
    n_frames = 0
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        if pos + 8 + size > end:
            raise ValueError("truncated chunk")
        payload = data[pos + 8 : pos + 8 + size]
        if tag == b"VP8X":
            if size < 10:
                raise ValueError("truncated VP8X header")
            canvas_w = _int24(payload, 4) + 1
            canvas_h = _int24(payload, 7) + 1
            if canvas_w * canvas_h > MAX_PIXELS:
                raise ValueError("canvas too large")
        elif tag == b"ANIM":
            if size < 6:
                raise ValueError("truncated ANIM chunk")
            # background color is stored Blue, Green, Red, Alpha
            bg = (payload[2], payload[1], payload[0], payload[3])
            saw_anim = True
            if canvas_w == 0:
                raise ValueError("ANIM without VP8X canvas")
            canvas = bytearray(canvas_w * canvas_h * 4)
        elif tag == b"ANMF":
            if not saw_anim or canvas is None:
                raise ValueError("ANMF without ANIM header")
            if size < 16:
                raise ValueError("truncated ANMF header")
            fx = _int24(payload, 0) * 2
            fy = _int24(payload, 3) * 2
            fw = _int24(payload, 6) + 1
            fh = _int24(payload, 9) + 1
            dur = _int24(payload, 12)
            flags = payload[15]
            dispose_bg = bool(flags & 0x01)
            no_blend = bool(flags & 0x02)
            if fx + fw > canvas_w or fy + fh > canvas_h:
                raise ValueError("frame rect outside canvas")
            w, h, px = _decode_frame_payload(payload[16:])
            if (w, h) != (fw, fh):
                raise ValueError("frame dimensions disagree with ANMF header")
            # the shared SOURCE/OVER compositor (gif.py, review r14)
            blend_rgba_rect(
                canvas, canvas_w, px, fx, fy, fw, fh, over=not no_blend
            )
            out = (canvas_w, canvas_h, 4, bytes(canvas))
            yield (dur,) + out if with_duration else out
            n_frames += 1
            if dispose_bg:
                fill = bytes(bg)
                for j in range(fh):
                    crow = ((fy + j) * canvas_w + fx) * 4
                    for i in range(fw):
                        canvas[crow + 4 * i : crow + 4 * i + 4] = fill
        pos += 8 + size + (size & 1)
    if not saw_anim:
        raise ValueError("not an animated WebP")
    if n_frames == 0:
        raise ValueError("animated WebP with no frames")


def iter_time_sampled_composed_webp_frames(
    data: bytes, every_ms: int = 100, max_samples: int | None = 8
):
    """TIME-BASED sampling over the composed animation — the GIF
    ``iter_time_sampled_composed_frames`` contract in milliseconds:
    frame i is visible during [start_i, start_i + duration_i) with the
    last frame visible from its start onward (exactly one final sample);
    durations <= 10 ms are clamped to 100 ms (the browser convention for
    the common all-zero-duration file).  Yields
    ``(sample_idx, t_ms, frame_idx, (w, h, 4, rgba))`` lazily (head
    samples bank before a mid-stream corruption raises)."""
    if every_ms <= 0:
        raise ValueError("every_ms must be positive")
    return _iter_webp_time_samples(data, every_ms, max_samples)


def _iter_webp_time_samples(data: bytes, every_ms: int, max_samples: int | None):
    # ANMF durations are milliseconds; browsers clamp <=10 ms to 100
    yield from iter_time_samples_shared(
        iter_webp_frames_composed(data, with_duration=True),
        every_ms, max_samples, clamp_le=10, clamp_to=100,
    )


def encode_webp_anim(
    canvas_w: int,
    canvas_h: int,
    frames: list[dict],
    bg_rgba: tuple[int, int, int, int] = (0, 0, 0, 0),
    loop_count: int = 0,
) -> bytes:
    """Encode an animated WebP whose frames are VP8L-coded SUB-RECTS of
    the canvas — the fixture generator for the composed decode path
    (the ``encode_gif_animation_rects`` analogue).  Each frame dict:
    ``x``/``y`` (even, per the stored-halved container fields), ``w``,
    ``h``, ``rgba`` (w*h*4 bytes), ``duration_ms`` (default 100),
    ``blend`` (default True: alpha-composite onto the canvas; False
    replaces the rect), ``dispose_bg`` (default False: True fills the
    rect with ``bg_rgba`` after display)."""
    if not frames:
        raise ValueError("animation needs at least one frame")
    if canvas_w < 1 or canvas_h < 1 or canvas_w * canvas_h > MAX_PIXELS:
        raise ValueError("bad canvas dimensions")
    if canvas_w > (1 << 24) or canvas_h > (1 << 24):
        # each VP8X dimension field is 24 bits; _pack24 would silently
        # wrap (the encode_flac STREAMINFO lesson: refuse loudly)
        raise ValueError("canvas dimension exceeds the 24-bit VP8X field")
    if not 0 <= loop_count <= 0xFFFF:
        raise ValueError("loop_count out of range")
    chunks = []
    for f in frames:
        x, y = f.get("x", 0), f.get("y", 0)
        w, h = f["w"], f["h"]
        dur = f.get("duration_ms", 100)
        if x % 2 or y % 2:
            raise ValueError("frame offsets must be even")
        if x + w > canvas_w or y + h > canvas_h:
            raise ValueError("frame rect outside canvas")
        if not 0 <= dur < (1 << 24):
            raise ValueError("duration out of range")
        inner = encode_webp_lossless(w, h, f["rgba"])
        # slice the VP8L chunk (incl. pad) out of the still container
        sub = inner[12:]
        flags = (0x02 if not f.get("blend", True) else 0) | (
            0x01 if f.get("dispose_bg", False) else 0
        )
        payload = (
            _pack24(x // 2) + _pack24(y // 2)
            + _pack24(w - 1) + _pack24(h - 1)
            + _pack24(dur) + bytes([flags]) + sub
        )
        chunk = b"ANMF" + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            chunk += b"\x00"
        chunks.append(chunk)
    r, g, b, a = bg_rgba
    anim = b"ANIM" + struct.pack("<I", 6) + bytes((b, g, r, a)) + struct.pack(
        "<H", loop_count
    )
    vp8x_payload = bytes([0x02]) + b"\x00" * 3 + _pack24(canvas_w - 1) + _pack24(
        canvas_h - 1
    )
    vp8x = b"VP8X" + struct.pack("<I", 10) + vp8x_payload
    body = b"WEBP" + vp8x + anim + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def mean_luma_rgba(px: bytes, ch: int, w: int, h: int) -> int:
    """Rec.601 integer mean luma over a decoded RGB(A) buffer — the ONE
    shared implementation for the decode_features_webp operator loop and
    the fused webp gate (review r14).  Lazy numpy (gif.py precedent);
    exact int64 accumulation; alpha is excluded from the dot."""
    import numpy as np

    return int(
        (
            np.frombuffer(px, dtype=np.uint8)
            .astype(np.int64)
            .reshape(-1, ch)[:, :3]
            * np.array([299, 587, 114])
        ).sum()
    ) // (1000 * w * h)


def mean_luma_y(y: bytes, w: int, h: int) -> int:
    """Integer mean of a native Y plane (exact int64 sum) — shared by the
    decode_features_webp_lossy operator loop and the fused lossy gate
    (review r14)."""
    import numpy as np

    return int(np.frombuffer(y, dtype=np.uint8).sum(dtype=np.int64)) // (w * h)
