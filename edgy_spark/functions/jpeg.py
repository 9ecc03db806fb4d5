"""Minimal pure-stdlib baseline JPEG decoder — real lossy-image decode
without PIL/libjpeg.

Written against the public JPEG specification (ITU-T T.81 / ISO 10918-1:
marker segments, canonical Huffman tables, DC prediction + AC run-length
entropy coding, dequantization, 8x8 inverse DCT, chroma upsampling,
JFIF YCbCr->RGB).  The container ships no imaging library, so the
multimodal "real decode" path for the web's dominant image format gets an
actually-executing decoder built from ``struct`` + ``math`` alone — the
same from-spec pattern as the PNG (functions/png.py) and WAV
(functions/wav.py) codecs, cross-validated against the JVM's independent
``javax.imageio`` codec in tests/test_jpeg_real.py.

Scope (deliberately bounded, stated loudly):
- baseline and extended sequential DCT, Huffman coded (SOF0/SOF1),
  8-bit samples; 1 (grayscale) or 3 (JFIF YCbCr) components; any
  sampling factors (4:4:4 / 4:2:2 / 4:2:0 / ...), restart intervals;
  MULTI-SCAN sequential frames (r11, T.81 A.2.3) — components arriving
  in separate or partially-interleaved scans, as older encoders emit —
  decode through the same coefficient store the progressive path uses;
- progressive DCT, Huffman coded (SOF2, T.81 Annex G): spectral
  selection + successive approximation, DC/AC first and refinement
  scans, EOB runs, interleaved DC scans, restart intervals — scans
  accumulate into a per-block coefficient store, dequantized and
  inverse-transformed once at EOI;
- ADOBE CMYK/YCCK (r12): 4-component frames carrying the Adobe APP14
  marker decode to RGB.  Transform 0 takes components 0-2 as the stored
  (Adobe-inverted: 255 = no ink) CMY; transform 2 (YCCK) runs the YCbCr
  inverse and INVERTS the result (libjpeg's ycck_cmyk_convert emits
  255 - ycc_inverse, and the Adobe app-level inversion PIL/JDK apply
  lands the effective sample at 255 - ycc); both finish with the naive
  integer composition ``rgb = effective * k // 255``.  The JDK instead
  color-manages (sRGB-encodes the linear product); the cross-validation
  suite predicts the JDK's value from ours analytically.  A 4-component
  frame WITHOUT the APP14 marker is rejected (the CMYK polarity would
  be a guess);
- arithmetic coding, 12-bit, and hierarchical are rejected with a clear
  NotImplementedError;
- the IDCT is the exact floating-point T.81 definition (rounded then
  clamped) and chroma upsampling is sample replication — a COMPLIANT
  decode, but not bit-identical to libjpeg's integer IDCT + smoothing
  upsampler, so cross-validation asserts closeness (the spec itself
  only requires IDCT accuracy within a tolerance, T.83), with grayscale
  images — no upsampling path — held to the tightest bound.

There is deliberately no GENERAL encoder here: tests fabricate real
JPEGs through ``javax.imageio`` (an independent implementation shipping
with the JDK), so the decoder is never checked against bytes produced by
its own inverse.  The one exception is :func:`encode_jpeg_flat`, a
DC-only encoder for images whose 8x8 blocks are each a constant sample —
the single JPEG family whose decode is BIT-EXACT by construction (a
DC-only block inverse-transforms to DC/8 in every pixel, T.81 A.3.3), so
an SQL oracle can predict decoded pixel statistics and the driver's
value-hash gate can cover the full Huffman + dequantize + IDCT path.
Its output is cross-validated pixel-for-pixel against the JVM's
independent decoder (not just our own), keeping the no-self-inverse
property where it matters.
"""

from __future__ import annotations

import math
import struct

#: Decode-side resource bound: a malformed header must raise, never
#: allocate — 64M pixels caps the output buffer at ~256 MB RGBA, far above
#: any legitimate corpus asset and far below an OOM (review r11d).
MAX_PIXELS = 64_000_000

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# cos((2x+1) u pi / 16) * (C(u)/2) table for the exact T.81 IDCT
_COS = [
    [
        (0.5 * (1.0 / math.sqrt(2.0) if u == 0 else 1.0))
        * math.cos((2 * x + 1) * u * math.pi / 16.0)
        for u in range(8)
    ]
    for x in range(8)
]


class _Huff:
    """Canonical Huffman table (T.81 Annex C): codes assigned in order of
    increasing length, then value order within a length."""

    def __init__(self, bits: list[int], vals: bytes) -> None:
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lut[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """Entropy-coded segment reader: MSB-first bits, 0xFF00 byte
    unstuffing, stop at markers (restarts are consumed by the caller)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.bit = 0
        self.cur = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        p = self.pos
        if p >= len(d):
            raise ValueError("truncated entropy-coded data")
        b = d[p]
        if b == 0xFF:
            nxt = d[p + 1] if p + 1 < len(d) else None
            if nxt == 0x00:  # stuffed data byte — the hot case, keep flat
                self.pos = p + 2
            else:
                # T.81 B.1.1.2: any marker may be preceded by any number
                # of 0xFF fill bytes — skip the run, then classify the
                # byte after it (stuffed-zero, restart, or a real marker)
                q = p + 1
                nd = len(d)
                while q < nd and d[q] == 0xFF:
                    q += 1
                nxt = d[q] if q < nd else None
                if nxt == 0x00:
                    self.pos = q + 1  # stuffed 0xFF (the run was fill)
                elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                    raise _RestartMarker(q - 1)
                elif nxt is None:
                    raise ValueError("truncated entropy-coded data")
                else:
                    raise ValueError(
                        f"unexpected marker 0xFF{nxt:02X} in scan"
                    )
        else:
            self.pos = p + 1
        self.cur = b
        self.nbits = 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table: _Huff) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            v = table.lut.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid Huffman code")

    def align_to_marker(self) -> None:
        """Drop partial byte; position must sit on a 0xFFxx marker."""
        self.nbits = 0


class _RestartMarker(Exception):
    def __init__(self, at: int) -> None:
        self.at = at


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map magnitude bits to a signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _idct_block(coef: list[int]) -> list[int]:
    """Exact float 2D IDCT of one dequantized 8x8 block (natural order),
    +128 level shift, rounded and clamped to [0, 255]."""
    if not any(coef[1:]):
        # DC-only shortcut (libjpeg's idct 1x1 special case): the general
        # path reduces to round(C00 * (C00 * dc)) for every pixel — the
        # SAME float ops in the SAME order (0.0 + z == z), so this is
        # bit-identical to the full separable transform, ~6x faster on
        # flat blocks (tests/test_jpeg_real.py pins the equivalence)
        s = int(round(_COS[0][0] * (_COS[0][0] * coef[0]))) + 128
        v = 0 if s < 0 else (255 if s > 255 else s)
        return [v] * 64
    # rows then columns (separable)
    tmp = [0.0] * 64
    for y in range(8):
        row = coef[y * 8:y * 8 + 8]
        if not any(row):
            continue
        for x in range(8):
            acc = 0.0
            cx = _COS[x]
            for u in range(8):
                if row[u]:
                    acc += cx[u] * row[u]
            tmp[y * 8 + x] = acc
    out = [0] * 64
    for x in range(8):
        col = [tmp[y * 8 + x] for y in range(8)]
        for y in range(8):
            acc = 0.0
            cy = _COS[y]
            for v in range(8):
                acc += cy[v] * col[v]
            s = int(round(acc)) + 128
            out[y * 8 + x] = 0 if s < 0 else (255 if s > 255 else s)
    return out


def _decode_jpeg(data: bytes, raw_lossless: bool = False):
    """Decode a baseline/extended-sequential (SOF0/SOF1), progressive
    (SOF2), or lossless (SOF3) JPEG into ``(width, height, channels,
    pixels)`` — 8-bit samples, row-major, interleaved (RGB for
    3-component JFIF images, luma for grayscale).  With ``raw_lossless``
    a lossless frame returns ``(w, h, nc, precision, samples)`` with
    full-precision integer samples instead (the 2..16-bit API).  Raises
    ValueError on malformed input and NotImplementedError on
    out-of-scope features."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, list[int]] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    restart_interval = 0
    frame = None
    store = None  # progressive: per-component quantized-coefficient blocks
    adobe_transform = None  # APP14 color-transform flag (CMYK/YCCK)
    i = 2
    n = len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            raise ValueError("marker expected")
        marker = data[i + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[i + 2:i + 4])
        seg = data[i + 4:i + 2 + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq == 0:
                    tbl = list(seg[p:p + 64])
                    p += 64
                elif pq == 1:
                    tbl = list(struct.unpack(">64H", seg[p:p + 128]))
                    p += 128
                else:
                    raise ValueError("bad DQT precision")
                nat = [0] * 64
                for k in range(64):
                    nat[_ZIGZAG[k]] = tbl[k]
                qt[tq] = nat
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                vals = seg[p + 17:p + 17 + nv]
                (huff_dc if tc == 0 else huff_ac)[th] = _Huff(bits, vals)
                p += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0 / SOF1 / SOF2
            if raw_lossless:
                # the lossless API must not pay a full DCT decode just to
                # reject a baseline/progressive input (review r14)
                raise ValueError("not a lossless (SOF3) JPEG")
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit samples (only 8)")
            if nc not in (1, 3, 4):
                raise NotImplementedError(f"{nc} components (only 1, 3 or 4)")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + c * 3:9 + c * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            if w * h > MAX_PIXELS:
                raise ValueError(
                    f"implausible dimensions {w}x{h} (> MAX_PIXELS)"
                )
            frame = {"w": w, "h": h, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker == 0xC3:  # SOF3: lossless sequential (T.81 Annex H)
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if w == 0 or h == 0:
                # same loud refusal as _decode_scan: downstream sample
                # math divides by w*h (review r14 pass 2)
                raise ValueError("zero-dimension JPEG")
            if not 2 <= prec <= 16:
                raise ValueError(f"bad lossless precision {prec}")
            if nc < 1 or nc > 4:
                raise NotImplementedError(f"{nc} components")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + c * 3:9 + c * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            if w * h > MAX_PIXELS:
                raise ValueError(
                    f"implausible dimensions {w}x{h} (> MAX_PIXELS)"
                )
            frame = {"w": w, "h": h, "comps": comps, "progressive": False,
                     "lossless": True, "prec": prec}
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"SOF marker 0xFF{marker:02X}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xEE and seg[:5] == b"Adobe" and len(seg) >= 12:
            # APP14: "Adobe" + version(2) + flags0(2) + flags1(2) +
            # color transform (0 = CMYK/RGB passthrough, 1 = YCbCr,
            # 2 = YCCK) — the public tag that disambiguates 4-component
            # color AND marks the inverted-sample convention
            adobe_transform = seg[11]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            frame["adobe"] = adobe_transform
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + c * 2:3 + c * 2]
                ci = next(
                    (
                        j
                        for j, x in enumerate(frame["comps"])
                        if x["id"] == cs
                    ),
                    None,
                )
                if ci is None:
                    raise ValueError("scan references unknown component")
                scan.append((ci, frame["comps"][ci], tt >> 4, tt & 0xF))
            if frame.get("lossless"):
                ss, se, ahal = seg[1 + ns * 2:4 + ns * 2]
                w, h, nc, prec, samples = _lossless_scan(
                    data, i + 2 + seglen, frame, scan,
                    ss, ahal & 0xF, huff_dc, restart_interval,
                )
                if raw_lossless:
                    return w, h, nc, prec, samples
                if prec != 8:
                    raise ValueError(
                        f"{prec}-bit lossless samples exceed the 8-bit "
                        "pixel API — use decode_jpeg_lossless"
                    )
                return w, h, nc, bytes(samples)
            if frame["progressive"]:
                ss, se, ahal = seg[1 + ns * 2:4 + ns * 2]
                if store is None:
                    store = _alloc_store(frame)
                i = _progressive_scan(
                    data, i + 2 + seglen, frame, scan,
                    ss, se, ahal >> 4, ahal & 0xF,
                    store, huff_dc, huff_ac, restart_interval,
                )
                continue  # i sits ON the next marker
            if len(scan) != len(frame["comps"]) or store is not None:
                # sequential MULTI-SCAN (T.81 A.2.3, r11): the components
                # arrive in separate (possibly partially-interleaved)
                # scans — common from older encoders.  Reuse the
                # progressive coefficient store: each scan deposits its
                # components' full-band quantized coefficients; dequantize
                # + IDCT happen once at EOI via _finish_progressive.
                if store is None:
                    store = _alloc_store(frame)
                i = _sequential_scan(
                    data, i + 2 + seglen, frame, scan,
                    store, huff_dc, huff_ac, restart_interval,
                )
                continue  # i sits ON the next marker
            return _decode_scan(
                data, i + 2 + seglen, frame,
                [(c, tdc, tac) for _, c, tdc, tac in scan],
                qt, huff_dc, huff_ac, restart_interval,
            )
        # APPn / COM / others: skipped
        i += 2 + seglen
    if store is not None:
        return _finish_progressive(frame, qt, store)
    raise ValueError("no scan data (missing SOS)")



def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Public entry point over :func:`_decode_jpeg` (see it for the format
    contract): EVERY malformed-input failure surfaces as ValueError
    (struct/index errors from fuzzed or truncated crawl bytes are
    normalized) so per-row error capture can catch one exception type."""
    try:
        return _decode_jpeg(data)
    except (ValueError, NotImplementedError):
        raise
    except (struct.error, IndexError, KeyError, OverflowError,
            ZeroDivisionError) as e:
        raise ValueError(f"malformed JPEG: {type(e).__name__}: {e}") from e


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    if w == 0 or h == 0:
        raise ValueError("zero-dimension JPEG")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1:
        raise ValueError("bad sampling factors")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-component sample planes at the component's own resolution
    planes = []
    for c in comps:
        cw, ch = mcux * c["h"] * 8, mcuy * c["v"] * 8
        planes.append(bytearray(cw * ch))
        c["cw"], c["ch"] = cw, ch
    pred = [0] * len(comps)
    r = _BitReader(data, pos)
    mcu_count = 0
    next_rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count == restart_interval:
                # consume the RSTn marker the reader stopped at (shared
                # with the progressive path — skips T.81 fill bytes too)
                r, next_rst = _consume_restart(data, r, next_rst)
                pred = [0] * len(comps)
                mcu_count = 0
            try:
                for ci, (c, tdc, tac) in enumerate(scan):
                    q = qt.get(c["tq"])
                    if q is None:
                        raise ValueError("missing quantization table")
                    dc_t = huff_dc.get(tdc)
                    ac_t = huff_ac.get(tac)
                    if dc_t is None or ac_t is None:
                        raise ValueError("missing Huffman table")
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            coef = [0] * 64
                            t = r.decode_huff(dc_t)
                            if t > 11:
                                raise ValueError("bad DC category")
                            pred[ci] += _extend(r.receive(t), t)
                            coef[0] = pred[ci] * q[0]
                            k = 1
                            while k < 64:
                                rs = r.decode_huff(ac_t)
                                rr, ss = rs >> 4, rs & 0xF
                                if ss == 0:
                                    if rr == 15:
                                        k += 16  # ZRL
                                        continue
                                    break  # EOB
                                k += rr
                                if k > 63:
                                    raise ValueError("AC index overflow")
                                zz = _ZIGZAG[k]
                                coef[zz] = _extend(r.receive(ss), ss) * q[zz]
                                k += 1
                            px = _idct_block(coef)
                            ox = (mx * c["h"] + bx) * 8
                            oy = (my * c["v"] + by) * 8
                            plane = planes[ci]
                            cw = c["cw"]
                            for yy in range(8):
                                base = (oy + yy) * cw + ox
                                plane[base:base + 8] = bytes(
                                    px[yy * 8:yy * 8 + 8]
                                )
            except _RestartMarker as e:
                raise ValueError(
                    f"restart marker inside MCU at byte {e.at}"
                ) from None
            mcu_count += 1
    return _planes_to_pixels(w, h, comps, planes, hmax, vmax, frame.get("adobe"))


def _planes_to_pixels(w, h, comps, planes, hmax, vmax, adobe=None):
    """Upsample the per-component sample planes to full resolution and
    color-convert (shared by the sequential and progressive paths).
    4-component (Adobe CMYK/YCCK) frames return 3-channel RGB via the
    naive non-ICC conversion — see the module docstring."""
    nc = len(comps)
    if nc == 4:
        return _cmyk_to_rgb(w, h, comps, planes, hmax, vmax, adobe)
    out = bytearray(w * h * nc)
    if nc == 1:
        c = comps[0]
        cw = c["cw"]
        for y in range(h):
            row = planes[0][y * cw:y * cw + w]
            out[y * w:(y + 1) * w] = row
        return w, h, 1, bytes(out)
    # Adobe APP14 transform 0 on a 3-component frame means the samples
    # are STORED RGB, not YCbCr (libjpeg's jdcolor honors this); running
    # them through the YCbCr inverse would garble every pixel silently.
    # Same for APP14-less frames whose component IDs literally spell
    # 'R','G','B' (libjpeg jdmaster's fallback guess).  Otherwise 3
    # components are JFIF YCbCr.
    rgb_stored = nc == 3 and (
        adobe == 0
        or (adobe is None and [c["id"] for c in comps] == [0x52, 0x47, 0x42])
    )
    for y in range(h):
        for ci, c in enumerate(comps):
            c[f"_row"] = (y * c["v"]) // vmax * c["cw"]
        yrow, brow, rrow = (
            planes[0], planes[1], planes[2],
        )
        y0 = comps[0]["_row"]
        b0 = comps[1]["_row"]
        r0 = comps[2]["_row"]
        if rgb_stored:
            for x in range(w):
                o = (y * w + x) * 3
                out[o] = yrow[y0 + (x * comps[0]["h"]) // hmax]
                out[o + 1] = brow[b0 + (x * comps[1]["h"]) // hmax]
                out[o + 2] = rrow[r0 + (x * comps[2]["h"]) // hmax]
            continue
        for x in range(w):
            lum = yrow[y0 + (x * comps[0]["h"]) // hmax]
            cb = brow[b0 + (x * comps[1]["h"]) // hmax] - 128
            cr = rrow[r0 + (x * comps[2]["h"]) // hmax] - 128
            # JFIF (CCIR 601) conversion, rounded and clamped
            rv = int(round(lum + 1.402 * cr))
            gv = int(round(lum - 0.344136 * cb - 0.714136 * cr))
            bv = int(round(lum + 1.772 * cb))
            o = (y * w + x) * 3
            out[o] = 0 if rv < 0 else (255 if rv > 255 else rv)
            out[o + 1] = 0 if gv < 0 else (255 if gv > 255 else gv)
            out[o + 2] = 0 if bv < 0 else (255 if bv > 255 else bv)
    return w, h, 3, bytes(out)


def _cmyk_to_rgb(w, h, comps, planes, hmax, vmax, adobe):
    """Adobe 4-component color path: YCCK (transform 2) inverts the
    YCbCr transform on components 0-2 first; transform 0 takes them as
    stored.  Either way the stored samples follow the Adobe INVERTED
    convention (255 = no ink), so the naive CMYK->RGB composition is the
    exact integer ``rgb = stored * k // 255`` — no floats beyond the
    shared (IEEE-exact at Cb=Cr=128) YCbCr inverse, so flat-block
    fixtures stay SQL-predictable."""
    if adobe is None:
        raise NotImplementedError(
            "4-component JPEG without Adobe APP14 (CMYK polarity unknown)"
        )
    if adobe not in (0, 2):
        raise ValueError(f"Adobe transform {adobe} invalid for 4 components")
    out = bytearray(w * h * 3)
    for y in range(h):
        rows = [((y * c["v"]) // vmax) * c["cw"] for c in comps]
        p0, p1, p2, p3 = planes
        r0, r1, r2, r3 = rows
        h0, h1, h2, h3 = (c["h"] for c in comps)
        for x in range(w):
            k_ = p3[r3 + (x * h3) // hmax]
            if adobe == 2:
                # YCCK: YCbCr inverse, then INVERT — the libjpeg
                # convention (jdcolor.c ycck_cmyk_convert emits
                # 255 - ycc_inverse) composed with the Adobe app-level
                # inversion exactly as PIL and the JDK apply it; verified
                # against javax.imageio in tests/test_jpeg_real.py
                lum = p0[r0 + (x * h0) // hmax]
                cb = p1[r1 + (x * h1) // hmax] - 128
                cr = p2[r2 + (x * h2) // hmax] - 128
                cv = int(round(lum + 1.402 * cr))
                mv = int(round(lum - 0.344136 * cb - 0.714136 * cr))
                yv = int(round(lum + 1.772 * cb))
                cv = 255 if cv < 0 else (0 if cv > 255 else 255 - cv)
                mv = 255 if mv < 0 else (0 if mv > 255 else 255 - mv)
                yv = 255 if yv < 0 else (0 if yv > 255 else 255 - yv)
            else:  # transform 0: stored inverted CMY directly
                cv = p0[r0 + (x * h0) // hmax]
                mv = p1[r1 + (x * h1) // hmax]
                yv = p2[r2 + (x * h2) // hmax]
            o = (y * w + x) * 3
            out[o] = cv * k_ // 255
            out[o + 1] = mv * k_ // 255
            out[o + 2] = yv * k_ // 255
    return w, h, 3, bytes(out)


# ---------------------------------------------------------------------------
# progressive decode (T.81 Annex G: spectral selection + successive
# approximation).  Scans accumulate QUANTIZED coefficients into a
# per-component block store (natural order); dequantize + IDCT happen once
# at EOI.  The refinement control flow mirrors the spec's G.1.2.2-G.1.2.3
# (the same structure libjpeg's jdphuff.c implements).
# ---------------------------------------------------------------------------


def _alloc_store(frame) -> list[list[list[int]]]:
    """Per-component coefficient store sized to the MCU-padded block grid
    (interleaved DC scans walk the padded grid; non-interleaved scans walk
    the component's actual blocks inside it)."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1:
        raise ValueError("bad sampling factors")
    w, h = frame["w"], frame["h"]
    if w == 0 or h == 0:
        raise ValueError("zero-dimension JPEG")
    frame["hmax"], frame["vmax"] = hmax, vmax
    frame["mcux"] = -(-w // (8 * hmax))
    frame["mcuy"] = -(-h // (8 * vmax))
    store = []
    for c in comps:
        bw_m = frame["mcux"] * c["h"]
        bh_m = frame["mcuy"] * c["v"]
        c["bw_m"] = bw_m
        # actual (non-padded) block dims, for non-interleaved scans
        comp_w = -(-(w * c["h"]) // hmax)
        comp_h = -(-(h * c["v"]) // vmax)
        c["bw"] = -(-comp_w // 8)
        c["bh"] = -(-comp_h // 8)
        store.append([[0] * 64 for _ in range(bw_m * bh_m)])
    return store


def _next_marker(data: bytes, pos: int) -> int:
    """Position of the next real marker at/after ``pos`` — skips entropy
    bytes, stuffed 0xFF00, stray RSTn, and 0xFF fill runs."""
    n = len(data)
    p = pos
    while p + 1 < n:
        if data[p] != 0xFF or data[p + 1] == 0x00:
            p += 1
        elif data[p + 1] == 0xFF:
            p += 1  # fill byte
        elif 0xD0 <= data[p + 1] <= 0xD7:
            p += 2  # stray restart between scans: tolerate
        else:
            return p
    raise ValueError("truncated JPEG (no marker after scan)")


def _consume_restart(data: bytes, r: "_BitReader", next_rst: int):
    """Expect and consume the next RSTn; returns a fresh reader after it."""
    r.align_to_marker()
    p = r.pos
    n = len(data)
    while p + 1 < n:
        if data[p] != 0xFF or data[p + 1] == 0x00:
            p += 1
        elif data[p + 1] == 0xFF:
            p += 1  # fill byte before the marker (T.81 B.1.1.2)
        else:
            break
    if p + 1 >= n or not (0xD0 <= data[p + 1] <= 0xD7):
        raise ValueError("expected restart marker")
    if data[p + 1] != 0xD0 + next_rst:
        raise ValueError("restart marker out of sequence")
    return _BitReader(data, p + 2), (next_rst + 1) & 7


def _dc_first(r, dc_t, pred, si, blk, al) -> None:
    t = r.decode_huff(dc_t)
    if t > 11:
        raise ValueError("bad DC category")
    pred[si] += _extend(r.receive(t), t)
    blk[0] = pred[si] << al


def _dc_refine(r, blk, al) -> None:
    if r.read_bit():
        blk[0] |= 1 << al


def _ac_first(r, ac_t, blk, ss, se, al, eobrun) -> None:
    if eobrun[0] > 0:
        eobrun[0] -= 1
        return
    k = ss
    while k <= se:
        rs = r.decode_huff(ac_t)
        rr, s = rs >> 4, rs & 0xF
        if s == 0:
            if rr == 15:
                k += 16  # ZRL
                continue
            eobrun[0] = (1 << rr) - 1  # this block is run member #1
            if rr:
                eobrun[0] += r.receive(rr)
            break
        k += rr
        if k > se:
            raise ValueError("AC index overflow")
        blk[_ZIGZAG[k]] = _extend(r.receive(s), s) << al
        k += 1


def _ac_refine(r, ac_t, blk, ss, se, al, eobrun) -> None:
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun[0] == 0:
        while k <= se:
            rs = r.decode_huff(ac_t)
            rr, s = rs >> 4, rs & 0xF
            if s == 0:
                if rr != 15:
                    eobrun[0] = 1 << rr
                    if rr:
                        eobrun[0] += r.receive(rr)
                    break
                val = None  # ZRL: 16 zero-history coefficients, no new one
            else:
                if s != 1:
                    raise ValueError("bad AC refinement size")
                val = p1 if r.read_bit() else m1
            # advance: append a correction bit to every already-nonzero
            # coefficient passed over; count rr zero-history positions
            while k <= se:
                zz = _ZIGZAG[k]
                if blk[zz] != 0:
                    if r.read_bit() and (blk[zz] & p1) == 0:
                        blk[zz] += p1 if blk[zz] >= 0 else m1
                else:
                    rr -= 1
                    if rr < 0:
                        break
                k += 1
            if val is not None:
                if k > se:
                    raise ValueError("AC refinement overflow")
                blk[_ZIGZAG[k]] = val
            k += 1
    if eobrun[0] > 0:
        # inside an EOB run: only correction bits for nonzero history
        while k <= se:
            zz = _ZIGZAG[k]
            if blk[zz] != 0:
                if r.read_bit() and (blk[zz] & p1) == 0:
                    blk[zz] += p1 if blk[zz] >= 0 else m1
            k += 1
        eobrun[0] -= 1


def _progressive_scan(
    data, pos, frame, scan, ss, se, ah, al, store, huff_dc, huff_ac, ri
) -> int:
    """Decode ONE progressive scan into the coefficient store; returns the
    position of the marker following its entropy-coded data."""
    if ss == 0 and se != 0:
        raise ValueError("DC scan must have Se = 0")
    if ss > 0 and len(scan) != 1:
        raise ValueError("AC scans must be non-interleaved")
    if ss > 63 or se > 63 or ss > se:
        raise ValueError("bad spectral selection")
    r = _BitReader(data, pos)
    pred = [0] * len(scan)
    eobrun = [0]
    next_rst = 0
    unit = 0

    def tables(ci, c, tdc, tac):
        if ss == 0:
            if ah == 0:
                t = huff_dc.get(tdc)
                if t is None:
                    raise ValueError("missing Huffman table")
                return t
            return None  # DC refinement reads raw bits
        t = huff_ac.get(tac)
        if t is None:
            raise ValueError("missing Huffman table")
        return t

    try:
        if len(scan) > 1:  # interleaved: DC scans only, MCU order
            for my in range(frame["mcuy"]):
                for mx in range(frame["mcux"]):
                    if ri and unit == ri:
                        r, next_rst = _consume_restart(data, r, next_rst)
                        pred = [0] * len(scan)
                        unit = 0
                    for si, (ci, c, tdc, tac) in enumerate(scan):
                        tbl = tables(ci, c, tdc, tac)
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                blk = store[ci][
                                    (my * c["v"] + by) * c["bw_m"]
                                    + mx * c["h"] + bx
                                ]
                                if ah == 0:
                                    _dc_first(r, tbl, pred, si, blk, al)
                                else:
                                    _dc_refine(r, blk, al)
                    unit += 1
        else:  # single component: raster over its ACTUAL blocks
            ci, c, tdc, tac = scan[0]
            tbl = tables(ci, c, tdc, tac)
            for by in range(c["bh"]):
                for bx in range(c["bw"]):
                    if ri and unit == ri:
                        r, next_rst = _consume_restart(data, r, next_rst)
                        pred = [0] * len(scan)
                        eobrun[0] = 0
                        unit = 0
                    blk = store[ci][by * c["bw_m"] + bx]
                    if ss == 0:
                        if ah == 0:
                            _dc_first(r, tbl, pred, 0, blk, al)
                        else:
                            _dc_refine(r, blk, al)
                    elif ah == 0:
                        _ac_first(r, tbl, blk, ss, se, al, eobrun)
                    else:
                        _ac_refine(r, tbl, blk, ss, se, al, eobrun)
                    unit += 1
    except _RestartMarker as e:
        raise ValueError(
            f"restart marker inside data unit at byte {e.at}"
        ) from None
    return _next_marker(data, r.pos)


def _seq_data_unit(r, dc_t, ac_t, pred, si, blk) -> None:
    """One FULL-BAND sequential data unit into a store block (quantized
    coefficients — dequantize happens at finish).  Identical coefficient
    math to _decode_scan's inner loop, minus the eager dequant/IDCT."""
    t = r.decode_huff(dc_t)
    if t > 11:
        raise ValueError("bad DC category")
    pred[si] += _extend(r.receive(t), t)
    blk[0] = pred[si]
    k = 1
    while k < 64:
        rs = r.decode_huff(ac_t)
        rr, s = rs >> 4, rs & 0xF
        if s == 0:
            if rr == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += rr
        if k > 63:
            raise ValueError("AC index overflow")
        blk[_ZIGZAG[k]] = _extend(r.receive(s), s)
        k += 1


def _sequential_scan(data, pos, frame, scan, store, huff_dc, huff_ac, ri) -> int:
    """Decode ONE sequential (SOF0/SOF1) scan covering a SUBSET of the
    frame's components into the coefficient store (T.81 A.2.3: a
    multi-scan sequential frame codes each component's full coefficients
    in its own — or a partially-interleaved — scan).  Returns the
    position of the marker following the entropy-coded data.  MCU
    geometry: an interleaved scan walks the FRAME-level MCU grid (Hmax/
    Vmax over all frame components); a single-component scan's MCU is one
    data unit over that component's actual (non-padded) block grid —
    same walk the progressive path uses."""
    r = _BitReader(data, pos)
    pred = [0] * len(scan)
    next_rst = 0
    unit = 0

    def tabs(tdc, tac):
        dc_t, ac_t = huff_dc.get(tdc), huff_ac.get(tac)
        if dc_t is None or ac_t is None:
            raise ValueError("missing Huffman table")
        return dc_t, ac_t

    try:
        if len(scan) > 1:  # interleaved subset: MCU order over padded grid
            for my in range(frame["mcuy"]):
                for mx in range(frame["mcux"]):
                    if ri and unit == ri:
                        r, next_rst = _consume_restart(data, r, next_rst)
                        pred = [0] * len(scan)
                        unit = 0
                    for si, (ci, c, tdc, tac) in enumerate(scan):
                        dc_t, ac_t = tabs(tdc, tac)
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                blk = store[ci][
                                    (my * c["v"] + by) * c["bw_m"]
                                    + mx * c["h"] + bx
                                ]
                                _seq_data_unit(r, dc_t, ac_t, pred, si, blk)
                    unit += 1
        else:  # MCU = one data unit: raster over the ACTUAL blocks
            ci, c, tdc, tac = scan[0]
            dc_t, ac_t = tabs(tdc, tac)
            for by in range(c["bh"]):
                for bx in range(c["bw"]):
                    if ri and unit == ri:
                        r, next_rst = _consume_restart(data, r, next_rst)
                        pred = [0]
                        unit = 0
                    _seq_data_unit(
                        r, dc_t, ac_t, pred, 0, store[ci][by * c["bw_m"] + bx]
                    )
                    unit += 1
    except _RestartMarker as e:
        raise ValueError(
            f"restart marker inside data unit at byte {e.at}"
        ) from None
    return _next_marker(data, r.pos)


def _finish_progressive(frame, qt, store) -> tuple[int, int, int, bytes]:
    """Dequantize + IDCT the accumulated coefficient store, then render
    through the shared upsample/color-convert path."""
    comps = frame["comps"]
    planes = []
    for ci, c in enumerate(comps):
        q = qt.get(c["tq"])
        if q is None:
            raise ValueError("missing quantization table")
        cw = c["bw_m"] * 8
        ch = (len(store[ci]) // c["bw_m"]) * 8
        c["cw"], c["ch"] = cw, ch
        plane = bytearray(cw * ch)
        for bi, coefq in enumerate(store[ci]):
            px = _idct_block([coefq[j] * q[j] for j in range(64)])
            by, bx = divmod(bi, c["bw_m"])
            ox, oy = bx * 8, by * 8
            for yy in range(8):
                base = (oy + yy) * cw + ox
                plane[base:base + 8] = bytes(px[yy * 8:yy * 8 + 8])
        planes.append(plane)
    return _planes_to_pixels(
        frame["w"], frame["h"], comps, planes, frame["hmax"], frame["vmax"],
        frame.get("adobe"),
    )


# ---------------------------------------------------------------------------
# DC-only flat-block encoder (the bit-exact JPEG family — see module doc)
# ---------------------------------------------------------------------------

# ITU-T T.81 Annex K.3.1 typical luminance Huffman tables (public spec
# data).  Real-world tables, so any compliant decoder (javax.imageio,
# libjpeg, PIL) reads the output; the restart-interval test keeps its own
# independent copy on purpose.
STD_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
STD_DC_LUMA_VALS = bytes(range(12))
STD_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
STD_AC_LUMA_VALS = bytes([
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])

#: DC quantizer used by the flat encoder.  The stored DC is the block's
#: (sample - 128), so the dequantized coefficient is 8*(sample-128) and
#: the T.81 IDCT of a DC-only block — coefficient/8 in every pixel —
#: reconstructs sample-128 EXACTLY (the float rounding error is
#: <= |m| * 2**-50, far below the round-half threshold).
_FLAT_DC_QUANT = 8


def _canonical_codes(bits: list[int], vals: bytes) -> dict[int, tuple[int, int]]:
    """value -> (length, code) for a T.81 Annex C canonical table (the
    encode-side inverse of :class:`_Huff`)."""
    lut: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lut[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return lut


class _BitWriter:
    """MSB-first entropy-segment writer: 0xFF byte stuffing, final byte
    padded with 1-bits (T.81 F.1.2.3)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        while self.n:
            self.put(1, 1)
        return bytes(self.out)


def encode_jpeg_flat(width: int, height: int, block_samples: list[int]) -> bytes:
    """Encode a grayscale baseline JPEG whose 8x8 blocks each hold ONE
    constant sample value — ``block_samples`` row-major over the
    (width/8) x (height/8) block grid.

    Every block is a single quantized DC coefficient (sample - 128, DC
    quantizer 8) plus an end-of-block — so the stream exercises the real
    decode machinery (marker parse, canonical Huffman DC prediction,
    dequantize, IDCT, level shift) while the decoded image is bit-exact
    predictable: pixel == sample.  Dimensions must be block-aligned
    precisely because exactness is the point: a cropped edge block would
    still decode exactly, but keeping the grid uniform keeps the SQL
    oracle a one-liner.
    """
    if width <= 0 or height <= 0 or width % 8 or height % 8:
        raise ValueError("flat encoder needs positive block-aligned dims")
    bw, bh = width // 8, height // 8
    if len(block_samples) != bw * bh:
        raise ValueError(f"need {bw * bh} block samples, got {len(block_samples)}")
    if any(s < 0 or s > 255 for s in block_samples):
        raise ValueError("block samples must be 0..255")

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    # flat quant table (zigzag order; only the DC entry matters — every
    # AC coefficient in the stream is zero)
    dqt = seg(0xDB, bytes([0x00]) + bytes([_FLAT_DC_QUANT] * 64))
    sof = seg(0xC0, struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]))
    dht = seg(0xC4, bytes([0x00]) + bytes(STD_DC_LUMA_BITS) + STD_DC_LUMA_VALS) + seg(
        0xC4, bytes([0x10]) + bytes(STD_AC_LUMA_BITS) + STD_AC_LUMA_VALS
    )
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))

    dc_lut = _canonical_codes(STD_DC_LUMA_BITS, STD_DC_LUMA_VALS)
    ac_lut = _canonical_codes(STD_AC_LUMA_BITS, STD_AC_LUMA_VALS)
    eob_len, eob_code = ac_lut[0x00]

    w = _BitWriter()
    pred = 0
    for s in block_samples:
        dc = s - 128
        diff = dc - pred
        pred = dc
        t = 0 if diff == 0 else abs(diff).bit_length()
        length, code = dc_lut[t]
        w.put(code, length)
        if t:
            mag = diff if diff >= 0 else diff + (1 << t) - 1
            w.put(mag, t)
        w.put(eob_code, eob_len)

    return b"\xff\xd8" + dqt + sof + dht + sos + w.flush() + b"\xff\xd9"


def encode_jpeg_flat_progressive(
    width: int, height: int, block_samples: list[int]
) -> bytes:
    """The flat-block family's PROGRESSIVE twin: same bit-exact decoded
    pixels as :func:`encode_jpeg_flat`, but the stream is a genuine SOF2
    file whose DC coefficient arrives split by successive approximation —
    scan 1 sends the high bits (Al=1) Huffman-coded with DC prediction,
    scan 2 is an AC first scan (Ss=1..63, all EOB: every AC is zero), and
    scan 3 refines DC with one raw bit per block (Ah=1, Al=0).  The
    decoder must run real Annex G machinery (coefficient accumulation,
    point-transform shifts, raw-bit refinement, a non-interleaved AC
    scan) to reconstruct d = (d >> 1) << 1 | (d & 1) exactly, so the SQL
    oracle predicts the same pixel statistics as the baseline twin and
    the driver's value-hash gate covers the progressive path end-to-end.
    """
    if width <= 0 or height <= 0 or width % 8 or height % 8:
        raise ValueError("flat encoder needs positive block-aligned dims")
    bw, bh = width // 8, height // 8
    if len(block_samples) != bw * bh:
        raise ValueError(f"need {bw * bh} block samples, got {len(block_samples)}")
    if any(s < 0 or s > 255 for s in block_samples):
        raise ValueError("block samples must be 0..255")

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    dqt = seg(0xDB, bytes([0x00]) + bytes([_FLAT_DC_QUANT] * 64))
    sof = seg(0xC2, struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]))
    dht = seg(0xC4, bytes([0x00]) + bytes(STD_DC_LUMA_BITS) + STD_DC_LUMA_VALS) + seg(
        0xC4, bytes([0x10]) + bytes(STD_AC_LUMA_BITS) + STD_AC_LUMA_VALS
    )
    dc_lut = _canonical_codes(STD_DC_LUMA_BITS, STD_DC_LUMA_VALS)
    ac_lut = _canonical_codes(STD_AC_LUMA_BITS, STD_AC_LUMA_VALS)

    # scan 1: DC first, Al=1 — diffs over the point-transformed values
    w1 = _BitWriter()
    pred = 0
    for s in block_samples:
        v = (s - 128) >> 1
        diff = v - pred
        pred = v
        t = 0 if diff == 0 else abs(diff).bit_length()
        length, code = dc_lut[t]
        w1.put(code, length)
        if t:
            mag = diff if diff >= 0 else diff + (1 << t) - 1
            w1.put(mag, t)
    sos1 = seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01])) + w1.flush()

    # scan 2: AC first over the full band — every block is one EOB code
    # (EOB run of 1), covering the non-interleaved AC path
    w2 = _BitWriter()
    eob_len, eob_code = ac_lut[0x00]
    for _ in block_samples:
        w2.put(eob_code, eob_len)
    sos2 = seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00])) + w2.flush()

    # scan 3: DC refinement, Ah=1 Al=0 — one raw magnitude bit per block
    w3 = _BitWriter()
    for s in block_samples:
        w3.put((s - 128) & 1, 1)
    sos3 = seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10])) + w3.flush()

    return b"\xff\xd8" + dqt + sof + dht + sos1 + sos2 + sos3 + b"\xff\xd9"


def encode_jpeg_flat_multiscan(
    width: int, height: int, block_samples: list[int],
    restart_interval: int = 0,
) -> bytes:
    """The flat-block family's MULTI-SCAN SEQUENTIAL twin: same bit-exact
    decoded pixels as :func:`encode_jpeg_flat`, but a 3-component SOF0
    frame whose components arrive in TWO scans — scan 1 codes Y alone
    (non-interleaved: MCU = one data unit over its actual block grid),
    scan 2 codes Cb and Cr interleaved (frame-level MCU walk) — the T.81
    A.2.3 shape older encoders emit.  Cb = Cr = 128 everywhere, so after
    JFIF color conversion R = G = B = Y exactly and the SQL oracle stays
    the same one-liner as the baseline twin, while the decoder must run
    the real multi-scan store machinery to get there.

    ``restart_interval`` > 0 adds a DRI segment and RSTn markers every
    that many data units WITHIN EACH SCAN (the restart index and DC
    prediction reset per scan, T.81 E.1.4) — covering _sequential_scan's
    restart path with a stream the JDK decoder also accepts.
    """
    if width <= 0 or height <= 0 or width % 8 or height % 8:
        raise ValueError("flat encoder needs positive block-aligned dims")
    bw, bh = width // 8, height // 8
    if len(block_samples) != bw * bh:
        raise ValueError(f"need {bw * bh} block samples, got {len(block_samples)}")
    if any(s < 0 or s > 255 for s in block_samples):
        raise ValueError("block samples must be 0..255")

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    dqt = seg(0xDB, bytes([0x00]) + bytes([_FLAT_DC_QUANT] * 64))
    dri = (
        seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    sof = seg(
        0xC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    dht = seg(0xC4, bytes([0x00]) + bytes(STD_DC_LUMA_BITS) + STD_DC_LUMA_VALS) + seg(
        0xC4, bytes([0x10]) + bytes(STD_AC_LUMA_BITS) + STD_AC_LUMA_VALS
    )
    dc_lut = _canonical_codes(STD_DC_LUMA_BITS, STD_DC_LUMA_VALS)
    ac_lut = _canonical_codes(STD_AC_LUMA_BITS, STD_AC_LUMA_VALS)
    eob_len, eob_code = ac_lut[0x00]
    zero_len, zero_code = dc_lut[0]

    # scan 1: Y alone — DC diff + EOB per block, raster order, restart
    # segmentation every restart_interval blocks (pred + RSTn reset)
    parts1: list[bytes] = []
    w1 = _BitWriter()
    pred = 0
    unit = 0
    rst = 0
    for s in block_samples:
        if restart_interval and unit == restart_interval:
            parts1.append(w1.flush())
            parts1.append(bytes([0xFF, 0xD0 + rst]))
            rst = (rst + 1) & 7
            w1 = _BitWriter()
            pred = 0
            unit = 0
        dc = s - 128
        diff = dc - pred
        pred = dc
        t = 0 if diff == 0 else abs(diff).bit_length()
        length, code = dc_lut[t]
        w1.put(code, length)
        if t:
            mag = diff if diff >= 0 else diff + (1 << t) - 1
            w1.put(mag, t)
        w1.put(eob_code, eob_len)
        unit += 1
    parts1.append(w1.flush())
    sos1 = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0])) + b"".join(parts1)

    # scan 2: Cb + Cr interleaved — both flat 128 (DC 0): per MCU, one
    # zero-category DC + EOB for each component; restart counter and
    # prediction restart fresh for the new scan
    parts2: list[bytes] = []
    w2 = _BitWriter()
    unit = 0
    rst = 0
    for _ in block_samples:
        if restart_interval and unit == restart_interval:
            parts2.append(w2.flush())
            parts2.append(bytes([0xFF, 0xD0 + rst]))
            rst = (rst + 1) & 7
            w2 = _BitWriter()
            unit = 0
        for _component in (2, 3):
            w2.put(zero_code, zero_len)
            w2.put(eob_code, eob_len)
        unit += 1
    parts2.append(w2.flush())
    sos2 = seg(0xDA, bytes([2, 2, 0x00, 3, 0x00, 0, 63, 0])) + b"".join(parts2)

    return b"\xff\xd8" + dqt + dri + sof + dht + sos1 + sos2 + b"\xff\xd9"


def encode_jpeg_flat_cmyk(
    width: int,
    height: int,
    luma_samples: list[int],
    k_samples: list[int],
    transform: int = 2,
) -> bytes:
    """The flat-block family's ADOBE CMYK twin: a 4-component SOF0 frame
    with the APP14 marker, one fully-interleaved scan, all components
    1x1-sampled and DC-only.

    ``transform=2`` (YCCK) stores Y = 255 - luma with Cb = Cr = 128, so
    the decoder's libjpeg-convention 255 - YCbCr-inverse reconstructs
    C' = M' = Y' = ``luma_samples[b]`` exactly; ``transform=0`` stores
    the same values directly as inverted CMY.
    Component 3 stores ``k_samples[b]`` (inverted K).  Either way the
    decoded RGB pixel of block ``b`` is the exact integer
    ``luma_samples[b] * k_samples[b] // 255`` in all three channels —
    bit-predictable, so the SQL oracle covers the full 4-component
    Huffman + IDCT + APP14 + YCCK/CMYK color path under the value-hash
    gate (both transform branches)."""
    if width <= 0 or height <= 0 or width % 8 or height % 8:
        raise ValueError("flat encoder needs positive block-aligned dims")
    if transform not in (0, 2):
        raise ValueError("transform must be 0 (CMYK) or 2 (YCCK)")
    bw, bh = width // 8, height // 8
    n = bw * bh
    if len(luma_samples) != n or len(k_samples) != n:
        raise ValueError(f"need {n} luma and k samples")
    if any(s < 0 or s > 255 for s in luma_samples + k_samples):
        raise ValueError("samples must be 0..255")

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    app14 = seg(
        0xEE,
        b"Adobe" + struct.pack(">HHHB", 100, 0, 0, transform),
    )
    dqt = seg(0xDB, bytes([0x00]) + bytes([_FLAT_DC_QUANT] * 64))
    sof = seg(
        0xC0,
        struct.pack(">BHHB", 8, height, width, 4)
        + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0, 4, 0x11, 0]),
    )
    dht = seg(0xC4, bytes([0x00]) + bytes(STD_DC_LUMA_BITS) + STD_DC_LUMA_VALS) + seg(
        0xC4, bytes([0x10]) + bytes(STD_AC_LUMA_BITS) + STD_AC_LUMA_VALS
    )
    sos = seg(0xDA, bytes([4, 1, 0x00, 2, 0x00, 3, 0x00, 4, 0x00, 0, 63, 0]))

    dc_lut = _canonical_codes(STD_DC_LUMA_BITS, STD_DC_LUMA_VALS)
    ac_lut = _canonical_codes(STD_AC_LUMA_BITS, STD_AC_LUMA_VALS)
    eob_len, eob_code = ac_lut[0x00]

    w = _BitWriter()
    pred = [0, 0, 0, 0]
    for b in range(n):
        lum = luma_samples[b]
        # per-MCU component order 0..3; YCCK mid-chroma = flat 128.
        # YCCK stores Y = 255 - lum: the decoder's libjpeg-convention
        # inversion (255 - ycc_inverse) then recovers exactly lum, so
        # both transforms decode to the same RGB and share one oracle.
        vals = (
            (255 - lum, 128, 128, k_samples[b])
            if transform == 2
            else (lum, lum, lum, k_samples[b])
        )
        for ci, s in enumerate(vals):
            dc = s - 128
            diff = dc - pred[ci]
            pred[ci] = dc
            t = 0 if diff == 0 else abs(diff).bit_length()
            length, code = dc_lut[t]
            w.put(code, length)
            if t:
                mag = diff if diff >= 0 else diff + (1 << t) - 1
                w.put(mag, t)
            w.put(eob_code, eob_len)

    return b"\xff\xd8" + app14 + dqt + sof + dht + sos + w.flush() + b"\xff\xd9"


# ---------------------------------------------------------------------------
# lossless JPEG (SOF3, T.81 Annex H) — r14: the integer-exact DCT-free
# process (DNG/DICOM lineage).  Predictive coding: each sample's
# difference from one of seven neighbor predictors is Huffman-coded as
# (SSSS, magnitude bits), all arithmetic mod 2^16.
# ---------------------------------------------------------------------------


def _lossless_scan(data, pos, frame, scan, psv, pt, huff_dc, ri):
    """Decode one full-frame lossless scan.  Returns (w, h, nc,
    effective_precision, samples) with ``samples`` interleaved raster
    ints (already shifted left by the point transform Pt, per H.2.3's
    output rule)."""
    if not 1 <= psv <= 7:
        raise ValueError(f"bad predictor selector {psv}")
    w, h = frame["w"], frame["h"]
    nc = len(scan)
    if nc != len(frame["comps"]):
        raise NotImplementedError("multi-scan lossless JPEG")
    if any(c["h"] != 1 or c["v"] != 1 for c in frame["comps"]):
        raise NotImplementedError("subsampled lossless JPEG")
    prec = frame["prec"]
    if pt >= prec:
        raise ValueError("point transform exceeds precision")
    tables = []
    for _, _c, tdc, _ta in scan:
        if tdc not in huff_dc:
            raise ValueError("scan references missing Huffman table")
        tables.append(huff_dc[tdc])
    default_pred = 1 << (prec - pt - 1)
    mask = 0xFFFF
    samples = [0] * (w * h * nc)
    r = _BitReader(data, pos)
    next_rst = 0
    since_restart = 0
    fresh = [True] * nc  # next sample of comp c starts a restart interval
    # H.1.1: prediction may not reach across a restart boundary, so the
    # line a restart lands on uses the 1-D (Ra) rule — exactly like the
    # scan's first line — and the selected predictor resumes on the line
    # after (the row-provenance model every mainstream lossless
    # implementation uses; review r14)
    line1d_row = [0] * nc
    for y in range(h):
        for x in range(w):
            for c in range(nc):
                if ri and since_restart == ri * nc:
                    # the sequential/progressive scans' shared helper:
                    # align, skip fill bytes, verify the RSTn sequence
                    r, next_rst = _consume_restart(data, r, next_rst)
                    since_restart = 0
                    fresh = [True] * nc
                    line1d_row = [y] * nc
                try:
                    t = r.decode_huff(tables[c])
                    if t > 16:
                        raise ValueError(f"bad lossless SSSS {t}")
                    diff = 32768 if t == 16 else _extend(r.receive(t), t)
                except _RestartMarker:
                    # a marker anywhere inside the sample's code or its
                    # magnitude bits is malformed here (restarts are
                    # consumed above, at interval boundaries only)
                    raise ValueError("unexpected restart marker")
                idx = (y * w + x) * nc + c
                if fresh[c]:
                    pred = default_pred
                    fresh[c] = False
                elif y == line1d_row[c]:
                    pred = samples[idx - nc]  # 1-D rule on the interval's
                    # first line (covers the scan's first line, where
                    # line1d_row is 0)
                elif x == 0:
                    pred = samples[idx - w * nc]  # first column: above
                else:
                    ra = samples[idx - nc]
                    rb = samples[idx - w * nc]
                    rc = samples[idx - w * nc - nc]
                    if psv == 1:
                        pred = ra
                    elif psv == 2:
                        pred = rb
                    elif psv == 3:
                        pred = rc
                    elif psv == 4:
                        pred = ra + rb - rc
                    elif psv == 5:
                        pred = ra + ((rb - rc) >> 1)
                    elif psv == 6:
                        pred = rb + ((ra - rc) >> 1)
                    else:  # 7
                        pred = (ra + rb) >> 1
                samples[idx] = (pred + diff) & mask
                since_restart += 1
    if pt:
        samples = [s << pt for s in samples]
    return w, h, nc, prec, samples


def decode_jpeg_lossless(data: bytes) -> tuple[int, int, int, int, list[int]]:
    """Decode a LOSSLESS (SOF3) JPEG to ``(width, height, n_components,
    precision, samples)`` with full-precision (2..16-bit) integer
    samples, interleaved raster order — the API for >8-bit content
    (:func:`decode_jpeg` serves 8-bit lossless frames as ordinary pixel
    bytes).  ValueError on malformed input, like every decode lane."""
    try:
        out = _decode_jpeg(data, raw_lossless=True)
    except (ValueError, NotImplementedError):
        raise
    except (struct.error, IndexError, KeyError, OverflowError,
            ZeroDivisionError, MemoryError) as e:
        # the same normalization set as decode_jpeg (both run the shared
        # marker walk), plus MemoryError for header-implied allocations
        raise ValueError(f"malformed JPEG: {type(e).__name__}: {e}") from e
    if len(out) != 5:
        raise ValueError("not a lossless (SOF3) JPEG")
    return out


#: 17 SSSS symbols (0..16), all coded at 5 bits — a valid canonical table
#: (codes 0..16 of 32; the all-ones code stays unused, per the T.81
#: convention) that covers every lossless difference class at any
#: precision.
_LOSSLESS_BITS = [0, 0, 0, 0, 17, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_LOSSLESS_VALS = bytes(range(17))


def encode_jpeg_lossless(
    width: int,
    height: int,
    samples: list[int],
    precision: int = 8,
    predictor: int = 1,
    restart_interval: int = 0,
) -> bytes:
    """Encode a single-component lossless (SOF3) JPEG: genuine marker
    stream (SOF3/DHT/SOS), Huffman-coded mod-2^16 differences against
    the selected predictor (1..7).  Lossless by construction — decode
    returns ``samples`` bit-identically at any precision 2..16 — which
    makes this family hash-gateable without any DC-only device."""
    if not 2 <= precision <= 16:
        raise ValueError("precision must be 2..16")
    if not 1 <= predictor <= 7:
        raise ValueError("predictor must be 1..7")
    if len(samples) != width * height or width < 1 or height < 1:
        raise ValueError("samples must have width*height entries")
    top = 1 << precision
    if not all(0 <= s < top for s in samples):
        raise ValueError("sample out of range for precision")

    out = bytearray(b"\xff\xd8")  # SOI
    sof = struct.pack(">BHHB", precision, height, width, 1) + bytes((1, 0x11, 0))
    out += b"\xff\xc3" + struct.pack(">H", 2 + len(sof)) + sof
    dht = bytes([0x00]) + bytes(_LOSSLESS_BITS) + _LOSSLESS_VALS
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([1, 1, 0x00, predictor, 0, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    codes = {s: (5, s) for s in range(17)}  # canonical: value s -> code s
    bw = _BitWriter()
    default_pred = 1 << (precision - 1)
    next_rst = 0
    since = 0
    fresh = True
    line1d_row = 0  # H.1.1 1-D rule on the interval's first line
    for y in range(height):
        for x in range(width):
            if restart_interval and since == restart_interval:
                out += bw.flush() + bytes((0xFF, 0xD0 + next_rst))
                bw = _BitWriter()
                next_rst = (next_rst + 1) & 7
                since = 0
                fresh = True
                line1d_row = y
            idx = y * width + x
            if fresh:
                pred = default_pred
                fresh = False
            elif y == line1d_row:
                pred = samples[idx - 1]
            elif x == 0:
                pred = samples[idx - width]
            else:
                ra, rb = samples[idx - 1], samples[idx - width]
                rc = samples[idx - width - 1]
                pred = {
                    1: ra, 2: rb, 3: rc, 4: ra + rb - rc,
                    5: ra + ((rb - rc) >> 1), 6: rb + ((ra - rc) >> 1),
                    7: (ra + rb) >> 1,
                }[predictor]
            diff = (samples[idx] - pred) & 0xFFFF
            if diff > 32768:
                diff -= 65536
            if diff == 32768:
                t = 16
            else:
                t = abs(diff).bit_length()
            length, code = codes[t]
            bw.put(code, length)
            if 0 < t < 16:
                v = diff if diff > 0 else diff + (1 << t) - 1
                bw.put(v, t)
            since += 1
    out += bw.flush() + b"\xff\xd9"  # EOI
    return bytes(out)


def mean_luma(px: bytes, ch: int, w: int, h: int) -> int:
    """Integer mean luma of a decoded pixel buffer — the ONE shared
    implementation of the Rec.601 statistic for every JPEG decode lane
    (the decode_features_jpeg operator loop and the fused synth gates
    alike, review r14): grayscale samples ARE luma; 3-channel buffers
    take the integer Rec.601 dot; any other component count is not a
    color buffer and must fail loudly (the 8-bit multi-component SOF3
    case belongs to the lossless lane).  numpy is a lazy import so the
    from-spec decoder itself stays stdlib-only (gif.py precedent,
    review r12); the int64 accumulation is exact.
    """
    if ch not in (1, 3):
        raise ValueError(
            f"{ch}-component pixel buffer: use decode_features_jpeg_lossless"
        )
    import numpy as np

    arr = np.frombuffer(px, dtype=np.uint8).astype(np.int64)
    if ch == 3:  # Rec.601 integer luma over RGB
        return int(
            (arr.reshape(-1, 3) * np.array([299, 587, 114])).sum()
        ) // (1000 * w * h)
    return int(arr.sum()) // (w * h)  # grayscale: samples ARE luma
