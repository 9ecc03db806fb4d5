"""Minimal pure-stdlib PNG codec — real image decode without PIL.

Written against the public PNG specification (RFC 2083 / W3C PNG, chunk
layout + DEFLATE + scanline filters); the container ships no imaging
library and no network, so the multimodal "real decode" path gets an
actually-executing decoder built from ``zlib`` + ``struct`` alone.

Scope (deliberately bounded, stated loudly):
- greyscale (color type 0), RGB (2), grey+alpha (4 — r09), RGBA (6);
- bit depth 8, plus 16 (r09) — 16-bit samples are reduced to their
  most-significant byte on output (the fast standard path for pixel
  statistics; note the spec's exact 16->8 rescale rounds, so the JVM
  cross-validation compares the 16-bit raster's high byte, not
  ImageIO's own rounded 8-bit conversion);
- indexed-colour / palette (color type 3 — r11) at bit depths 1/2/4/8:
  PLTE lookup plus optional tRNS per-entry alpha (output is RGB, or RGBA
  when tRNS is present; short tRNS entries default to opaque, per spec
  11.3.2); sub-byte indices are packed MSB-first within each scanline
  byte and every scanline's last byte is zero-padded (spec 7.2);
- all five scanline filters (None/Sub/Up/Average/Paeth) — the part of the
  format that is genuinely easy to get wrong, so it is cross-validated
  against the JVM's independent ``javax.imageio`` decoder in
  tests/test_multimodal_real.py;
- Adam7 interlacing (r10): the seven reduced sub-images are unfiltered
  independently and scattered back, per spec 8.2 (each pass's scanlines
  are bit-packed and padded independently for palette depths);
- no ancillary-chunk interpretation beyond tRNS (skipped, per spec) —
  EXCEPT the APNG animation chunks (r14): ``iter_apng_frames_composed``
  walks acTL/fcTL/fdAT with consecutive-sequence validation, rebuilds
  each frame's independent zlib stream as a standalone still decoded by
  this same decoder, and composes with blend_op SOURCE/OVER and all
  three dispose ops (none / background / PREVIOUS);
  ``iter_time_sampled_composed_apng_frames`` adds the GIF/WebP
  time-sampling contract.  The plain :func:`decode_png` still serves an
  APNG's default image, per spec.

The encoder (filter 0 rows, one IDAT; :func:`encode_apng` for animation
fixtures) exists so tests can fabricate valid PNGs without any external
library; PIL remains the full-format path
(operators/multimodal.decode_features_real) wherever it is installed.
"""

from __future__ import annotations

import struct
import zlib

from edgy_spark.functions.gif import blend_rgba_rect, iter_time_samples_shared

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: Decode-side resource bound: a malformed header must raise, never
#: allocate — 64M pixels caps the output buffer at ~256 MB RGBA, far above
#: any legitimate corpus asset and far below an OOM (review r11d).
MAX_PIXELS = 64_000_000

# samples per pixel by color type (3 = palette: one index "sample")
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# bit depths handled; 16-bit filtering works on BYTES with the pixel
# offset widened to channels * 2, per spec.  Palette PNGs (type 3) allow
# the sub-byte depths and forbid 16 (spec table 11.1).
_DEPTHS = (8, 16)
_PALETTE_DEPTHS = (1, 2, 4, 8)


def _pack_indices(row: bytes, depth: int) -> bytes:
    """Pack one index per byte into a palette scanline: ``8 // depth``
    indices per byte, MSB-first, final byte zero-padded (spec 7.2)."""
    if depth == 8:
        return bytes(row)
    per = 8 // depth
    out = bytearray((len(row) + per - 1) // per)
    for x, v in enumerate(row):
        out[x // per] |= v << (8 - depth * (x % per + 1))
    return bytes(out)


def _unpack_indices(line: bytes, width: int, depth: int) -> bytes:
    """Inverse of :func:`_pack_indices` for the first ``width`` pixels."""
    if depth == 8:
        return bytes(line[:width])
    per = 8 // depth
    mask = (1 << depth) - 1
    return bytes(
        (line[x // per] >> (8 - depth * (x % per + 1))) & mask
        for x in range(width)
    )


def encode_png(
    width: int,
    height: int,
    rows: list[bytes],
    color_type: int = 2,
    depth: int = 8,
    palette: bytes | None = None,
    trns: bytes | None = None,
) -> bytes:
    """Encode scanlines (``rows[y]`` = packed samples for row y; big-endian
    2-byte samples when ``depth=16``; for palette images ONE INDEX BYTE
    per pixel — the encoder bit-packs sub-byte depths itself) as a valid
    PNG: IHDR [+ PLTE [+ tRNS]] + one zlib IDAT with filter byte 0 per
    row + IEND."""
    ch = _CHANNELS[color_type]
    if color_type == 3:
        if depth not in _PALETTE_DEPTHS:
            raise ValueError(f"palette bit depth {depth} (one of {_PALETTE_DEPTHS})")
        if not palette or len(palette) % 3 or len(palette) > 3 * (1 << depth):
            raise ValueError("palette PNG needs a PLTE of 3-byte entries")
        if trns is not None and len(trns) > len(palette) // 3:
            raise ValueError("tRNS longer than the palette")
    else:
        if depth not in _DEPTHS:
            raise ValueError(f"bit depth {depth} (one of {_DEPTHS})")
        if palette is not None or trns is not None:
            raise ValueError("PLTE/tRNS only valid for color type 3 here")
    if width <= 0 or height <= 0:
        raise ValueError("zero-dimension PNG")
    if color_type == 3:
        if len(rows) != height or any(len(r) != width for r in rows):
            raise ValueError("palette rows must hold one index byte per pixel")
        n_entries = len(palette) // 3
        if any(v >= n_entries for r in rows for v in r):
            raise ValueError("palette index out of range")
        packed = [_pack_indices(r, depth) for r in rows]
    else:
        stride = width * ch * (depth // 8)
        if len(rows) != height or any(len(r) != stride for r in rows):
            raise ValueError("rows do not match width/height/color_type/depth")
        packed = [bytes(r) for r in rows]

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, depth, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + r for r in packed)
    body = chunk(b"IHDR", ihdr)
    if color_type == 3:
        body += chunk(b"PLTE", palette)
        if trns is not None:
            body += chunk(b"tRNS", trns)
    return (
        _SIGNATURE + body + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c



def _inflate_exact(idat: bytes, expected: int) -> bytes:
    """Bounded inflate: decompress EXACTLY ``expected`` bytes (the size
    the already-validated header implies) and fail on any excess without
    materializing it — a tiny file whose IDAT is a decompression bomb
    must raise, never allocate (review r11d: plain ``zlib.decompress``
    inflated a 200 KB crafted asset to ~459 MB before the size check)."""
    d = zlib.decompressobj()
    try:
        out = d.decompress(idat, expected + 1)
    except zlib.error as e:
        raise ValueError(f"bad IDAT stream: {e}") from e
    if len(out) != expected:
        raise ValueError("decompressed size mismatch")
    if not d.eof:
        # the input ran out mid-stream: the pixel bytes happen to be all
        # there, but the final block / adler32 checksum never arrived —
        # plain zlib.decompress rejected this, so must the bounded path
        raise ValueError("truncated IDAT stream")
    return out


def _decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG into ``(width, height, channels, pixels)`` with
    ``pixels`` = unfiltered 8-bit samples, row-major, ``width * channels``
    bytes per row (16-bit sources yield each sample's most-significant
    byte — see module docstring; palette sources are expanded through
    PLTE to RGB, or RGBA when a tRNS chunk is present).  Raises
    ValueError on malformed input and NotImplementedError on spec
    features outside the documented scope."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    i, n = 8, len(data)
    width = height = None
    color_type = depth = None
    palette: bytes | None = None
    trns: bytes | None = None
    idat = bytearray()
    while i + 8 <= n:
        (length,) = struct.unpack(">I", data[i:i + 4])
        tag = data[i + 4:i + 8]
        payload = data[i + 8:i + 8 + length]
        if len(payload) != length:
            raise ValueError("truncated chunk")
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", payload)
            )
            if width == 0 or height == 0:
                # invalid per spec — and downstream pixel math (mean luma)
                # divides by w*h, so reject here with the documented error
                raise ValueError("zero-dimension PNG")
            if width * height > MAX_PIXELS:
                raise ValueError(
                    f"implausible dimensions {width}x{height} (> MAX_PIXELS)"
                )
            if color_type == 3:
                if depth not in _PALETTE_DEPTHS:
                    raise ValueError(
                        f"palette bit depth {depth} (spec allows {_PALETTE_DEPTHS})"
                    )
            elif depth not in _DEPTHS:
                raise NotImplementedError(f"bit depth {depth} (only {_DEPTHS})")
            if color_type not in _CHANNELS:
                raise NotImplementedError(
                    f"color type {color_type} (only grey/palette/grey+alpha/RGB/RGBA)"
                )
            if interlace not in (0, 1):
                raise ValueError(f"invalid interlace method {interlace}")
            if comp or filt:
                raise ValueError("invalid compression/filter method")
        elif tag == b"PLTE":
            if length == 0 or length % 3:
                raise ValueError("PLTE length not a multiple of 3")
            palette = payload
        elif tag == b"tRNS":
            trns = payload
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
        # other ancillary chunks: skipped, per spec
        i += 12 + length
    if width is None or not idat:
        raise ValueError("missing IHDR or IDAT")
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        return _decode_palette(
            bytes(idat), width, height, depth, interlace, palette, trns
        )
    ch = _CHANNELS[color_type]
    # filters operate on bytes with the "previous pixel" offset equal to
    # the pixel's BYTE width (spec: bpp rounded up to whole bytes)
    bpp = ch * (depth // 8)
    stride = width * bpp
    if not interlace:
        expected = (stride + 1) * height
    else:
        expected = sum(
            (((width - x0 + dx - 1) // dx) * bpp + 1)
            * ((height - y0 + dy - 1) // dy)
            for x0, y0, dx, dy in _ADAM7
            if (width - x0 + dx - 1) // dx > 0
            and (height - y0 + dy - 1) // dy > 0
        )
    raw = _inflate_exact(bytes(idat), expected)
    if not interlace:
        out, _ = _unfilter(raw, 0, height, stride, bpp)
    else:
        # Adam7 (spec 8.2): the stream is seven reduced sub-images, each
        # independently filtered (prev row resets per pass); pass pixels
        # scatter back to (x0 + px*dx, y0 + py*dy).  Empty passes
        # contribute NO bytes, not even filter bytes.
        out = bytearray(stride * height)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            sub, pos = _unfilter(raw, pos, ph, pw * bpp, bpp)
            for py in range(ph):
                src = py * pw * bpp
                dst = (y0 + py * dy) * stride
                for px in range(pw):
                    xd = dst + (x0 + px * dx) * bpp
                    out[xd:xd + bpp] = sub[src:src + bpp]
                    src += bpp
        if pos != len(raw):
            raise ValueError("decompressed size mismatch")
    if depth == 16:
        out = out[0::2]  # big-endian samples: every even byte is the MSB
    return width, height, ch, bytes(out)



def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG into ``(width, height, channels, pixels)`` — see
    :func:`_decode_png` for the format contract.  Public entry point:
    EVERY malformed-input failure surfaces as ValueError (struct/zlib/
    index errors from fuzzed or truncated crawl bytes are normalized), so
    per-row error capture in the decode operators can catch one exception
    type without masking real bugs."""
    try:
        return _decode_png(data)
    except (ValueError, NotImplementedError):
        raise
    except (struct.error, zlib.error, IndexError, OverflowError) as e:
        raise ValueError(f"malformed PNG: {type(e).__name__}: {e}") from e


#: Adam7 pass origins and steps: (x0, y0, dx, dy), spec 8.2
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _decode_palette(
    idat: bytes,
    width: int,
    height: int,
    depth: int,
    interlace: int,
    palette: bytes,
    trns: bytes | None,
) -> tuple[int, int, int, bytes]:
    """Decode a color-type-3 stream: unfilter (bpp = 1 — filters see the
    packed BYTES, spec 9.2), unpack the MSB-first sub-byte indices per
    scanline (each scanline — including each Adam7 pass's — is padded to
    a whole byte independently, spec 7.2), then expand through PLTE
    (+ tRNS alpha; entries beyond tRNS's length are opaque, 11.3.2)."""
    if not interlace:
        expected = ((width * depth + 7) // 8 + 1) * height
    else:
        expected = sum(
            ((((width - x0 + dx - 1) // dx) * depth + 7) // 8 + 1)
            * ((height - y0 + dy - 1) // dy)
            for x0, y0, dx, dy in _ADAM7
            if (width - x0 + dx - 1) // dx > 0
            and (height - y0 + dy - 1) // dy > 0
        )
    raw = _inflate_exact(idat, expected)
    idx = bytearray(width * height)
    if not interlace:
        stride = (width * depth + 7) // 8
        lines, _ = _unfilter(raw, 0, height, stride, 1)
        for y in range(height):
            idx[y * width:(y + 1) * width] = _unpack_indices(
                lines[y * stride:(y + 1) * stride], width, depth
            )
    else:
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            pstride = (pw * depth + 7) // 8
            sub, pos = _unfilter(raw, pos, ph, pstride, 1)
            for py in range(ph):
                line = _unpack_indices(
                    sub[py * pstride:(py + 1) * pstride], pw, depth
                )
                dst = (y0 + py * dy) * width
                for px in range(pw):
                    idx[dst + x0 + px * dx] = line[px]
        if pos != len(raw):
            raise ValueError("decompressed size mismatch")
    n_entries = len(palette) // 3
    if max(idx, default=0) >= n_entries:
        raise ValueError("palette index out of range")
    ch = 3 if trns is None else 4
    out = bytearray(width * height * ch)
    for p, v in enumerate(idx):
        o, e = p * ch, v * 3
        out[o:o + 3] = palette[e:e + 3]
        if ch == 4:
            out[o + 3] = trns[v] if v < len(trns) else 255
    return width, height, ch, bytes(out)


def _unfilter(raw: bytes, pos: int, n_rows: int, stride: int, bpp: int):
    """Unfilter ``n_rows`` scanlines of ``stride`` bytes starting at
    ``raw[pos]`` (each prefixed by its filter byte); returns the
    reconstructed bytes and the position after the last line."""
    end = pos + (stride + 1) * n_rows
    if end > len(raw):
        raise ValueError("decompressed size mismatch")
    out = bytearray(stride * n_rows)
    prev = bytearray(stride)
    for y in range(n_rows):
        base = pos + y * (stride + 1)
        f = raw[base]
        line = bytearray(raw[base + 1:base + 1 + stride])
        if f == 1:  # Sub
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif f == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                c = prev[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + _paeth(a, prev[x], c)) & 0xFF
        elif f != 0:
            raise ValueError(f"invalid filter byte {f}")
        out[y * stride:(y + 1) * stride] = line
        prev = line
    return out, end


# ---------------------------------------------------------------------------
# APNG (animated PNG — acTL/fcTL/fdAT, PNG specification third edition) —
# r14: the third animation family, reusing this module's still decoder
# per frame and the GIF/WebP composition conventions.  APNG adds the
# DISPOSE-PREVIOUS operation (revert the frame's rect to the canvas
# state before the frame rendered) the WebP container lacks.
# ---------------------------------------------------------------------------


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload)) + tag + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _to_rgba(w: int, h: int, ch: int, px: bytes) -> bytes:
    """Normalize a still-decoder result to interleaved RGBA."""
    if ch == 4:
        return px
    out = bytearray(w * h * 4)
    if ch == 3:
        for i in range(w * h):
            out[4 * i : 4 * i + 3] = px[3 * i : 3 * i + 3]
            out[4 * i + 3] = 255
    elif ch == 2:  # grey + alpha
        for i in range(w * h):
            g = px[2 * i]
            out[4 * i] = out[4 * i + 1] = out[4 * i + 2] = g
            out[4 * i + 3] = px[2 * i + 1]
    else:  # greyscale
        for i in range(w * h):
            g = px[i]
            out[4 * i] = out[4 * i + 1] = out[4 * i + 2] = g
            out[4 * i + 3] = 255
    return bytes(out)


def iter_apng_frames_composed(data: bytes, with_delay: bool = False):
    """Yield each APNG frame COMPOSED onto the canvas as
    ``(width, height, 4, rgba)`` (prefixed with the frame's delay in
    milliseconds when ``with_delay``; the rational delay_num/delay_den is
    floored to ms, denominator 0 meaning 100 per spec), honoring frame
    rects, blend_op SOURCE/OVER, and dispose_op NONE/BACKGROUND/PREVIOUS.
    Per spec the default image (IDAT) joins the animation only when an
    fcTL precedes it.  Decode is lazy — head frames bank before a
    mid-stream corruption raises (the GIF/WebP iterators' contract).
    A plain PNG with no acTL raises ValueError."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    # first pass over the chunk stream: header/palette state and the
    # ordered animation records
    i, n = 8, len(data)
    ihdr_payload = None
    width = height = None
    palette = trns = None
    saw_actl = False
    records: list[tuple] = []  # ("fctl", seq, fields) / ("data", seq|None, payload, is_idat)
    while i + 8 <= n:
        (length,) = struct.unpack(">I", data[i : i + 4])
        tag = data[i + 4 : i + 8]
        payload = data[i + 8 : i + 8 + length]
        if len(payload) != length:
            raise ValueError("truncated chunk")
        if tag == b"IHDR":
            if len(payload) < 13:
                raise ValueError("truncated IHDR")
            ihdr_payload = payload
            width, height = struct.unpack(">II", payload[:8])
            if width == 0 or height == 0:
                raise ValueError("zero-dimension PNG")
            if width * height > MAX_PIXELS:
                raise ValueError("implausible dimensions (> MAX_PIXELS)")
        elif tag == b"acTL":
            if len(payload) < 8:
                raise ValueError("truncated acTL")
            saw_actl = True
        elif tag == b"PLTE":
            palette = payload
        elif tag == b"tRNS":
            trns = payload
        elif tag == b"fcTL":
            if len(payload) < 26:
                raise ValueError("truncated fcTL")
            records.append(("fctl", struct.unpack(">I", payload[:4])[0], payload))
        elif tag == b"IDAT":
            records.append(("data", None, payload, True))
        elif tag == b"fdAT":
            if len(payload) < 4:
                raise ValueError("truncated fdAT")
            records.append(
                ("data", struct.unpack(">I", payload[:4])[0], payload[4:], False)
            )
        elif tag == b"IEND":
            break
        i += 12 + length
    if ihdr_payload is None:
        raise ValueError("missing IHDR")
    if not saw_actl:
        raise ValueError("not an animated PNG (no acTL)")
    return _iter_apng_compose(
        ihdr_payload, width, height, palette, trns, records, with_delay
    )


def _iter_apng_compose(ihdr, cw, ch_, palette, trns, records, with_delay):
    # group records into frames: each fcTL owns the data chunks up to the
    # next fcTL.  Sequence numbers must be consecutive from 0 (spec).
    seqs = [r[1] for r in records if r[1] is not None]
    if seqs != list(range(len(seqs))):
        raise ValueError("APNG sequence numbers not consecutive")
    frames: list[tuple[bytes, list[bytes], bool]] = []
    cur_fctl = None
    cur_data: list[bytes] = []
    cur_idat = False
    for rec in records:
        if rec[0] == "fctl":
            if cur_fctl is not None:
                if not cur_data:
                    raise ValueError("fcTL with no frame data")
                frames.append((cur_fctl, cur_data, cur_idat))
            cur_fctl, cur_data, cur_idat = rec[2], [], False
        else:
            _kind, _seq, payload, is_idat = rec
            if cur_fctl is None:
                # IDAT before any fcTL: the default image is NOT part of
                # the animation — skip its data
                if not is_idat:
                    raise ValueError("fdAT before any fcTL")
                continue
            cur_data.append(payload)
            cur_idat = cur_idat or is_idat
    if cur_fctl is not None:
        if not cur_data:
            raise ValueError("fcTL with no frame data")
        frames.append((cur_fctl, cur_data, cur_idat))
    if not frames:
        raise ValueError("animated PNG with no frames")

    canvas = bytearray(cw * ch_ * 4)
    for fctl, data_parts, is_idat in frames:
        (_seq, fw, fh, fx, fy, dnum, dden, dispose, blend) = struct.unpack(
            ">IIIIIHHBB", fctl[:26]
        )
        if fx + fw > cw or fy + fh > ch_:
            raise ValueError("frame rect outside canvas")
        if dispose > 2 or blend > 1:
            raise ValueError("bad fcTL dispose/blend op")
        # each frame's data is an independent zlib stream structured like
        # IDAT data — rebuild a standalone still PNG at the frame's size.
        # Interlacing applies only to the default (IDAT) image; fdAT
        # frames are never interlaced (spec), so force method 0 there.
        sub_ihdr = struct.pack(">II", fw, fh) + ihdr[8:]
        if not is_idat:
            sub_ihdr = sub_ihdr[:-1] + b"\x00"
        body = _png_chunk(b"IHDR", sub_ihdr)
        if palette is not None:
            body += _png_chunk(b"PLTE", palette)
        if trns is not None:
            body += _png_chunk(b"tRNS", trns)
        for part in data_parts:
            body += _png_chunk(b"IDAT", part)
        still = _SIGNATURE + body + _png_chunk(b"IEND", b"")
        w, h, nch, px = _decode_png(still)
        rgba = _to_rgba(w, h, nch, px)
        saved = bytes(canvas) if dispose == 2 else None
        # the shared SOURCE/OVER compositor (gif.py, review r14)
        blend_rgba_rect(canvas, cw, rgba, fx, fy, fw, fh, over=blend == 1)
        out = (cw, ch_, 4, bytes(canvas))
        if with_delay:
            ms = dnum * 1000 // (dden if dden else 100)
            yield (ms,) + out
        else:
            yield out
        if dispose == 1:  # background: transparent black within the rect
            for j in range(fh):
                crow = ((fy + j) * cw + fx) * 4
                for k in range(fw):
                    canvas[crow + 4 * k : crow + 4 * k + 4] = b"\x00\x00\x00\x00"
        elif dispose == 2 and saved is not None:  # previous: revert rect
            for j in range(fh):
                crow = ((fy + j) * cw + fx) * 4
                canvas[crow : crow + 4 * fw] = saved[crow : crow + 4 * fw]


def encode_apng(
    canvas_w: int,
    canvas_h: int,
    frames: list[dict],
    num_plays: int = 0,
) -> bytes:
    """Encode an APNG whose frames are RGBA SUB-RECTS of the canvas —
    the fixture generator for the composed decode path (the GIF/WebP
    analogue).  Frame 0 is the default image and must cover the full
    canvas (the spec's rule when IDAT participates in the animation).
    Each frame dict: ``x``/``y``, ``w``, ``h``, ``rgba`` (w*h*4 bytes),
    ``delay`` ((num, den) tuple, default (1, 10)), ``dispose`` (0 none /
    1 background / 2 previous), ``blend`` (0 source / 1 over)."""
    if not frames:
        raise ValueError("animation needs at least one frame")
    if canvas_w < 1 or canvas_h < 1 or canvas_w * canvas_h > MAX_PIXELS:
        raise ValueError("bad canvas dimensions")
    f0 = frames[0]
    if (
        f0.get("x", 0) or f0.get("y", 0)
        or f0["w"] != canvas_w or f0["h"] != canvas_h
    ):
        raise ValueError("frame 0 (the default image) must cover the canvas")
    ihdr = struct.pack(">IIBBBBB", canvas_w, canvas_h, 8, 6, 0, 0, 0)
    body = _png_chunk(b"IHDR", ihdr)
    body += _png_chunk(
        b"acTL", struct.pack(">II", len(frames), num_plays)
    )
    seq = 0
    for fi, f in enumerate(frames):
        x, y, w, h = f.get("x", 0), f.get("y", 0), f["w"], f["h"]
        if x + w > canvas_w or y + h > canvas_h:
            raise ValueError("frame rect outside canvas")
        rgba = f["rgba"]
        if len(rgba) != w * h * 4:
            raise ValueError("rgba does not match frame dimensions")
        dnum, dden = f.get("delay", (1, 10))
        dispose, blend = f.get("dispose", 0), f.get("blend", 0)
        if dispose > 2 or blend > 1:
            raise ValueError("bad dispose/blend op")
        if not (0 <= dnum <= 0xFFFF and 0 <= dden <= 0xFFFF):
            raise ValueError("delay out of range")
        fctl = struct.pack(
            ">IIIIIHHBB", seq, w, h, x, y, dnum, dden, dispose, blend
        )
        seq += 1
        body += _png_chunk(b"fcTL", fctl)
        raw = b"".join(
            b"\x00" + rgba[j * w * 4 : (j + 1) * w * 4] for j in range(h)
        )
        comp = zlib.compress(raw)
        if fi == 0:
            body += _png_chunk(b"IDAT", comp)
        else:
            body += _png_chunk(
                b"fdAT", struct.pack(">I", seq) + comp
            )
            seq += 1
    return _SIGNATURE + body + _png_chunk(b"IEND", b"")


def iter_time_sampled_composed_apng_frames(
    data: bytes, every_ms: int = 100, max_samples: int | None = 8
):
    """TIME-BASED sampling over the composed APNG — the GIF/WebP
    contract in milliseconds: frame i is visible during
    [start_i, start_i + delay_i) with the last frame visible from its
    start onward (exactly one final sample); delays <= 10 ms are clamped
    to 100 ms (the browser convention).  Yields
    ``(sample_idx, t_ms, frame_idx, (w, h, 4, rgba))`` lazily (head
    samples bank before a mid-stream corruption raises)."""
    if every_ms <= 0:
        raise ValueError("every_ms must be positive")
    return _iter_apng_time_samples(data, every_ms, max_samples)


def _iter_apng_time_samples(data: bytes, every_ms: int, max_samples: int | None):
    # fcTL delays floor to milliseconds; browsers clamp <=10 ms to 100
    yield from iter_time_samples_shared(
        iter_apng_frames_composed(data, with_delay=True),
        every_ms, max_samples, clamp_le=10, clamp_to=100,
    )
