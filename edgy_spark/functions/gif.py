"""Minimal pure-stdlib GIF codec — real LZW image decode without PIL.

Written against the public GIF89a specification (W3C/CompuServe
GRAPHICS INTERCHANGE FORMAT Version 89a: block layout, logical screen
descriptor, color tables, interlacing, and Appendix F's variable-width
LZW) — the same from-spec pattern as the PNG (functions/png.py), JPEG
(functions/jpeg.py), and WAV (functions/wav.py) codecs, cross-validated
against the JVM's independent ``javax.imageio`` GIF plugin in
tests/test_multimodal_real.py (GIF is lossless, so the comparison is
pixel-exact).

Scope (deliberately bounded, stated loudly):
- GIF87a and GIF89a, global and local color tables (2/4/8/16/.../256
  entries); ``decode_gif`` returns the FIRST frame, ``decode_gif_frames``
  every frame (r11) — each at its OWN rect with its own color table and
  GCE transparency; ``decode_gif_frames_composed`` (r12) returns frames
  COMPOSED onto the logical screen — offsets, transparency show-through,
  and disposal methods 0-3 applied (restore-to-background renders as
  transparency, the modern-browser convention) — what a vision-training
  frame sampler consumes;
- variable-width LZW (Appendix F): code width grows 3..12 bits, CLEAR
  resets the table, EOI ends the stream, LSB-first bit packing in
  255-byte sub-blocks, including the deferred-clear streams modern
  encoders emit;
- 4-pass row interlacing (rows 0,8,16.. then 4,12.. then 2,6.. then
  odd rows);
- Graphic Control Extension transparency: output is RGB, or RGBA when
  the first frame's GCE declares a transparent index (alpha 0 there,
  255 elsewhere); other extensions are skipped per spec;
- the per-rect views (``decode_gif`` / ``decode_gif_frames``) return each
  frame at its OWN dimensions (image descriptor w x h) with frame-local
  coordinates; the composed views apply screen placement;
- GCE centisecond delays are decoded and drive
  ``time_sampled_composed_frames`` (r12): the composed frame VISIBLE at
  each regular wall-clock tick — time-based frame sampling for video-style
  training data, where a 2-frame-per-second sampler must not oversample
  short-delay frames.

The encoder exists so tests and the oracle-gated catalog query can
fabricate valid GIFs without an imaging library: it emits root codes
only, issuing CLEAR whenever the decoder's table would force a width
growth — the classic "uncompressed GIF" technique, legal per Appendix F
and decodable by ANY compliant reader (the JVM cross-check pins this).
Real compressed streams come from the JDK's own GIF WRITER in tests, so
the decoder is never checked only against its own inverse.
"""

from __future__ import annotations

import struct

_INTERLACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]  # (first row, step)

#: Decode-side resource bound: a malformed header must raise, never
#: allocate — 64M pixels caps the output buffer at ~256 MB RGBA, far above
#: any legitimate corpus asset and far below an OOM (review r11d).
MAX_PIXELS = 64_000_000



def _color_table(data: bytes, pos: int, flag_byte: int) -> tuple[bytes | None, int]:
    """Read a color table if the descriptor's table flag (bit 7) is set;
    size = 2^(N+1) where N is the low 3 bits.  Returns (rgb bytes, pos)."""
    if not flag_byte & 0x80:
        return None, pos
    n = 2 << (flag_byte & 0x07)
    table = data[pos:pos + 3 * n]
    if len(table) != 3 * n:
        raise ValueError("truncated color table")
    return table, pos + 3 * n


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a sub-block chain (len byte + payload, 0-terminated)."""
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("truncated sub-block chain")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out.extend(data[pos:pos + n])
        if pos + n > len(data):
            raise ValueError("truncated sub-block")
        pos += n


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytes:
    """GIF Appendix F LZW: LSB-first variable-width codes, CLEAR/EOI,
    table grows to 4096 entries then freezes until the next CLEAR."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1

    def reset() -> tuple[list[bytes], int]:
        return [bytes([i]) for i in range(clear)] + [b"", b""], min_code_size + 1

    table, width = reset()
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    i = 0
    n = len(data)
    while len(out) < n_pixels:
        while nbits < width:
            if i >= n:
                raise ValueError("LZW stream ended before all pixels")
            acc |= data[i] << nbits
            nbits += 8
            i += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code == eoi:
            # premature EOI must fail loudly like every other truncation
            # path — padding with zeros (or, interlaced, scattering a short
            # index buffer) would silently corrupt pixel statistics
            if len(out) < n_pixels:
                raise ValueError("LZW stream ended before all pixels")
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("LZW: first code not a root")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]  # the KwKwK case
            table.append(entry)
        else:
            raise ValueError("LZW: code out of range")
        out.extend(entry)
        prev = entry
        # width grows when the NEXT code could not fit (table full to the
        # current width's capacity), capped at 12 bits per spec
        if len(table) == (1 << width) and width < 12:
            width += 1
    return bytes(out[:n_pixels])


def _iter_raw_frames(data: bytes):
    """Low-level frame walk: yield
    ``(left, top, w, h, disposal, transparent, delay_cs, idx, table)``
    per image descriptor, in stream order — index bytes already
    de-interlaced and range-checked against the frame's color table, GCE
    state (transparent index + disposal method + centisecond delay,
    spec 23) attached to the ONE graphic it covers.  Shared by the
    per-rect view (:func:`_iter_frames`), the logical-screen composer
    (:func:`iter_gif_frames_composed`), and the time sampler."""
    _, _, flags = _screen_dims(data)
    global_table, pos = _color_table(data, 13, flags)
    transparent: int | None = None
    disposal = 0
    delay_cs = 0
    any_frame = False
    # ONE pixel budget for the whole asset: per-frame caps alone would
    # let an N-frame animation allocate N x MAX_PIXELS (review r11d)
    budget = MAX_PIXELS
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            if pos + 2 > len(data):
                raise ValueError("truncated extension")
            label = data[pos + 1]
            body, pos = _sub_blocks(data, pos + 2)
            if label == 0xF9 and len(body) >= 4:  # Graphic Control Ext
                transparent = body[3] if body[0] & 0x01 else None
                disposal = (body[0] >> 2) & 0x07
                delay_cs = body[1] | (body[2] << 8)  # little-endian cs
            continue
        if b == 0x2C:  # image descriptor
            if pos + 10 > len(data):
                raise ValueError("truncated image descriptor")
            left, top, w, h, iflags = struct.unpack(
                "<HHHHB", data[pos + 1:pos + 10]
            )
            if w == 0 or h == 0:
                raise ValueError("zero-dimension GIF frame")
            budget -= w * h
            if w * h > MAX_PIXELS or budget < 0:
                raise ValueError(
                    f"implausible dimensions {w}x{h} (asset exceeds the "
                    "MAX_PIXELS decode budget)"
                )
            local_table, pos = _color_table(data, pos + 10, iflags)
            table = local_table if local_table is not None else global_table
            if table is None:
                raise ValueError("no color table for image")
            if pos >= len(data):
                raise ValueError("missing LZW minimum code size")
            min_code = data[pos]
            lzw, pos = _sub_blocks(data, pos + 1)
            idx = _lzw_decode(min_code, lzw, w * h)
            if iflags & 0x40:  # interlaced: 4-pass row scatter
                rows = bytearray(w * h)
                src = 0
                for first, step in _INTERLACE_PASSES:
                    for y in range(first, h, step):
                        rows[y * w:(y + 1) * w] = idx[src:src + w]
                        src += w
                idx = bytes(rows)
            n_entries = len(table) // 3
            if max(idx, default=0) >= n_entries:
                raise ValueError("pixel index out of color-table range")
            any_frame = True
            yield (
                left, top, w, h, disposal, transparent, delay_cs, idx, table
            )
            transparent = None  # a GCE covers ONE following graphic
            disposal = 0
            delay_cs = 0
            continue
        raise ValueError(f"unknown block 0x{b:02X}")
    if not any_frame:
        raise ValueError("no image data before trailer")


def _iter_frames(data: bytes):
    """Yield ``(width, height, channels, pixels)`` per image descriptor,
    in stream order.  Each frame is returned at its OWN rect with its own
    color table and GCE transparency (which, per spec 23, applies only to
    the graphic that follows it); for disposal/composition onto the
    logical screen use :func:`iter_gif_frames_composed` (r12)."""
    for (
        _left, _top, w, h, _disp, transparent, _delay, idx, table
    ) in _iter_raw_frames(data):
        ch = 3 if transparent is None else 4
        out = bytearray(w * h * ch)
        for p, v in enumerate(idx):
            o, e = p * ch, v * 3
            out[o:o + 3] = table[e:e + 3]
            if ch == 4:
                out[o + 3] = 0 if v == transparent else 255
        yield w, h, ch, bytes(out)


def _normalize_gif_errors(it):
    """Wrap a frame generator so every malformed-input failure surfaces
    as ValueError (struct/index errors from fuzzed or truncated crawl
    bytes are normalized) — the ONE error-contract wrapper shared by the
    per-rect and composed iterators, so their surfaces cannot drift."""
    while True:
        try:
            item = next(it)
        except StopIteration:
            return
        except ValueError:
            raise
        except (struct.error, IndexError, OverflowError) as e:
            raise ValueError(
                f"malformed GIF: {type(e).__name__}: {e}"
            ) from e
        yield item


def _screen_dims(data: bytes) -> tuple[int, int, int]:
    """Logical-screen (width, height, flags) from the header — the ONE
    copy of the signature + descriptor-truncation validation, shared by
    the frame walk and the composer so their error surfaces cannot
    drift."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    if len(data) < 13:
        raise ValueError("truncated logical screen descriptor")
    sw, sh, flags, _, _ = struct.unpack("<HHBBB", data[6:13])
    return sw, sh, flags


def iter_gif_frames(data: bytes):
    """Generator over an asset's frames with the normalized error surface
    (every malformed-input failure is ValueError): callers that want the
    frames decoded BEFORE a mid-stream corruption point — an interrupted
    crawl download's partial animation — iterate this and catch the
    ValueError after banking the good frames (the on_error='null'
    operators do exactly that, review r11d)."""
    yield from _normalize_gif_errors(_iter_frames(data))


def decode_gif(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode the FIRST frame into ``(width, height, channels, pixels)``
    with ``pixels`` row-major 8-bit samples — RGB, or RGBA when the
    frame's Graphic Control Extension declares a transparent index.
    Raises ValueError on ANY malformed input (struct/index errors from
    fuzzed or truncated crawl bytes are normalized)."""
    return next(iter_gif_frames(data))


def decode_gif_frames(
    data: bytes, max_frames: int | None = None
) -> list[tuple[int, int, int, bytes]]:
    """Decode up to ``max_frames`` frames of an (animated) GIF — the REAL
    frame-sampling path: each frame at its own rect, in stream order.
    Returns a non-empty list (empty only for ``max_frames <= 0``) or
    raises ValueError."""
    if max_frames is not None and max_frames <= 0:
        return []
    frames = []
    for frame in iter_gif_frames(data):
        frames.append(frame)
        if max_frames is not None and len(frames) >= max_frames:
            break
    return frames


def iter_gif_frames_composed(data: bytes, with_delay: bool = False):
    """Yield ``(screen_w, screen_h, 4, rgba)`` per frame — or, with
    ``with_delay``, ``(delay_cs, screen_w, screen_h, 4, rgba)`` — each
    frame COMPOSED onto the logical screen — what a vision-training frame
    sampler actually consumes (r12; the per-rect view is
    :func:`iter_gif_frames`).

    Spec-conformant composition (GIF89a 23, as browsers render it):

    - frames draw at their (left, top) offset; transparent pixels leave
      the existing canvas content visible (show-through);
    - disposal 0/1 (unspecified / do not dispose): the drawn frame stays;
    - disposal 2 (restore to background): the frame's RECT is cleared to
      fully transparent after its yield — modern renderers composite the
      "background" as transparency, ignoring the legacy background-color
      index;
    - disposal 3 (restore to previous): the canvas reverts to its state
      before the frame was drawn.

    The canvas starts fully transparent (alpha 0, RGB 0).  A frame rect
    extending outside the logical screen is malformed (ValueError), as is
    a composed-output total above the MAX_PIXELS asset budget — callers
    sampling the head of a long animation should stop iterating (or use
    ``decode_gif_frames_composed(max_frames=...)``) before the budget
    trips.  Error surface normalized to ValueError like the per-rect
    iterator."""
    sw, sh, _ = _screen_dims(data)
    if sw == 0 or sh == 0:
        raise ValueError("zero-dimension logical screen")
    if sw * sh > MAX_PIXELS:
        raise ValueError(
            f"implausible logical screen {sw}x{sh} (> MAX_PIXELS)"
        )
    canvas = bytearray(sw * sh * 4)
    budget = MAX_PIXELS  # composed-output budget, separate from decode's
    for rec in _normalize_gif_errors(_iter_raw_frames(data)):
        left, top, w, h, disposal, transparent, delay_cs, idx, table = rec
        if disposal > 3:
            # 4 is the historical off-by-one spelling of restore-to-
            # previous (old encoders); browsers (Firefox, libnsgif) map
            # it to 3.  5-7 are reserved with no de-facto meaning —
            # treated as do-not-dispose like disposal 0/1.
            disposal = 3 if disposal == 4 else 1
        if left + w > sw or top + h > sh:
            raise ValueError(
                f"frame rect {w}x{h}@({left},{top}) outside logical "
                f"screen {sw}x{sh}"
            )
        budget -= sw * sh
        if budget < 0:
            raise ValueError(
                "composed animation exceeds the MAX_PIXELS output budget"
            )
        prev = bytes(canvas) if disposal == 3 else None
        for y in range(h):
            co = ((top + y) * sw + left) * 4
            ro = y * w
            for x in range(w):
                v = idx[ro + x]
                if v != transparent:
                    o = co + x * 4
                    e = v * 3
                    canvas[o:o + 3] = table[e:e + 3]
                    canvas[o + 3] = 255
        out = (sw, sh, 4, bytes(canvas))
        yield (delay_cs,) + out if with_delay else out
        if disposal == 2:
            blank = b"\x00" * (4 * w)
            for y in range(h):
                o = ((top + y) * sw + left) * 4
                canvas[o:o + 4 * w] = blank
        elif disposal == 3:
            canvas = bytearray(prev)


def decode_gif_frames_composed(
    data: bytes, max_frames: int | None = None
) -> list[tuple[int, int, int, bytes]]:
    """Decode up to ``max_frames`` COMPOSED frames (logical-screen RGBA
    with offsets, transparency show-through, and disposal methods
    applied — see :func:`iter_gif_frames_composed`)."""
    if max_frames is not None and max_frames <= 0:
        return []
    frames = []
    for frame in iter_gif_frames_composed(data):
        frames.append(frame)
        if max_frames is not None and len(frames) >= max_frames:
            break
    return frames


def encode_gif(
    width: int,
    height: int,
    rows: list[bytes],
    palette: bytes,
    transparent: int | None = None,
    interlaced: bool = False,
) -> bytes:
    """Encode indexed pixels as a GIF89a with a global color table —
    root-codes-only LZW (CLEAR before every width growth, Appendix F's
    uncompressed technique), optional GCE transparency and interlacing.
    ``palette`` is 3-byte RGB entries (length a power of two, 2..256);
    each row holds one index byte per pixel."""
    n = len(palette) // 3
    if not palette or len(palette) % 3 or n & (n - 1) or not 2 <= n <= 256:
        raise ValueError("palette must hold a power-of-two count of RGB entries")
    if len(rows) != height or any(len(r) != width for r in rows):
        raise ValueError("rows must be height x width index bytes")
    if any(v >= n for r in rows for v in r):
        raise ValueError("pixel index out of palette range")
    if transparent is not None and not 0 <= transparent < n:
        raise ValueError("transparent index out of palette range")
    depth = max(n.bit_length() - 1, 1)  # log2(n); table flag stores depth-1
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (depth - 1), 0, 0)
    out += palette
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    iflags = 0x40 if interlaced else 0
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, iflags)
    # emit pixels in stream order (interlaced scatter order if asked)
    if interlaced:
        ordered = b"".join(
            rows[y] for first, step in _INTERLACE_PASSES
            for y in range(first, height, step)
        )
    else:
        ordered = b"".join(rows)
    out += _lzw_blocks(ordered, depth)
    out += b"\x3b"
    return bytes(out)


def _lzw_blocks(ordered: bytes, depth: int) -> bytes:
    """Root-codes-only LZW of ``ordered`` index bytes: min-code byte +
    255-byte sub-blocks + terminator.  CLEAR is issued before every point
    the decoder's table would force a code-width growth (Appendix F's
    uncompressed technique), so every emitted code stays at the initial
    width and any compliant reader decodes it."""
    min_code = max(depth, 2)
    clear = 1 << min_code
    eoi = clear + 1
    acc = 0
    nbits = 0
    width_bits = min_code + 1
    next_code = eoi + 1  # decoder-side table size after each root code
    codes = bytearray()

    def put(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width_bits
        while nbits >= 8:
            codes.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear)
    for v in ordered:
        # the decoder grows its table after every code; CLEAR before the
        # width would grow keeps every emitted code at width_bits
        if next_code == (1 << width_bits) - 1:
            put(clear)
            next_code = eoi + 1
        put(v)
        next_code += 1
    put(eoi)
    if nbits:
        codes.append(acc & 0xFF)
    out = bytearray([min_code])
    for i in range(0, len(codes), 255):
        chunk = codes[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00"
    return bytes(out)


def encode_gif_animation(
    width: int,
    height: int,
    frames: list[list[bytes]],
    palette: bytes,
    delay_cs: int = 10,
) -> bytes:
    """Encode several same-size frames as a multi-image GIF89a animation
    (one GCE with a ``delay_cs`` centisecond delay per frame, shared
    global color table, root-codes-only LZW per frame).  No NETSCAPE loop
    extension (plays once) — readers that only take frame 1 (our
    ``decode_gif``) see the first frame."""
    if not frames:
        raise ValueError("animation needs at least one frame")
    singles = [
        encode_gif(width, height, rows, palette) for rows in frames
    ]
    # splice: header + global table from the first, then per-frame
    # GCE + image blocks, then one trailer
    head_len = 13 + len(palette)
    out = bytearray(singles[0][:head_len])
    for s in singles:
        gce = bytes([0x21, 0xF9, 4, 0x00]) + struct.pack("<H", delay_cs) + bytes([0, 0])
        out += gce
        # image descriptor .. LZW sub-blocks + their 0x00 terminator,
        # minus only the single-image trailer byte
        out += s[head_len:-1]
    out += b"\x3b"
    return bytes(out)


def rec601_mean(px: bytes, ch: int, w: int, h: int) -> int:
    """Integer Rec.601 mean luma over an interleaved RGB/RGBA buffer —
    THE one luma convention shared by every GIF feature/frame operator
    (and their SQL oracles), extracted so a future change cannot
    desynchronize the operators from each other (review r12).  numpy
    int64 arithmetic since r14 — identical sums to the python-int loop
    (sums stay far below 2^63), severalfold faster post-decode."""
    import numpy as np

    rgb = np.frombuffer(px, dtype=np.uint8).astype(np.int64).reshape(-1, ch)[:, :3]
    return int((rgb * np.array([299, 587, 114])).sum()) // (1000 * w * h)


def time_sampled_composed_frames(
    data: bytes, every_cs: int = 50, max_samples: int | None = 8
) -> list[tuple[int, int, int, tuple[int, int, int, bytes]]]:
    """TIME-BASED frame sampling (r12): the composed frame VISIBLE at
    each regular tick t = 0, every_cs, 2*every_cs, ... centiseconds —
    what a video-style training sampler extracts (a fixed frame rate over
    the animation's own GCE delays, so short-delay frames are not
    oversampled and long-delay frames are not undersampled).

    Frame i is visible during [start_i, start_i + delay_i) with
    start_0 = 0; the LAST frame stays visible from its start onward, so
    exactly one tick at or after it is sampled (the final state).
    Delays of 0 and 1 cs are CLAMPED to 10 cs — the convention every
    major browser applies (the extremely common all-zero-delay GIF plays
    at ~100 ms/frame, it does not collapse instantly), so such frames
    ARE sampled at the clamped rate.

    Decode is LAZY with one-frame lookahead: once ``max_samples`` ticks
    are emitted, no further frame is decoded or composed — sampling the
    head of a long animation never trips the composed-output budget and
    holds at most one frame in memory (unlike an eager decode of the
    whole animation).  Returns
    ``(sample_idx, t_cs, frame_idx, (w, h, 4, rgba))`` tuples, at most
    ``max_samples``."""
    return list(iter_time_sampled_composed_frames(data, every_cs, max_samples))


def iter_time_sampled_composed_frames(
    data: bytes, every_cs: int = 50, max_samples: int | None = 8
):
    """Generator form of :func:`time_sampled_composed_frames`: samples
    yield as each frame's visibility WINDOW completes, so a caller over
    crawl bytes can bank the head samples before a mid-stream corruption
    raises (the r11d banking contract the on_error='null' operators
    rely on).  The one-final-sample of the last frame yields only on
    clean stream exhaustion — before that, whether a frame is last is
    unknowable."""
    # validate at CALL time (a generator body runs only on first next(),
    # which would surface a bad argument far from where it was passed)
    if every_cs <= 0:
        raise ValueError("every_cs must be positive")
    return _iter_time_samples(data, every_cs, max_samples)


def iter_time_samples_shared(gen, every: int, max_samples: int | None,
                             clamp_le: int, clamp_to: int):
    """THE one time-sampling engine shared by all three animation
    families (GIF in centiseconds, animated WebP and APNG in
    milliseconds — extracted in review r14 so the visibility-window /
    final-sample / clamp / lazy-banking contract cannot drift between
    codecs, the rec601_mean precedent).  ``gen`` yields
    ``(delay, *frame)`` tuples; frame i is visible during
    [start_i, start_i + clamped(delay_i)) with the LAST frame visible
    from its start onward (exactly one final sample); delays <=
    ``clamp_le`` are clamped to ``clamp_to`` (the browser convention for
    zero-delay animations).  Samples yield as each frame's window
    completes, so head samples bank before a mid-stream corruption
    raises; once ``max_samples`` ticks are emitted no further frame is
    decoded."""
    if max_samples is not None and max_samples <= 0:
        return

    def clamped(delay: int) -> int:
        return clamp_to if delay <= clamp_le else delay

    emitted = 0
    prev = next(gen)  # no-frame streams raise inside the iterator
    start = 0
    fi = 0
    k = 0
    for nxt in gen:
        end = start + clamped(prev[0])
        while (
            max_samples is None or emitted < max_samples
        ) and k * every < end:
            yield (k, k * every, fi, prev[1:])
            emitted += 1
            k += 1
        if max_samples is not None and emitted >= max_samples:
            return  # stop DECODING, not just emitting
        prev = nxt
        fi += 1
        start = end
    # prev is the last frame: visible from `start` onward — one final
    # sample at the first remaining tick (all later ticks are identical)
    yield (k, k * every, fi, prev[1:])


def blend_rgba_rect(
    canvas: bytearray,
    canvas_w: int,
    rgba: bytes,
    fx: int,
    fy: int,
    fw: int,
    fh: int,
    over: bool,
) -> None:
    """Composite an RGBA frame rect onto an RGBA canvas in place — THE
    one SOURCE/OVER alpha math shared by the animated-WebP and APNG
    composers (review r14; both specs define the identical integer
    compositing formula).  ``over=False`` replaces the rect; ``over``
    alpha-blends with oa = fa + ca*(255-fa)//255 and the rational color
    formula, exact for the fixture alpha values {0, 255}."""
    for j in range(fh):
        crow = ((fy + j) * canvas_w + fx) * 4
        frow = j * fw * 4
        if not over:
            canvas[crow : crow + 4 * fw] = rgba[frow : frow + 4 * fw]
            continue
        for i in range(fw):
            co = crow + 4 * i
            fo = frow + 4 * i
            fa = rgba[fo + 3]
            if fa == 255:
                canvas[co : co + 4] = rgba[fo : fo + 4]
            elif fa == 0:
                pass  # fully transparent: canvas shows through
            else:
                ca = canvas[co + 3]
                oa = fa + ca * (255 - fa) // 255
                if oa == 0:
                    canvas[co : co + 4] = b"\x00\x00\x00\x00"
                else:
                    for c in range(3):
                        canvas[co + c] = (
                            rgba[fo + c] * fa * 255
                            + canvas[co + c] * ca * (255 - fa)
                        ) // (oa * 255)
                    canvas[co + 3] = oa


def _iter_time_samples(data: bytes, every_cs: int, max_samples: int | None):
    # GIF's GCE delay track is centiseconds; browsers clamp <=1 cs to 10
    yield from iter_time_samples_shared(
        iter_gif_frames_composed(data, with_delay=True),
        every_cs, max_samples, clamp_le=1, clamp_to=10,
    )


def encode_gif_animation_rects(
    screen_w: int,
    screen_h: int,
    frames: list[dict],
    palette: bytes,
    delay_cs: int = 10,
) -> bytes:
    """Encode an animation whose frames are SUB-RECTS of the logical
    screen with per-frame disposal and transparency — the fixture
    generator for the composed-frame decode path (r12).

    Each ``frames`` entry: ``{"left", "top", "rows" (h x w index bytes),
    "disposal" (0-3), "transparent" (index or None), "delay_cs"
    (optional per-frame override of ``delay_cs``)}``.  Shared global
    color table, root-codes-only LZW per frame."""
    n = len(palette) // 3
    if not palette or len(palette) % 3 or n & (n - 1) or not 2 <= n <= 256:
        raise ValueError("palette must hold a power-of-two count of RGB entries")
    if not frames:
        raise ValueError("animation needs at least one frame")
    depth = max(n.bit_length() - 1, 1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", screen_w, screen_h, 0x80 | (depth - 1), 0, 0)
    out += palette
    for fr in frames:
        rows = fr["rows"]
        w, h = len(rows[0]), len(rows)
        left, top = fr.get("left", 0), fr.get("top", 0)
        disposal = fr.get("disposal", 0)
        transparent = fr.get("transparent")
        if any(len(r) != w for r in rows):
            raise ValueError("ragged frame rows")
        if any(v >= n for r in rows for v in r):
            raise ValueError("pixel index out of palette range")
        if left + w > screen_w or top + h > screen_h:
            raise ValueError("frame rect outside logical screen")
        if not 0 <= disposal <= 3:
            raise ValueError("disposal must be 0..3")
        if transparent is not None and not 0 <= transparent < n:
            raise ValueError("transparent index out of palette range")
        fr_delay = int(fr.get("delay_cs", delay_cs))
        if not 0 <= fr_delay <= 0xFFFF:
            raise ValueError("delay_cs must be 0..65535")
        gce_flags = (disposal << 2) | (1 if transparent is not None else 0)
        out += bytes([0x21, 0xF9, 4, gce_flags])
        out += struct.pack("<H", fr_delay)
        out += bytes([transparent or 0, 0])
        out += struct.pack("<BHHHHB", 0x2C, left, top, w, h, 0)
        out += _lzw_blocks(b"".join(bytes(r) for r in rows), depth)
    out += b"\x3b"
    return bytes(out)
