"""From-spec baseline JPEG decoder (functions/jpeg.py) cross-validated
against the JVM's independent javax.imageio codec — the JDK both
FABRICATES the fixtures (so the decoder is never tested against its own
inverse; there deliberately is no encoder) and provides the reference
decode.  JPEG decoding is spec-compliant within tolerances (T.83), not
bit-exact across implementations: libjpeg's integer IDCT and smoothing
chroma upsampler differ from our exact-float IDCT + replication, so
grayscale (no chroma path) is held to the tightest bound and color to a
looser one."""

from __future__ import annotations

import pytest


def _jvm_gray_jpeg(spark, w, h, fn):
    jvm = spark._sc._jvm
    img = jvm.java.awt.image.BufferedImage(w, h, 10)  # TYPE_BYTE_GRAY
    raster = img.getRaster()
    for y in range(h):
        for x in range(w):
            raster.setSample(x, y, 0, fn(x, y))
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(img, "jpg", baos)
    return bytes(baos.toByteArray())


def _jvm_rgb_jpeg(spark, w, h, fn):
    jvm = spark._sc._jvm
    img = jvm.java.awt.image.BufferedImage(w, h, 1)  # TYPE_INT_RGB
    for y in range(h):
        for x in range(w):
            r, g, b = fn(x, y)
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(img, "jpg", baos)
    return bytes(baos.toByteArray())


def _jvm_decode(spark, data):
    jvm = spark._sc._jvm
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(data))
    return img


def test_jpeg_gray_matches_jvm_decode(spark):
    """Grayscale: only the IDCT differs between implementations, so every
    pixel must agree within +-2 with the JVM's own decode of the same
    bytes, across a non-8-multiple size that exercises MCU cropping."""
    from edgy_spark.functions.jpeg import decode_jpeg

    w, h = 21, 13
    data = _jvm_gray_jpeg(spark, w, h, lambda x, y: (x * 9 + y * 17) % 256)
    dw, dh, ch, px = decode_jpeg(data)
    assert (dw, dh, ch) == (w, h, 1)
    img = _jvm_decode(spark, data)
    raster = img.getRaster()
    worst = max(
        abs(raster.getSample(x, y, 0) - px[y * w + x])
        for y in range(h)
        for x in range(w)
    )
    assert worst <= 2, f"worst gray delta {worst}"


def test_jpeg_rgb_matches_jvm_decode(spark):
    """Color (the JDK writer subsamples chroma): smooth gradients keep the
    upsampler difference small — every channel within +-8 of the JVM's
    decode, dimensions exact."""
    from edgy_spark.functions.jpeg import decode_jpeg

    w, h = 19, 11
    data = _jvm_rgb_jpeg(
        spark, w, h,
        lambda x, y: ((x * 6) % 256, (y * 8) % 256, ((x + y) * 4) % 256),
    )
    dw, dh, ch, px = decode_jpeg(data)
    assert (dw, dh, ch) == (w, h, 3)
    img = _jvm_decode(spark, data)
    worst = 0
    for y in range(h):
        for x in range(w):
            argb = img.getRGB(x, y)
            want = ((argb >> 16) & 0xFF, (argb >> 8) & 0xFF, argb & 0xFF)
            i = (y * w + x) * 3
            got = (px[i], px[i + 1], px[i + 2])
            worst = max(worst, *(abs(a - b) for a, b in zip(want, got)))
    assert worst <= 8, f"worst rgb delta {worst}"


def test_jpeg_solid_color_decodes_flat(spark):
    """A solid-color image has no frequency content: replication vs
    smoothing upsamplers agree exactly, so every pixel must be within
    +-3 of the encoder's input color."""
    from edgy_spark.functions.jpeg import decode_jpeg

    data = _jvm_rgb_jpeg(spark, 16, 16, lambda x, y: (200, 40, 90))
    dw, dh, ch, px = decode_jpeg(data)
    assert (dw, dh, ch) == (16, 16, 3)
    for i in range(0, len(px), 3):
        assert abs(px[i] - 200) <= 3
        assert abs(px[i + 1] - 40) <= 3
        assert abs(px[i + 2] - 90) <= 3


def test_jpeg_rejects_garbage_and_unsupported():
    from edgy_spark.functions.jpeg import decode_jpeg

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")
    # minimal SOI + EOI with no scan
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xd9")


def test_decode_features_jpeg_runs_real_decode_in_spark(spark):
    """The mapInPandas operator decodes REAL JPEG pixels inside Python
    workers: true dimensions and a luma within JPEG tolerance of the
    encoded solid colors (values no header-only parser could produce)."""
    import hashlib

    from edgy_spark.operators.multimodal import decode_features_jpeg

    bright = _jvm_rgb_jpeg(spark, 24, 10, lambda x, y: (250, 250, 250))
    dark = _jvm_gray_jpeg(spark, 9, 17, lambda x, y: 20)
    df = spark.createDataFrame(
        [(1, bytearray(bright)), (2, bytearray(dark))], "doc_id long, media binary"
    ).repartition(2)
    got = {r["doc_id"]: r for r in decode_features_jpeg(df).collect()}
    assert (got[1]["width"], got[1]["height"]) == (24, 10)
    assert abs(got[1]["mean_luma"] - 250) <= 3
    assert (got[2]["width"], got[2]["height"]) == (9, 17)
    assert abs(got[2]["mean_luma"] - 20) <= 3
    assert got[1]["content_md5"] == hashlib.md5(bright).hexdigest()


def test_jpeg_restart_interval_resets_dc_prediction():
    """DRI/RSTn path, pinned with a hand-assembled stream (the JDK writer
    never emits restart markers): two DC-only MCUs with DRI=1 — the
    predictor must reset at the marker, so MCU2's diff of -40 lands at
    absolute DC -40, not 40.  Identity quant table makes expected pixels
    exact: round(DC/8) + 128."""
    import struct

    from edgy_spark.functions.jpeg import decode_jpeg

    # Annex K.3.1 standard tables (luminance)
    dc_bits = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    dc_vals = bytes(range(12))
    ac_bits = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
    ac_vals = bytes([
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

    def canonical(bits, vals):
        lut, code, k = {}, 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                lut[vals[k]] = (length, code)
                code += 1
                k += 1
            code <<= 1
        return lut

    dc_lut = canonical(dc_bits, dc_vals)
    ac_lut = canonical(ac_bits, list(ac_vals))

    class Bits:
        def __init__(self):
            self.out = bytearray()
            self.acc = 0
            self.n = 0

        def put(self, value, nbits):
            for i in range(nbits - 1, -1, -1):
                self.acc = (self.acc << 1) | ((value >> i) & 1)
                self.n += 1
                if self.n == 8:
                    self.out.append(self.acc)
                    if self.acc == 0xFF:
                        self.out.append(0x00)  # byte stuffing
                    self.acc = 0
                    self.n = 0

        def flush(self):
            while self.n:
                self.put(1, 1)  # pad with 1-bits per spec
            return bytes(self.out)

    def dc_only_mcu(diff):
        b = Bits()
        t = 0 if diff == 0 else abs(diff).bit_length()
        length, code = dc_lut[t]
        b.put(code, length)
        if t:
            mag = diff if diff >= 0 else diff + (1 << t) - 1
            b.put(mag, t)
        length, code = ac_lut[0x00]  # EOB
        b.put(code, length)
        return b.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    qt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # identity quant
    sof = seg(0xC0, struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0]))
    dht = seg(0xC4, bytes([0x00]) + bytes(dc_bits) + dc_vals) + seg(
        0xC4, bytes([0x10]) + bytes(ac_bits) + ac_vals
    )
    dri = seg(0xDD, struct.pack(">H", 1))
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    stream = (
        b"\xff\xd8" + qt + sof + dht + dri + sos
        + dc_only_mcu(80) + b"\xff\xd0" + dc_only_mcu(-40) + b"\xff\xd9"
    )
    w, h, ch, px = decode_jpeg(stream)
    assert (w, h, ch) == (16, 8, 1)
    left = {px[y * 16 + x] for y in range(8) for x in range(8)}
    right = {px[y * 16 + 8 + x] for y in range(8) for x in range(8)}
    assert left == {138}   # round(80/8) + 128
    assert right == {123}  # predictor RESET: round(-40/8) + 128


def test_encode_jpeg_flat_roundtrip_exact():
    """The DC-only flat-block family is bit-exact by construction: encode
    -> decode must reproduce every block constant EXACTLY (no JPEG
    tolerance), across extreme samples (0, 255), a predictor walk that
    exercises every DC category sign, and a single-block image."""
    from edgy_spark.functions.jpeg import decode_jpeg, encode_jpeg_flat

    cases = [
        (8, 8, [0]),
        (8, 8, [255]),
        (40, 32, [(7 * b * b + 3) % 256 for b in range(20)]),
        (16, 8, [0, 255]),  # max-magnitude DC swing (diff = 255 then -255)
    ]
    for w, h, blocks in cases:
        dw, dh, ch, px = decode_jpeg(encode_jpeg_flat(w, h, blocks))
        assert (dw, dh, ch) == (w, h, 1)
        bw = w // 8
        for bi, want in enumerate(blocks):
            by, bx = divmod(bi, bw)
            got = {
                px[(by * 8 + y) * w + bx * 8 + x]
                for y in range(8)
                for x in range(8)
            }
            assert got == {want}, (w, h, bi, want, got)


def test_encode_jpeg_flat_matches_jvm_decode(spark):
    """The flat encoder's output is real JPEG to an INDEPENDENT decoder:
    javax.imageio reads the bytes and reproduces the same pixels.  libjpeg
    derivatives shortcut DC-only blocks to an exact shift, so the match is
    held pixel-exact — any Huffman-table, byte-stuffing, or marker-layout
    bug in the encoder surfaces here, not just against our own decoder."""
    from edgy_spark.functions.jpeg import encode_jpeg_flat

    w, h = 32, 24
    blocks = [(b * 41 + 5) % 256 for b in range(12)]
    data = encode_jpeg_flat(w, h, blocks)
    img = _jvm_decode(spark, data)
    assert (img.getWidth(), img.getHeight()) == (w, h)
    raster = img.getRaster()
    for bi, want in enumerate(blocks):
        by, bx = divmod(bi, w // 8)
        got = {
            raster.getSample(bx * 8 + x, by * 8 + y, 0)
            for y in range(8)
            for x in range(8)
        }
        assert got == {want}, (bi, want, got)


def test_encode_jpeg_flat_validates():
    from edgy_spark.functions.jpeg import encode_jpeg_flat

    with pytest.raises(ValueError, match="block-aligned"):
        encode_jpeg_flat(12, 8, [0, 0])
    with pytest.raises(ValueError, match="block samples"):
        encode_jpeg_flat(16, 8, [0])
    with pytest.raises(ValueError, match="0..255"):
        encode_jpeg_flat(8, 8, [256])


def test_idct_dc_shortcut_bit_identical_to_general_path():
    """The DC-only IDCT shortcut must be indistinguishable from the full
    separable transform — checked across the whole dequantized DC range a
    baseline JPEG can produce (12-bit coefficient x 8-bit quant), plus the
    general path still engaging when any AC coefficient is set."""
    from edgy_spark.functions import jpeg as J

    def general(coef):
        # the pre-shortcut formulation, kept verbatim for the comparison
        tmp = [0.0] * 64
        for y in range(8):
            row = coef[y * 8:y * 8 + 8]
            if not any(row):
                continue
            for x in range(8):
                acc = 0.0
                cx = J._COS[x]
                for u in range(8):
                    if row[u]:
                        acc += cx[u] * row[u]
                tmp[y * 8 + x] = acc
        out = [0] * 64
        for x in range(8):
            col = [tmp[y * 8 + x] for y in range(8)]
            for y in range(8):
                acc = 0.0
                cy = J._COS[y]
                for v in range(8):
                    acc += cy[v] * col[v]
            # NOTE: indentation preserved from the module's general path
                s = int(round(acc)) + 128
                out[y * 8 + x] = 0 if s < 0 else (255 if s > 255 else s)
        return out

    for dc in range(-522240, 522241, 997):  # stride covers sign/clamp edges
        coef = [dc] + [0] * 63
        assert J._idct_block(coef) == general(coef), dc
    for dc in (-1024, -129, -128, -1, 0, 1, 127, 128, 1023):
        coef = [dc] + [0] * 63
        assert J._idct_block(coef) == general(coef), dc
    # AC set -> shortcut must NOT fire; spot-check against the reference
    coef = [300] + [0] * 63
    coef[5] = -77
    assert J._idct_block(coef) == general(coef)


def test_bitreader_skips_ff_fill_bytes():
    """T.81 B.1.1.2 permits any number of 0xFF fill bytes before a marker
    (including RSTn inside entropy data); spec-legal streams with fill
    padding must not be rejected as malformed (review r09 advice)."""
    from edgy_spark.functions.jpeg import _BitReader, _RestartMarker

    # fill 0xFF before a stuffed 0xFF00 data byte: reads 0xAA, 0xFF, 0xCC
    r = _BitReader(bytes([0xAA, 0xFF, 0xFF, 0x00, 0xCC]), 0)
    assert r.receive(8) == 0xAA
    assert r.receive(8) == 0xFF
    assert r.receive(8) == 0xCC

    # fill 0xFFs before a restart marker: raises _RestartMarker positioned
    # ON the marker (caller consumes the two marker bytes from there)
    r = _BitReader(bytes([0xAB, 0xFF, 0xFF, 0xFF, 0xD3]), 0)
    assert r.receive(8) == 0xAB
    try:
        r.receive(8)
        raise AssertionError("expected _RestartMarker")
    except _RestartMarker as m:
        assert r.data[m.at : m.at + 2] == bytes([0xFF, 0xD3])


def _jvm_progressive_jpeg(spark, w, h, fn, gray):
    """Fabricate a REAL progressive (SOF2) JPEG through the JDK writer
    (ImageWriteParam.MODE_DEFAULT emits the standard multi-scan script:
    DC first + spectral-selection AC scans + successive approximation)."""
    jvm = spark._sc._jvm
    img = jvm.java.awt.image.BufferedImage(w, h, 10 if gray else 1)
    if gray:
        raster = img.getRaster()
        for y in range(h):
            for x in range(w):
                raster.setSample(x, y, 0, fn(x, y))
    else:
        for y in range(h):
            for x in range(w):
                r, g, b = fn(x, y)
                img.setRGB(x, y, (r << 16) | (g << 8) | b)
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    param = writer.getDefaultWriteParam()
    param.setProgressiveMode(jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
    writer.write(None, jvm.javax.imageio.IIOImage(img, None, None), param)
    ios.flush()
    writer.dispose()
    data = bytes(baos.toByteArray())
    assert b"\xff\xc2" in data  # really progressive
    return data


def test_jpeg_progressive_gray_matches_jvm_decode(spark):
    """Progressive grayscale (DC first/refine + AC first/refine scans with
    EOB runs, no chroma path): the coefficient store must reconstruct the
    identical quantized coefficients the sequential decoder would see, so
    the decode matches the JVM's within the same IDCT-only tolerance."""
    from edgy_spark.functions.jpeg import decode_jpeg

    w, h = 21, 13
    data = _jvm_progressive_jpeg(
        spark, w, h, lambda x, y: (x * 9 + y * 17) % 256, True
    )
    dw, dh, ch, px = decode_jpeg(data)
    assert (dw, dh, ch) == (w, h, 1)
    raster = _jvm_decode(spark, data).getRaster()
    worst = max(
        abs(raster.getSample(x, y, 0) - px[y * w + x])
        for y in range(h)
        for x in range(w)
    )
    assert worst <= 2, f"worst progressive gray delta {worst}"


def test_jpeg_progressive_rgb_matches_jvm_decode(spark):
    """Progressive color: non-interleaved AC scans per component + the
    interleaved DC scan + subsampled chroma — same +-8 bound as the
    baseline color test (upsampler difference dominates)."""
    from edgy_spark.functions.jpeg import decode_jpeg

    w, h = 19, 11
    data = _jvm_progressive_jpeg(
        spark, w, h,
        lambda x, y: ((x * 6) % 256, (y * 8) % 256, ((x + y) * 4) % 256),
        False,
    )
    dw, dh, ch, px = decode_jpeg(data)
    assert (dw, dh, ch) == (w, h, 3)
    img = _jvm_decode(spark, data)
    worst = 0
    for y in range(h):
        for x in range(w):
            argb = img.getRGB(x, y)
            want = ((argb >> 16) & 0xFF, (argb >> 8) & 0xFF, argb & 0xFF)
            i = (y * w + x) * 3
            got = (px[i], px[i + 1], px[i + 2])
            worst = max(worst, *(abs(a - b) for a, b in zip(want, got)))
    assert worst <= 8, f"worst progressive rgb delta {worst}"


def test_jpeg_flat_progressive_bit_exact_and_jvm_readable(spark):
    """The flat progressive encoder's streams decode BIT-EXACTLY (DC split
    as (d >> 1) << 1 | (d & 1) across first + refinement scans), and the
    JVM's independent decoder reads the same bytes to the same samples —
    the no-self-inverse property held for the progressive family too."""
    from edgy_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg_flat_progressive,
    )

    blocks = [10, 100, 200, 35, 77, 250]
    data = encode_jpeg_flat_progressive(24, 16, blocks)
    assert b"\xff\xc2" in data
    w, h, ch, px = decode_jpeg(data)
    assert (w, h, ch) == (24, 16, 1)
    for by in range(2):
        for bx in range(3):
            s = blocks[by * 3 + bx]
            assert all(
                px[(by * 8 + yy) * w + bx * 8 + xx] == s
                for yy in range(8)
                for xx in range(8)
            )
    raster = _jvm_decode(spark, data).getRaster()
    got = [
        raster.getSample(bx * 8, by * 8, 0)
        for by in range(2)
        for bx in range(3)
    ]
    assert got == blocks


def test_jpeg_restart_with_fill_bytes_decodes(spark):
    """T.81 B.1.1.2 fill bytes BEFORE an RSTn in a baseline stream: the
    sequential restart consumption shares the progressive path's
    fill-tolerant marker scan (review r10 — the inline copy rejected
    spec-legal padding)."""
    import struct

    from edgy_spark.functions.jpeg import (
        STD_AC_LUMA_BITS,
        STD_AC_LUMA_VALS,
        STD_DC_LUMA_BITS,
        STD_DC_LUMA_VALS,
        _BitWriter,
        _canonical_codes,
        decode_jpeg,
    )

    dc_lut = _canonical_codes(STD_DC_LUMA_BITS, STD_DC_LUMA_VALS)
    ac_lut = _canonical_codes(STD_AC_LUMA_BITS, STD_AC_LUMA_VALS)

    def dc_only_mcu(diff):
        b = _BitWriter()
        t = 0 if diff == 0 else abs(diff).bit_length()
        length, code = dc_lut[t]
        b.put(code, length)
        if t:
            mag = diff if diff >= 0 else diff + (1 << t) - 1
            b.put(mag, t)
        length, code = ac_lut[0x00]
        b.put(code, length)
        return b.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    qt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = seg(0xC0, struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0]))
    dht = seg(0xC4, bytes([0x00]) + bytes(STD_DC_LUMA_BITS) + STD_DC_LUMA_VALS) + seg(
        0xC4, bytes([0x10]) + bytes(STD_AC_LUMA_BITS) + STD_AC_LUMA_VALS
    )
    dri = seg(0xDD, struct.pack(">H", 1))
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    stream = (
        b"\xff\xd8" + qt + sof + dht + dri + sos
        + dc_only_mcu(80) + b"\xff\xff\xff\xd0"  # two fill bytes + RST0
        + dc_only_mcu(-40) + b"\xff\xd9"
    )
    w, h, ch, px = decode_jpeg(stream)
    assert (w, h, ch) == (16, 8, 1)
    assert {px[y * 16 + x] for y in range(8) for x in range(8)} == {138}
    assert {px[y * 16 + 8 + x] for y in range(8) for x in range(8)} == {123}


def test_jpeg_flat_multiscan_bit_exact_and_jvm_readable(spark):
    """MULTI-SCAN SEQUENTIAL (T.81 A.2.3, r11): a 3-component SOF0 frame
    whose Y arrives in its own scan and Cb+Cr arrive interleaved in a
    second scan must decode bit-exactly (Cb=Cr=128 makes R=G=B=Y), and
    the JVM's independent decoder must read the same bytes to the same
    samples."""
    from edgy_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg_flat_multiscan,
    )

    blocks = [10, 100, 200, 35, 77, 250]
    data = encode_jpeg_flat_multiscan(24, 16, blocks)
    assert data.count(b"\xff\xda") == 2  # really two scans
    w, h, ch, px = decode_jpeg(data)
    assert (w, h, ch) == (24, 16, 3)
    for by in range(2):
        for bx in range(3):
            s = blocks[by * 3 + bx]
            for yy in range(8):
                for xx in range(8):
                    o = ((by * 8 + yy) * w + bx * 8 + xx) * 3
                    assert tuple(px[o:o + 3]) == (s, s, s), (by, bx, yy, xx)
    img = _jvm_decode(spark, data)
    for by in range(2):
        for bx in range(3):
            argb = img.getRGB(bx * 8, by * 8)
            s = blocks[by * 3 + bx]
            assert ((argb >> 16) & 0xFF, (argb >> 8) & 0xFF, argb & 0xFF) == (s, s, s)


def test_jpeg_flat_multiscan_restart_intervals(spark):
    """Multi-scan sequential WITH restart intervals (r11b): RSTn markers
    inside both the non-interleaved Y scan and the interleaved Cb/Cr scan
    must reset DC prediction and the marker sequence per scan
    (_sequential_scan's restart branch), bit-exactly — and the JVM's
    independent decoder must agree on the same bytes."""
    from edgy_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg_flat_multiscan,
    )

    blocks = [10, 100, 200, 35, 77, 250, 5, 130, 222, 64, 99, 180]
    for ri in (1, 3, 5):
        data = encode_jpeg_flat_multiscan(32, 24, blocks, restart_interval=ri)
        assert b"\xff\xdd" in data  # DRI present
        assert any(bytes([0xFF, 0xD0 + k]) in data for k in range(8))
        w, h, ch, px = decode_jpeg(data)
        assert (w, h, ch) == (32, 24, 3)
        for bi, s in enumerate(blocks):
            by, bx = divmod(bi, 4)
            for yy in (0, 7):
                for xx in (0, 7):
                    o = ((by * 8 + yy) * w + bx * 8 + xx) * 3
                    assert tuple(px[o:o + 3]) == (s, s, s), (ri, bi)
        img = _jvm_decode(spark, data)
        for bi, s in enumerate(blocks):
            by, bx = divmod(bi, 4)
            argb = img.getRGB(bx * 8, by * 8)
            assert ((argb >> 16) & 0xFF, (argb >> 8) & 0xFF, argb & 0xFF) == (s, s, s), (ri, bi)


def test_jpeg_cmyk_bit_exact_both_transforms():
    """Adobe 4-component decode (r12): transform 0 (inverted CMY stored
    directly) and transform 2 (YCCK — YCbCr inverse + libjpeg-convention
    inversion) must both reconstruct RGB = luma * k // 255 exactly."""
    from edgy_spark.functions.jpeg import decode_jpeg, encode_jpeg_flat_cmyk

    lum = [0, 17, 128, 255, 77, 200]
    kk = [255, 128, 0, 255, 31, 99]
    for tr in (0, 2):
        data = encode_jpeg_flat_cmyk(24, 16, lum, kk, transform=tr)
        assert b"Adobe" in data
        w, h, ch, px = decode_jpeg(data)
        assert (w, h, ch) == (24, 16, 3)
        for b in range(6):
            exp = lum[b] * kk[b] // 255
            by, bx = divmod(b, 3)
            for yy in (0, 7):
                for xx in (0, 7):
                    o = ((by * 8 + yy) * w + bx * 8 + xx) * 3
                    assert tuple(px[o:o + 3]) == (exp, exp, exp), (tr, b)


def test_jpeg_cmyk_without_app14_is_rejected():
    """A 4-component frame with no Adobe APP14 marker has unknowable CMYK
    polarity — honest NotImplementedError, never a silently-wrong guess."""
    import struct

    import pytest

    from edgy_spark.functions.jpeg import decode_jpeg, encode_jpeg_flat_cmyk

    data = encode_jpeg_flat_cmyk(8, 8, [100], [200])
    seglen = struct.unpack(">H", data[4:6])[0]
    stripped = data[:2] + data[4 + seglen:]  # drop the APP14 segment
    with pytest.raises(NotImplementedError, match="APP14"):
        decode_jpeg(stripped)


def test_jpeg_cmyk_matches_jvm_decode(spark):
    """Cross-validation against javax.imageio (JDK-8041125 reads Adobe
    CMYK/YCCK): the JDK color-manages — its RGB is the sRGB encoding of
    the linear product — so the prediction from OUR decoded samples is
    round(255 * srgb(luma * k / 255^2)); agreement within +-1 proves both
    decoders recover the same underlying 4-component samples through the
    Huffman / APP14 / YCCK machinery."""
    from edgy_spark.functions.jpeg import decode_jpeg, encode_jpeg_flat_cmyk

    def srgb(p: float) -> float:
        return p * 12.92 if p <= 0.0031308 else 1.055 * p ** (1 / 2.4) - 0.055

    lum = [0, 17, 128, 255, 77, 200]
    kk = [255, 128, 0, 255, 31, 99]
    for tr in (0, 2):
        data = encode_jpeg_flat_cmyk(24, 16, lum, kk, transform=tr)
        w, h, ch, px = decode_jpeg(data)
        img = _jvm_decode(spark, data)
        assert (img.getWidth(), img.getHeight()) == (w, h)
        for b in range(6):
            by, bx = divmod(b, 3)
            argb = img.getRGB(bx * 8 + 3, by * 8 + 3)
            jdk = ((argb >> 16) & 0xFF, (argb >> 8) & 0xFF, argb & 0xFF)
            pred = round(255 * srgb(lum[b] * kk[b] / 65025))
            assert all(abs(c - pred) <= 1 for c in jdk), (tr, b, jdk, pred)
            o = ((by * 8 + 3) * w + bx * 8 + 3) * 3
            assert px[o] == lum[b] * kk[b] // 255, (tr, b)


def test_jpeg_3comp_adobe_transform0_is_rgb_passthrough():
    """APP14 transform 0 on a THREE-component frame means the samples are
    stored RGB, not YCbCr (libjpeg's jdcolor convention) — the decoder
    must pass them through instead of garbling via the YCbCr inverse."""
    import struct

    from edgy_spark.functions.jpeg import decode_jpeg, encode_jpeg_flat_multiscan

    blocks = [10, 100, 200, 35, 77, 250]
    data = encode_jpeg_flat_multiscan(24, 16, blocks)
    # without APP14: JFIF YCbCr, Cb=Cr=128 -> gray (s, s, s)
    _, _, _, px = decode_jpeg(data)
    assert tuple(px[:3]) == (blocks[0], blocks[0], blocks[0])
    # splice an Adobe APP14 transform-0 right after SOI: channels are now
    # stored RGB -> (s, 128, 128) verbatim
    app14 = b"\xff\xee" + struct.pack(">H", 14) + b"Adobe" + struct.pack(
        ">HHHB", 100, 0, 0, 0
    )
    tagged = data[:2] + app14 + data[2:]
    w, h, ch, px = decode_jpeg(tagged)
    assert (w, h, ch) == (24, 16, 3)
    for b, s in enumerate(blocks):
        by, bx = divmod(b, 3)
        o = ((by * 8 + 3) * w + bx * 8 + 3) * 3
        assert tuple(px[o:o + 3]) == (s, 128, 128), b
    # transform 1 (explicit YCbCr) keeps the JFIF conversion
    app14_ycc = app14[:-1] + b"\x01"
    _, _, _, px = decode_jpeg(data[:2] + app14_ycc + data[2:])
    assert tuple(px[:3]) == (blocks[0], blocks[0], blocks[0])


def test_jpeg_3comp_rgb_component_ids_passthrough():
    """APP14-less 3-component frames whose component IDs spell 'R','G','B'
    are stored RGB (libjpeg jdmaster's fallback guess) — passthrough, not
    the YCbCr inverse."""
    from edgy_spark.functions.jpeg import decode_jpeg, encode_jpeg_flat_multiscan

    blocks = [10, 100, 200, 35, 77, 250]
    data = encode_jpeg_flat_multiscan(24, 16, blocks)
    sof_ids = b"\x01\x11\x00\x02\x11\x00\x03\x11\x00"
    sos1_ids = b"\x01\x01\x00\x00\x3f\x00"
    sos2_ids = b"\x02\x02\x00\x03\x00\x00\x3f\x00"
    assert data.count(sof_ids) == 1 and data.count(sos1_ids) == 1
    assert data.count(sos2_ids) == 1
    patched = (
        data.replace(sof_ids, b"\x52\x11\x00\x47\x11\x00\x42\x11\x00")
        .replace(sos1_ids, b"\x01\x52\x00\x00\x3f\x00")
        .replace(sos2_ids, b"\x02\x47\x00\x42\x00\x00\x3f\x00")
    )
    w, h, ch, px = decode_jpeg(patched)
    assert (w, h, ch) == (24, 16, 3)
    for b, s in enumerate(blocks):
        by, bx = divmod(b, 3)
        o = ((by * 8 + 3) * w + bx * 8 + 3) * 3
        assert tuple(px[o:o + 3]) == (s, 128, 128), b


# ---------------------------------------------------------------------------
# lossless JPEG (SOF3, T.81 Annex H) — r14.  The JDK's javax.imageio
# reader has no SOF3 support, so (uniquely in this file) the lane is
# anchored on round-trips across every predictor/precision, a
# hand-coded stream pin, and the crawl-robustness contract.
# ---------------------------------------------------------------------------


def test_lossless_roundtrip_all_predictors_and_precisions():
    import random

    from edgy_spark.functions.jpeg import (
        decode_jpeg_lossless,
        encode_jpeg_lossless,
    )

    rng = random.Random(41)
    for prec in (2, 4, 8, 12, 16):
        for psv in range(1, 8):
            w, h = rng.randint(1, 8), rng.randint(1, 8)
            src = [rng.randrange(1 << prec) for _ in range(w * h)]
            data = encode_jpeg_lossless(
                w, h, src, precision=prec, predictor=psv
            )
            assert decode_jpeg_lossless(data) == (w, h, 1, prec, src)


def test_lossless_restart_interval_resets_prediction():
    from edgy_spark.functions.jpeg import (
        decode_jpeg_lossless,
        encode_jpeg_lossless,
    )

    src = [(i * 89) % 4096 for i in range(6 * 5)]
    plain = encode_jpeg_lossless(6, 5, src, precision=12, predictor=7)
    rst = encode_jpeg_lossless(
        6, 5, src, precision=12, predictor=7, restart_interval=7
    )
    assert decode_jpeg_lossless(plain) == decode_jpeg_lossless(rst)
    assert b"\xff\xd0" in rst or b"\xff\xd1" in rst  # real RSTn markers


def test_lossless_8bit_flows_through_pixel_api():
    from edgy_spark.functions.jpeg import decode_jpeg, encode_jpeg_lossless

    src = [1, 255, 77, 0, 128, 9]
    data = encode_jpeg_lossless(3, 2, src, precision=8, predictor=4)
    assert decode_jpeg(data) == (3, 2, 1, bytes(src))


def test_lossless_high_precision_guards_pixel_api():
    import pytest as _pytest

    from edgy_spark.functions.jpeg import decode_jpeg, encode_jpeg_lossless

    data = encode_jpeg_lossless(2, 2, [0, 1, 2, 3], precision=12)
    with _pytest.raises(ValueError, match="decode_jpeg_lossless"):
        decode_jpeg(data)


def test_lossless_truncation_and_corruption_never_crash():
    import random

    from edgy_spark.functions.jpeg import (
        decode_jpeg_lossless,
        encode_jpeg_lossless,
    )

    data = bytearray(
        encode_jpeg_lossless(
            5, 4, [(i * 13) % 65536 for i in range(20)], precision=16,
            predictor=5,
        )
    )
    for k in range(len(data)):
        try:
            decode_jpeg_lossless(bytes(data[:k]))
        except (ValueError, NotImplementedError):
            pass
    rng = random.Random(8)
    for _ in range(150):
        i = rng.randrange(len(data))
        orig = data[i]
        data[i] = rng.randrange(256)
        try:
            decode_jpeg_lossless(bytes(data))
        except (ValueError, NotImplementedError):
            pass
        data[i] = orig


def test_lossless_encoder_validates_inputs():
    import pytest as _pytest

    from edgy_spark.functions.jpeg import encode_jpeg_lossless

    with _pytest.raises(ValueError):
        encode_jpeg_lossless(2, 1, [0, 1], precision=17)
    with _pytest.raises(ValueError):
        encode_jpeg_lossless(2, 1, [0, 256], precision=8)
    with _pytest.raises(ValueError):
        encode_jpeg_lossless(2, 1, [0, 1], predictor=8)
    with _pytest.raises(ValueError):
        encode_jpeg_lossless(2, 1, [0], precision=8)


def test_decode_features_jpeg_lossless_on_error_null(spark):
    import pytest as _pytest

    from edgy_spark.functions.jpeg import (
        encode_jpeg_flat,
        encode_jpeg_lossless,
    )
    from edgy_spark.operators.multimodal import decode_features_jpeg_lossless

    good = encode_jpeg_lossless(
        2, 2, [100, 4000, 0, 4095], precision=12, predictor=2
    )
    dct = encode_jpeg_flat(8, 8, [50])  # SOF0: not a lossless frame
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(good[:25])), (3, None),
         (4, bytearray(dct))],
        "doc_id long, media binary",
    )
    with _pytest.raises(Exception):
        decode_features_jpeg_lossless(df).collect()
    rows = {
        r["doc_id"]: r
        for r in decode_features_jpeg_lossless(df, on_error="null").collect()
    }
    assert rows[1]["precision"] == 12 and rows[1]["decode_error"] is None
    assert rows[1]["mean_sample"] == (100 + 4000 + 0 + 4095) // 4
    assert rows[2]["precision"] is None and rows[2]["decode_error"]
    assert rows[3]["decode_error"] == "NULL media payload"
    assert "lossless" in rows[4]["decode_error"]


def _two_component_sof3(w, h, comp_a, comp_b, psv=1):
    """Hand-assemble an 8-bit TWO-component interleaved SOF3 stream (the
    encoder is single-component; this pins the decoder's multi-component
    lane and the pixel-API guard)."""
    import struct as _struct

    from edgy_spark.functions.jpeg import (
        _LOSSLESS_BITS,
        _LOSSLESS_VALS,
        _BitWriter,
    )

    out = bytearray(b"\xff\xd8")
    sof = _struct.pack(">BHHB", 8, h, w, 2) + bytes((1, 0x11, 0, 2, 0x11, 0))
    out += b"\xff\xc3" + _struct.pack(">H", 2 + len(sof)) + sof
    dht = bytes([0x00]) + bytes(_LOSSLESS_BITS) + _LOSSLESS_VALS
    out += b"\xff\xc4" + _struct.pack(">H", 2 + len(dht)) + dht
    sos = bytes([2, 1, 0x00, 2, 0x00, psv, 0, 0])
    out += b"\xff\xda" + _struct.pack(">H", 2 + len(sos)) + sos
    bw = _BitWriter()
    planes = (comp_a, comp_b)
    fresh = [True, True]
    for y in range(h):
        for x in range(w):
            for c in range(2):
                idx = y * w + x
                if fresh[c]:
                    pred = 128
                    fresh[c] = False
                elif y == 0:
                    pred = planes[c][idx - 1]
                elif x == 0:
                    pred = planes[c][idx - w]
                else:
                    pred = planes[c][idx - 1]  # psv 1
                diff = (planes[c][idx] - pred) & 0xFFFF
                if diff > 32768:
                    diff -= 65536
                t = 16 if diff == 32768 else abs(diff).bit_length()
                bw.put(t, 5)
                if 0 < t < 16:
                    v = diff if diff > 0 else diff + (1 << t) - 1
                    bw.put(v, t)
    out += bw.flush() + b"\xff\xd9"
    return bytes(out)


def test_lossless_two_component_interleave_roundtrip():
    from edgy_spark.functions.jpeg import decode_jpeg_lossless

    a = [10, 20, 30, 40, 50, 60]
    b = [200, 190, 180, 170, 160, 150]
    data = _two_component_sof3(3, 2, a, b)
    w, h, nc, prec, samples = decode_jpeg_lossless(data)
    assert (w, h, nc, prec) == (3, 2, 2, 8)
    assert samples[0::2] == a and samples[1::2] == b


def test_multi_component_lossless_guarded_out_of_luma_lane(spark):
    """Review r14: an 8-bit MULTI-component SOF3 must not silently sum
    unrelated planes into a 'luma' — decode_features_jpeg routes it to a
    visible decode_error pointing at the lossless lane."""
    from edgy_spark.operators.multimodal import decode_features_jpeg

    data = _two_component_sof3(3, 2, [10] * 6, [80] * 6)
    df = spark.createDataFrame(
        [(1, bytearray(data))], "doc_id long, media binary"
    )
    rows = decode_features_jpeg(df, on_error="null").collect()
    assert rows[0]["mean_luma"] is None
    assert "decode_features_jpeg_lossless" in rows[0]["decode_error"]


def test_lossless_api_rejects_dct_frames_cheaply():
    import pytest as _pytest

    from edgy_spark.functions.jpeg import (
        decode_jpeg_lossless,
        encode_jpeg_flat,
    )

    with _pytest.raises(ValueError, match="not a lossless"):
        decode_jpeg_lossless(encode_jpeg_flat(8, 8, [50]))


def test_webp_planes_alph_is_honest():
    import struct as _struct

    import pytest as _pytest

    from edgy_spark.functions.webp import decode_webp_planes

    data = (
        b"RIFF" + _struct.pack("<I", 4 + 8 + 2) + b"WEBP"
        + b"ALPH" + _struct.pack("<I", 2) + b"\x00\x00"
    )
    with _pytest.raises(NotImplementedError, match="ALPH"):
        decode_webp_planes(data)


def test_anim_canvas_24bit_field_guard():
    import pytest as _pytest

    from edgy_spark.functions.webp import encode_webp_anim

    with _pytest.raises(ValueError, match="24-bit"):
        encode_webp_anim(
            1 << 25, 1,
            [{"x": 0, "y": 0, "w": 2, "h": 1, "rgba": bytes(8)}],
        )


def test_lossless_marker_in_magnitude_bits_is_value_error():
    """Review r14 pass 2: a restart marker landing inside a sample's
    magnitude bits must surface as ValueError (the crawl contract), not
    a raw _RestartMarker escaping the per-row catch."""
    import struct as _struct

    import pytest as _pytest

    from edgy_spark.functions.jpeg import (
        _LOSSLESS_BITS,
        _LOSSLESS_VALS,
        decode_jpeg_lossless,
    )

    out = bytearray(b"\xff\xd8")
    sof = _struct.pack(">BHHB", 8, 1, 4, 1) + bytes((1, 0x11, 0))
    out += b"\xff\xc3" + _struct.pack(">H", 2 + len(sof)) + sof
    dht = bytes([0x00]) + bytes(_LOSSLESS_BITS) + _LOSSLESS_VALS
    out += b"\xff\xc4" + _struct.pack(">H", 2 + len(dht)) + dht
    out += b"\xff\xda" + _struct.pack(">H", 8) + bytes([1, 1, 0, 1, 0, 0])
    out += bytes([0b01000000]) + b"\xff\xd0"  # SSSS=8 then a marker
    with _pytest.raises(ValueError):
        decode_jpeg_lossless(bytes(out))


def test_lossless_zero_dimension_rejected():
    import struct as _struct

    import pytest as _pytest

    from edgy_spark.functions.jpeg import decode_jpeg_lossless

    out = bytearray(b"\xff\xd8")
    sof = _struct.pack(">BHHB", 8, 0, 0, 1) + bytes((1, 0x11, 0))
    out += b"\xff\xc3" + _struct.pack(">H", 2 + len(sof)) + sof
    with _pytest.raises(ValueError, match="zero-dimension"):
        decode_jpeg_lossless(bytes(out))
