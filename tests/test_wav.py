"""The from-spec WAV codec (functions/wav.py) and its Spark operator.

Same validation stance as the PNG codec: round-trip property, adversarial
chunk-stream cases from the RIFF spec, and cross-validation against TWO
independent implementations — the stdlib ``wave`` module and the JVM's
``javax.sound.sampled`` (ships with the JDK)."""

from __future__ import annotations

import io
import struct
import wave as stdlib_wave

import pytest

from edgy_spark.functions.wav import decode_wav, encode_wav


def _samples(n: int, seed: int) -> list[int]:
    out = []
    for k in range(n):
        v = (seed * 131 + k * 997) % 65536
        out.append(v - 65536 if v >= 32768 else v)
    return out


def test_wav_roundtrip():
    for rate, ch, n in ((8000, 1, 5), (44100, 2, 64), (16000, 1, 1)):
        s = _samples(n * ch, rate + ch)
        assert decode_wav(encode_wav(rate, ch, s)) == (rate, ch, s)


def test_wav_roundtrip_property():
    """Hypothesis: any PCM16 track (any rate/channels/sample values,
    including the int16 extremes) survives encode->decode bit-exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        rate=st.integers(1, 192000),
        ch=st.integers(1, 4),
        frames=st.integers(0, 30),
        data=st.data(),
    )
    def check(rate, ch, frames, data):
        s = data.draw(
            st.lists(
                st.integers(-32768, 32767),
                min_size=frames * ch,
                max_size=frames * ch,
            )
        )
        assert decode_wav(encode_wav(rate, ch, s)) == (rate, ch, s)

    check()


def test_wav_decoder_walks_foreign_chunks_and_pad_bytes():
    """Per the RIFF spec, readers skip unknown chunks and odd-sized chunks
    carry a pad byte: a LIST chunk before fmt and an odd-length junk chunk
    between fmt and data must not disturb the decode."""
    rate, ch = 22050, 2
    s = _samples(10, 3)
    canon = encode_wav(rate, ch, s)
    # dissect the canonical stream: RIFF(12) | fmt(8+16) | data(...)
    fmt_chunk = canon[12 : 12 + 8 + 16]
    data_chunk = canon[12 + 8 + 16 :]
    junk_odd = b"junk" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad byte
    lst = b"LIST" + struct.pack("<I", 4) + b"INFO"
    body = b"WAVE" + lst + fmt_chunk + junk_odd + data_chunk
    crafted = b"RIFF" + struct.pack("<I", len(body)) + body
    assert decode_wav(crafted) == (rate, ch, s)


def test_wav_decoder_rejects_malformed_streams():
    s = _samples(6, 1)
    good = encode_wav(8000, 1, s)
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"RIFX" + good[4:])
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(good[:-3])
    # non-PCM format code must refuse rather than misread samples
    bad_fmt = bytearray(good)
    bad_fmt[20:22] = struct.pack("<H", 3)  # IEEE float format code
    with pytest.raises(ValueError, match="unsupported"):
        decode_wav(bytes(bad_fmt))
    with pytest.raises(ValueError, match="interleave"):
        encode_wav(8000, 2, _samples(5, 1))


def test_wav_codec_matches_stdlib_wave_module():
    """Cross-implementation oracle #1: the stdlib ``wave`` module must read
    our encoder's output to the same format + frames, and our decoder must
    read ITS output back to the same samples."""
    rate, ch = 11025, 2
    s = _samples(24, 7)
    ours = encode_wav(rate, ch, s)
    with stdlib_wave.open(io.BytesIO(ours)) as r:
        assert (r.getframerate(), r.getnchannels(), r.getsampwidth()) == (
            rate, ch, 2,
        )
        frames = r.readframes(r.getnframes())
    assert frames == struct.pack(f"<{len(s)}h", *s)

    buf = io.BytesIO()
    with stdlib_wave.open(buf, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(s)}h", *s))
    assert decode_wav(buf.getvalue()) == (rate, ch, s)


def test_wav_codec_matches_jvm_javax_sound(spark):
    """Cross-implementation oracle #2: the JDK's javax.sound.sampled must
    parse our encoder's WAV to the same format fields AND the same PCM
    bytes — an independent non-Python implementation agreeing on every
    byte (the javax.imageio trick from the PNG codec, for audio)."""
    jvm = spark._sc._jvm
    rate, ch = 16000, 1
    s = _samples(32, 11)
    ours = encode_wav(rate, ch, s)
    bais = jvm.java.io.ByteArrayInputStream(ours)
    ais = jvm.javax.sound.sampled.AudioSystem.getAudioInputStream(bais)
    f = ais.getFormat()
    assert int(f.getSampleRate()) == rate
    assert f.getChannels() == ch
    assert f.getSampleSizeInBits() == 16
    assert not f.isBigEndian()
    raw = bytes(ais.readAllBytes())
    assert raw == struct.pack(f"<{len(s)}h", *s)


def test_decode_features_wav_runs_real_decode_in_spark(spark):
    """The mapInPandas operator decodes REAL WAV bytes inside Python
    workers: format fields come from the parsed fmt chunk and the loudness
    stats from the parsed samples (closed-form tracks, so header-only
    parsing cannot fake the energy)."""
    from edgy_spark.operators.multimodal import decode_features_wav

    quiet = encode_wav(8000, 1, [100, -100, 100, -100])      # ms = 10000
    loud = encode_wav(12000, 2, [30000, -30000] * 6)         # ms = 9e8
    df = spark.createDataFrame(
        [(1, bytearray(quiet)), (2, bytearray(loud))],
        "doc_id long, media binary",
    ).repartition(2)
    got = {r["doc_id"]: r for r in decode_features_wav(df).collect()}
    assert (
        got[1]["sample_rate"], got[1]["channels"], got[1]["n_frames"],
        got[1]["duration_us"], got[1]["peak_amplitude"], got[1]["mean_square"],
    ) == (8000, 1, 4, 500, 100, 10000)
    assert (
        got[2]["sample_rate"], got[2]["channels"], got[2]["n_frames"],
        got[2]["duration_us"], got[2]["peak_amplitude"], got[2]["mean_square"],
    ) == (12000, 2, 6, 500, 30000, 900000000)


def test_wav_zero_length_track_scores_silence(spark):
    """An empty data chunk is valid WAV (review r08): the operator must
    emit a zero row, not crash the job on one degenerate track."""
    from edgy_spark.operators.multimodal import decode_features_wav

    empty = encode_wav(8000, 1, [])
    df = spark.createDataFrame([(1, bytearray(empty))], "doc_id long, media binary")
    row = decode_features_wav(df).collect()[0]
    assert (
        row["n_frames"], row["duration_us"],
        row["peak_amplitude"], row["mean_square"],
    ) == (0, 0, 0, 0)
    assert (row["sample_rate"], row["channels"]) == (8000, 1)


def test_wav_decoder_rejects_zero_sample_rate():
    """A fmt chunk declaring rate=0 must fail in the decoder (review r08),
    not surface later as ZeroDivisionError in duration math."""
    good = bytearray(encode_wav(8000, 1, _samples(4, 2)))
    good[24:28] = struct.pack("<I", 0)  # fmt.sample_rate := 0
    with pytest.raises(ValueError, match="sample rate"):
        decode_wav(bytes(good))


def test_wav_fuzz_raises_only_valueerror():
    """Same crawl-robustness surface as the image codecs (r11): random
    truncations and byte flips must decode or raise ValueError."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from edgy_spark.functions.wav import decode_wav, encode_wav

    seed = encode_wav(8000, 2, [100, -100, 32000, -32000, 7, 8])

    @settings(max_examples=80, deadline=None)
    @given(
        mode=st.sampled_from(["truncate", "flip", "both"]),
        cut=st.floats(0.01, 0.99),
        pos=st.floats(0, 0.999),
        val=st.integers(0, 255),
    )
    def check(mode, cut, pos, val):
        data = bytearray(seed)
        if mode in ("truncate", "both"):
            data = data[: max(1, int(len(data) * cut))]
        if mode in ("flip", "both") and data:
            data[int(len(data) * pos) % len(data)] = val
        try:
            rate, ch, samples = decode_wav(bytes(data))
            assert rate >= 1 and ch >= 1
        except ValueError:
            pass

    check()


def test_decode_features_wav_on_error_null(spark):
    """Per-row capture for audio too: the malformed asset yields NULL
    stats + decode_error; valid rows unaffected; default raises."""
    import pytest as _pytest

    from edgy_spark.functions.wav import encode_wav
    from edgy_spark.operators.multimodal import decode_features_wav

    ok = encode_wav(8000, 1, [5, -5, 100])
    df = spark.createDataFrame(
        [(1, bytearray(ok)), (2, bytearray(b"RIFFxxxxNOPE"))],
        "doc_id long, media binary",
    )
    with _pytest.raises(Exception):
        decode_features_wav(df).collect()
    rows = {r["doc_id"]: r for r in decode_features_wav(df, on_error="null").collect()}
    assert rows[1]["peak_amplitude"] == 100 and rows[1]["decode_error"] is None
    assert rows[2]["sample_rate"] is None and rows[2]["decode_error"]
