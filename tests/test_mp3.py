"""From-spec MP3 frame-stream parser tests (functions/mp3.py).

No MP3 decoder ships in this container; the frame/header layer is
anchored on (1) the published table values (ISO 11172-3 table B.2 and
the 13818-3 lower-rate extension, transcribed independently here),
(2) hand-computed spec-formula frame sizes, (3) encoder round-trips
across every table row, and (4) the crawl-robustness contract
(truncation/corruption -> ValueError, never a crash).
"""

from __future__ import annotations

import random

import pytest

from edgy_spark.functions import mp3


def test_bitrate_and_samplerate_tables_pinned():
    # independent transcription of the published tables
    assert mp3.BITRATES_V1_L3 == [
        0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320
    ]
    assert mp3.BITRATES_V2_L3 == [
        0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160
    ]
    assert mp3.SAMPLE_RATES[mp3.MPEG1] == (44100, 48000, 32000)
    assert mp3.SAMPLE_RATES[mp3.MPEG2] == (22050, 24000, 16000)
    assert mp3.SAMPLE_RATES[mp3.MPEG25] == (11025, 12000, 8000)


def test_frame_size_spec_formula():
    # 128 kbps @ 44100, no padding: floor(144*128000/44100) = 417
    data = mp3.encode_mp3_frames([{"bitrate_idx": 9, "sr_idx": 0}])
    frames = mp3.parse_mp3_frames(data)
    assert frames[0].frame_bytes == 417 == len(data)
    assert frames[0].bitrate_kbps == 128
    assert frames[0].sample_rate == 44100
    assert frames[0].samples == 1152
    # padding adds exactly one byte
    padded = mp3.encode_mp3_frames([{"bitrate_idx": 9, "sr_idx": 0, "padding": 1}])
    assert mp3.parse_mp3_frames(padded)[0].frame_bytes == 418
    # MPEG-2: 576 samples, coefficient 72: floor(72*64000/22050) = 208
    v2 = mp3.encode_mp3_frames(
        [{"version": mp3.MPEG2, "bitrate_idx": 8, "sr_idx": 0}]
    )
    f2 = mp3.parse_mp3_frames(v2)[0]
    assert (f2.samples, f2.bitrate_kbps, f2.frame_bytes) == (576, 64, 208)


def test_roundtrip_every_table_row_and_mode():
    for version in (mp3.MPEG1, mp3.MPEG2, mp3.MPEG25):
        table = (
            mp3.BITRATES_V1_L3 if version == mp3.MPEG1 else mp3.BITRATES_V2_L3
        )
        specs = [
            {
                "version": version,
                "bitrate_idx": bi,
                "sr_idx": bi % 3,
                "padding": bi % 2,
                "channel_mode": bi % 4,
            }
            for bi in range(1, 15)
        ]
        frames = mp3.parse_mp3_frames(mp3.encode_mp3_frames(specs))
        assert [f.bitrate_kbps for f in frames] == [
            table[bi] for bi in range(1, 15)
        ]
        assert [f.channel_mode for f in frames] == [
            mp3.CHANNEL_MODES[bi % 4] for bi in range(1, 15)
        ]


def test_id3v2_and_id3v1_are_skipped():
    specs = [{"bitrate_idx": 9}] * 3
    bare = mp3.encode_mp3_frames(specs)
    tagged = mp3.encode_mp3_frames(specs, id3v2_size=99, id3v1=True)
    assert len(tagged) == len(bare) + 10 + 99 + 128
    assert mp3.mp3_stream_stats(tagged) == mp3.mp3_stream_stats(bare)


def test_stream_stats_closed_form():
    specs = [
        {"bitrate_idx": (3 + f) % 14 + 1, "padding": (3 + f) % 2,
         "sr_idx": 0, "channel_mode": 3}
        for f in range(4)
    ]
    n, sr, cm, samples, kbps, nbytes = mp3.mp3_stream_stats(
        mp3.encode_mp3_frames(specs)
    )
    assert (n, sr, cm, samples) == (4, 44100, "mono", 4 * 1152)
    expect_kbps = sum(mp3.BITRATES_V1_L3[(3 + f) % 14 + 1] for f in range(4))
    assert kbps == expect_kbps
    assert nbytes == sum(
        144 * mp3.BITRATES_V1_L3[(3 + f) % 14 + 1] * 1000 // 44100
        + (3 + f) % 2
        for f in range(4)
    )


def test_truncation_and_corruption_never_crash():
    data = bytearray(
        mp3.encode_mp3_frames(
            [{"bitrate_idx": 5}, {"bitrate_idx": 11, "padding": 1}],
            id3v2_size=20, id3v1=True,
        )
    )
    for k in range(len(data)):
        try:
            mp3.parse_mp3_frames(bytes(data[:k]))
        except ValueError:
            pass
    rng = random.Random(5)
    for _ in range(150):
        i = rng.randrange(len(data))
        orig = data[i]
        data[i] = rng.randrange(256)
        try:
            mp3.parse_mp3_frames(bytes(data))
        except ValueError:
            pass
        data[i] = orig


def test_rejects_garbage_and_reserved_fields():
    with pytest.raises(ValueError):
        mp3.parse_mp3_frames(b"not audio at all")
    with pytest.raises(ValueError):
        mp3.parse_mp3_frames(b"")
    # free-format bitrate (index 0) is a loud refusal, not a guess
    hdr = bytes((0xFF, 0xFB, 0x00, 0x00)) + bytes(100)
    with pytest.raises(ValueError, match="free-format"):
        mp3.parse_mp3_frames(hdr)
    # Layer I (bits 11) is not Layer III
    hdr = bytes((0xFF, 0xFF, 0x90, 0x00)) + bytes(100)
    with pytest.raises(ValueError, match="Layer III"):
        mp3.parse_mp3_frames(hdr)


def test_sample_decode_is_honest():
    data = mp3.encode_mp3_frames([{"bitrate_idx": 9}])
    with pytest.raises(NotImplementedError, match="WAV/FLAC"):
        mp3.decode_mp3_samples(data)


def test_decode_features_mp3_on_error_null(spark):
    from edgy_spark.operators.multimodal import decode_features_mp3

    good = mp3.encode_mp3_frames(
        [{"bitrate_idx": 9}, {"bitrate_idx": 14}], id3v2_size=12
    )
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(good[:30])), (3, None),
         (4, bytearray(b"RIFFnotmp3xx"))],
        "doc_id long, media binary",
    )
    with pytest.raises(Exception):
        decode_features_mp3(df).collect()
    rows = {
        r["doc_id"]: r
        for r in decode_features_mp3(df, on_error="null").collect()
    }
    assert rows[1]["n_frames"] == 2 and rows[1]["decode_error"] is None
    assert rows[1]["sum_bitrate_kbps"] == 128 + 320
    assert rows[2]["n_frames"] is None and rows[2]["decode_error"]
    assert rows[3]["decode_error"] == "NULL media payload"
    assert rows[4]["n_frames"] is None and rows[4]["decode_error"]
