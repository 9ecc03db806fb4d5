"""Real-decoder path for the multimodal plumbing: runs only where PIL is
installed (the CI container ships without it — the test skips there, which
is itself asserted by the fake-path oracle coverage staying green)."""

from __future__ import annotations

import pytest


def test_real_pil_decode_reports_true_dimensions(spark):
    """decode_features_real must report each image's actual pixel size —
    proving the Spark-side plumbing (binary column, Arrow batches, schema)
    carries real image bytes end to end, not just the deterministic fake."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from edgy_spark.operators.multimodal import decode_features_real

    rows = []
    want = {0: (3, 2), 1: (5, 7), 2: (1, 1)}
    for doc_id, (w, h) in want.items():
        buf = io.BytesIO()
        Image.new("RGB", (w, h), (doc_id * 40, 0, 0)).save(buf, format="PNG")
        payload = buf.getvalue()
        rows.append((doc_id, bytearray(payload), ("image/png", len(payload), "test")))
    df = spark.createDataFrame(
        rows,
        "doc_id long, media binary, "
        "media_meta struct<mime:string, n_bytes:long, origin:string>",
    )
    got = {
        r["doc_id"]: (r["width"], r["height"])
        for r in decode_features_real(df).collect()
    }
    assert got == want


def test_real_decode_content_hash_matches_payload(spark):
    """content_md5/n_bytes come from the raw payload bytes, identical to the
    fake path's contract — so downstream dedup joins work unchanged
    whichever decoder produced the features."""
    pytest.importorskip("PIL")
    import hashlib
    import io

    from PIL import Image

    from edgy_spark.operators.multimodal import decode_features_real

    buf = io.BytesIO()
    Image.new("L", (4, 4), 128).save(buf, format="PNG")
    payload = buf.getvalue()
    df = spark.createDataFrame(
        [(7, bytearray(payload), ("image/png", len(payload), "t"))],
        "doc_id long, media binary, "
        "media_meta struct<mime:string, n_bytes:long, origin:string>",
    )
    row = decode_features_real(df).collect()[0]
    assert row["content_md5"] == hashlib.md5(payload).hexdigest()
    assert row["n_bytes"] == len(payload)
