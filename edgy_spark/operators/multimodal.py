"""Multimodal (image/audio/video) column plumbing (north-star scope).

Opaque media live in ``binary`` columns beside a typed metadata struct;
decode / feature-extract / frame-sample run as Arrow-batched pandas
functions over ``mapInPandas`` — the only layer of this engine allowed to
leave the JVM, because media decoding genuinely needs Python libraries.

The image/audio libraries are NOT in this container, so the real decoders
are STUBBED behind an import-try (``_real_image_decode`` raises
NotImplementedError when PIL is absent) and a deterministic fake decode
stands in: every Spark-side piece — schema, binary handling, Arrow batch
shape, partitioning — is real and oracle-checked, only the pixel math is
fake (md5-derived, hence reproducible in SQL).

There is no media fixture in the driver's testdata, so binary payloads are
synthesized from ``documents.text`` (utf-8 bytes) — stable and realistic
enough to exercise the byte path end to end.

Scale: mapInPandas streams Arrow batches; media bytes never pass through
the driver, and a 100 TB corpus decodes at executor parallelism.  Partition
sizing is byte-based (maxPartitionBytes), not row-based, which is what you
want when rows are megabytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from edgy_spark.catalog import register
from edgy_spark.sources import load

FRAME_BYTES = 256  # fake "frame" size for the video-sampling path


def _real_image_decode(payload: bytes):  # pragma: no cover - lib not in container
    """Real decoder — requires PIL, which this container does not ship."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires PIL; container ships without it — "
            "the deterministic fake decode below exercises the same plumbing"
        ) from e


def _fake_dims(md5_hex: str) -> tuple[int, int]:
    """Deterministic fake width/height from the payload digest."""
    h = int(md5_hex[:15], 16)
    return (h % 640 + 1, (h // 640) % 480 + 1)


def with_media_column(docs: DataFrame) -> DataFrame:
    """Attach a binary payload + typed metadata struct to each document."""
    payload = F.col("text").cast("binary")
    meta = F.struct(
        F.lit("image/fake").alias("mime"),
        F.length(payload).alias("n_bytes"),
        F.col("source").alias("origin"),
    )
    return docs.select("doc_id", payload.alias("media"), meta.alias("media_meta"))


def decode_features(media_df: DataFrame) -> DataFrame:
    """mapInPandas decode: binary → (doc_id, n_bytes, content_md5, width,
    height).  Arrow-batched; one Python roundtrip for the whole pipeline."""

    # NOTE: the closure must be self-contained (no references to module-level
    # edgy_spark functions): cloudpickle serializes those by reference, and
    # Spark's Python workers don't have edgy_spark on sys.path when the
    # driver runs from outside the repo.
    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def fake_dims(md5_hex: str) -> tuple[int, int]:
            h = int(md5_hex[:15], 16)
            return (h % 640 + 1, (h // 640) % 480 + 1)

        for pdf in batches:
            digests = [
                hashlib.md5(bytes(p)).hexdigest() for p in pdf["media"]
            ]
            dims = [fake_dims(d) for d in digests]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(bytes(p)) for p in pdf["media"]],
                    "content_md5": digests,
                    "width": [w for w, _ in dims],
                    "height": [h for _, h in dims],
                }
            )

    return media_df.mapInPandas(
        decode,
        "doc_id long, n_bytes long, content_md5 string, width long, height long",
    )


@register(
    "multimodal_image_features",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_md5,
           (('0x' || substr(md5(text), 1, 15))::BIGINT % 640) + 1 AS width,
           ((('0x' || substr(md5(text), 1, 15))::BIGINT // 640) % 480) + 1 AS height
    FROM documents
    ORDER BY doc_id
    """,
    tags=("multimodal", "pandas-udf"),
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode + feature extraction through the full mapInPandas path;
    the fake decode's outputs are md5-derived so the oracle replays them."""
    docs = load(spark, sf_dir, "documents")
    return decode_features(with_media_column(docs)).orderBy("doc_id")


@register(
    "multimodal_frame_sample",
    oracle=f"""
    WITH frames AS (
      SELECT doc_id, unnest(range(0,
               CAST(ceil(length(text)::DOUBLE / {FRAME_BYTES}) AS BIGINT),
               2)) AS frame_idx, text
      FROM documents)
    SELECT doc_id, frame_idx,
           md5(substring(text, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES}))
             AS frame_md5
    FROM frames
    ORDER BY doc_id, frame_idx
    """,
    tags=("multimodal", "video", "pandas-udf"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for 'video' payloads: every 2nd {FRAME_BYTES}-byte
    frame, one output row per sampled frame (mapInPandas, 1→N rows)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import math

        for pdf in batches:
            ids, idxs, digests = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                # frames are 256-CHAR chunks (md5 of their utf-8 bytes) so the
                # oracle's char-based substring reproduces them exactly
                n_frames = math.ceil(len(text) / FRAME_BYTES)
                for i in range(0, n_frames, 2):
                    ids.append(doc_id)
                    idxs.append(i)
                    digests.append(
                        hashlib.md5(
                            text[i * FRAME_BYTES:(i + 1) * FRAME_BYTES].encode()
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_md5": digests}
            )

    return docs.mapInPandas(
        sample, "doc_id long, frame_idx long, frame_md5 string"
    ).orderBy("doc_id", "frame_idx")
