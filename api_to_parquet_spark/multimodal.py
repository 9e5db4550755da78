"""Multimodal columns: image/audio/video as opaque binary payloads with
typed metadata, processed with Arrow-batched mapInPandas.

The Spark-side plumbing is real — BinaryType payloads, a typed metadata
struct, partition-preserving mapInPandas with explicit output schema, and
batch-at-a-time pandas processing. The actual media decode is STUBBED
(`decode_image` raises NotImplementedError unless PIL is importable, which
it is not in this container); `extract_features` instead derives
deterministic features from the raw bytes so the full pipeline is testable
and oracle-checkable end to end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from api_to_parquet_spark.lake import load

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("head_byte", T.LongType()),
        T.StructField("fake_width", T.LongType()),
        T.StructField("fake_height", T.LongType()),
    ]
)


def decode_image(payload: bytes):
    """Real image decode — requires PIL, which this environment does not
    ship. The Spark plumbing around it (schema, batching, partitioning)
    is exercised via the deterministic fallback in extract_features."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env has no PIL
        raise NotImplementedError(
            "media decode requires an image library not present in this "
            "environment; plumbing is tested via deterministic features"
        ) from exc
    import io

    from PIL import Image

    return Image.open(io.BytesIO(payload))  # pragma: no cover


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a media table from documents: utf-8 payload bytes standing in
    for encoded media, plus a typed metadata struct."""
    d = load(spark, sf_dir, "documents")
    payload = F.encode("text", "utf-8")
    return d.select(
        "doc_id",
        F.lit("image/fake").alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.col("source").alias("source"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas over the media table: per-partition Arrow batches in,
    typed feature rows out — narrow (no shuffle), scales linearly.

    The batch function is a closure (not a module-level function) so
    cloudpickle ships it by value — workers need no importable copy of
    this package, which matters when the session is created by an
    external driver with a different working directory."""

    def extract_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Replace this body with a real decode (decode_image +
        # resize/frame-sample) when media libs exist — the batch shape,
        # schema, and partitioning stay identical.
        import pandas as _pd

        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            head = payloads.map(lambda b: b[0] if len(b) else -1)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n_bytes,
                    "head_byte": head,
                    "fake_width": n_bytes % 640,
                    "fake_height": (n_bytes * 7) % 480,
                }
            )

    return media.mapInPandas(extract_batch, FEATURE_SCHEMA)


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_features(media_table(spark, sf_dir))


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("fake_width", T.LongType()),
        T.StructField("fake_height", T.LongType()),
        T.StructField("out_width", T.LongType()),
        T.StructField("out_height", T.LongType()),
    ]
)

MAX_EDGE = 224  # standard vision-model input edge


def resize_media(media: DataFrame) -> DataFrame:
    """Resize stage: mapInPandas computing aspect-preserving target
    dimensions (fit longest edge to MAX_EDGE, never upscale). A real
    implementation calls PIL's resize on the decoded image here — the
    dimension arithmetic, batch shape, and schema are exactly what that
    version uses, so only the pixel work is faked."""

    def resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            n_bytes = pdf["payload"].map(len)
            w = (n_bytes % 640) + 1  # deterministic fake decode dims
            h = ((n_bytes * 7) % 480) + 1
            scale = (MAX_EDGE / w.combine(h, max)).clip(upper=1.0)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "fake_width": w,
                    "fake_height": h,
                    "out_width": (w * scale).astype("int64"),
                    "out_height": (h * scale).astype("int64"),
                }
            )

    return media.mapInPandas(resize_batch, RESIZE_SCHEMA)


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return resize_media(media_table(spark, sf_dir))


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
    ]
)

FRAME_STRIDE = 10  # keep every 10th frame


def sample_frames(media: DataFrame) -> DataFrame:
    """Frame-sampling stage for video payloads: mapInPandas expanding
    each payload into every FRAME_STRIDE-th frame index (a real version
    decodes the container and yields the sampled frames as binary
    columns; the expansion shape — one input row to many output rows,
    batch-at-a-time — is the part that matters for Spark)."""

    def frame_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            n_frames = (pdf["payload"].map(len) % 300) + 1  # fake decode
            out_doc, out_n, out_idx = [], [], []
            for doc_id, nf in zip(pdf["doc_id"], n_frames):
                idxs = range(0, int(nf), FRAME_STRIDE)
                out_doc.extend([doc_id] * len(idxs))
                out_n.extend([int(nf)] * len(idxs))
                out_idx.extend(idxs)
            yield _pd.DataFrame(
                {"doc_id": out_doc, "n_frames": out_n, "frame_idx": out_idx}
            )

    return media.mapInPandas(frame_batch, FRAME_SCHEMA)


def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames(media_table(spark, sf_dir))


def extract_features_arrow(media: DataFrame) -> DataFrame:
    """mapInArrow twin of extract_features: the same per-batch feature
    extraction operating directly on pyarrow RecordBatches — no
    Arrow→pandas conversion at all, the zero-copy path for decoders
    that consume raw buffers (image/audio codecs want bytes, not
    Series). Same schema, same narrow no-shuffle shape; the equality
    with the pandas path is asserted in tests and by sharing the
    multimodal_features oracle."""

    def extract_batch(batches):
        import pyarrow as pa

        for b in batches:
            payloads = b.column("payload").to_pylist()
            n_bytes = [len(p) for p in payloads]
            yield pa.RecordBatch.from_pydict(
                {
                    "doc_id": b.column("doc_id"),
                    "media_type": b.column("media_type"),
                    "n_bytes": pa.array(n_bytes, pa.int64()),
                    "head_byte": pa.array(
                        [p[0] if len(p) else -1 for p in payloads], pa.int64()
                    ),
                    "fake_width": pa.array(
                        [n % 640 for n in n_bytes], pa.int64()
                    ),
                    "fake_height": pa.array(
                        [n * 7 % 480 for n in n_bytes], pa.int64()
                    ),
                }
            )

    return media.mapInArrow(extract_batch, FEATURE_SCHEMA)


def q_multimodal_features_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_features_arrow(media_table(spark, sf_dir))


QUERIES = {
    "multimodal_features": q_multimodal_features,
    "multimodal_features_arrow": q_multimodal_features_arrow,
    "multimodal_resize": q_multimodal_resize,
    "multimodal_frame_sample": q_multimodal_frame_sample,
}

# The deterministic byte-level features are SQL-expressible, so even the
# pandas-UDF path gets a value-level oracle.
_FEATURES_ORACLE = """
        SELECT doc_id, 'image/fake' AS media_type,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS head_byte,
               CAST(octet_length(encode(text)) % 640 AS BIGINT) AS fake_width,
               CAST(octet_length(encode(text)) * 7 % 480 AS BIGINT) AS fake_height
        FROM documents
    """

ORACLE = {
    "multimodal_features_arrow": _FEATURES_ORACLE,
    "multimodal_features": """
        SELECT doc_id, 'image/fake' AS media_type,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS head_byte,
               CAST(octet_length(encode(text)) % 640 AS BIGINT) AS fake_width,
               CAST(octet_length(encode(text)) * 7 % 480 AS BIGINT) AS fake_height
        FROM documents
    """,
    "multimodal_resize": f"""
        SELECT doc_id, fake_width, fake_height,
               CAST(floor(fake_width * scale) AS BIGINT) AS out_width,
               CAST(floor(fake_height * scale) AS BIGINT) AS out_height
        FROM (
            SELECT doc_id, fake_width, fake_height,
                   least({MAX_EDGE}.0 / greatest(fake_width, fake_height),
                         1.0) AS scale
            FROM (
                SELECT doc_id,
                       octet_length(encode(text)) % 640 + 1 AS fake_width,
                       octet_length(encode(text)) * 7 % 480 + 1 AS fake_height
                FROM documents))
    """,
    "multimodal_frame_sample": f"""
        SELECT doc_id, n_frames,
               unnest(range(0, n_frames, {FRAME_STRIDE})) AS frame_idx
        FROM (SELECT doc_id,
                     octet_length(encode(text)) % 300 + 1 AS n_frames
              FROM documents)
    """,
}
