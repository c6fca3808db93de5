"""Multimodal-column plumbing: opaque ``binary`` payloads + typed metadata.

The test corpus has no real image/audio bytes, so the payload is a
deterministic byte column derived from ``documents.text`` (ASCII → the
byte/char duality keeps the DuckDB oracle expressible). What IS real and
tested here is everything Spark-side a 100 TB multimodal pipeline needs:

- binary column schema + byte-level expressions (length, slicing, hashing);
- Arrow-batched ``mapInPandas`` decode plumbing with a stable output schema
  (the decode kernel itself is a deterministic fake — real codecs are
  import-gated, see ``decode_image_stub``);
- frame/chunk sampling via generate+explode (video frame-sample shape).

Real decoders (PIL / torchaudio / ffmpeg) are not in this image; the
import-try pattern below is the integration point.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_loading_scripts_spark.catalog import load_table
from etl_loading_scripts_spark.registry import register

FRAME_BYTES = 64  # "frame" size for the chunk-sampling operator
FRAME_STRIDE = 2  # keep every 2nd frame


def decode_image_stub(payload: bytes) -> dict:
    """The real-decoder integration point, clearly stubbed.

    A production build replaces this with PIL/libvips decode → (width,
    height, channels, features). The container has no imaging libs, so this
    raises unless the deterministic fake is requested via the pipeline
    (``mm_decode_features`` uses the fake directly).
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - image libs absent by design
        raise NotImplementedError(
            "image decode requires an imaging library not present in this "
            "environment; wire PIL/libvips here"
        ) from e
    raise NotImplementedError("real decode path not implemented in v1")


@register(
    "mm_binary_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           lower(hex(encode(left(text, 4)))) AS header_hex,
           md5(text) AS payload_md5
    FROM documents
    """,
    doc="Binary-column metadata: payload byte length, 4-byte header hex "
    "(magic-number sniffing shape), content hash — pure byte expressions.",
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark side genuinely operates on a BinaryType column; the oracle
    computes the same bytes from the ASCII source text. Scale: map-only."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.col("text").cast("binary")
    return docs.select(
        "doc_id",
        F.length(payload).cast("long").alias("n_bytes"),
        F.lower(F.hex(F.expr("substring(cast(text as binary), 1, 4)"))).alias("header_hex"),
        F.md5(payload).alias("payload_md5"),
    )


_DECODE_SCHEMA = (
    "doc_id long, n_bytes long, first_byte int, byte_checksum long, fake_width int, fake_height int"
)


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched fake decode: deterministic features from raw bytes.

    This is the exact plumbing a real decoder drops into — per-batch
    pandas in/out, binary column as Python bytes — with the codec swapped
    for arithmetic the oracle can replicate.
    """
    for pdf in batches:
        payloads = pdf["payload"]
        n_bytes = payloads.map(len)
        first = payloads.map(lambda b: b[0] if len(b) else 0)
        checksum = payloads.map(lambda b: sum(b) % 997)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes.astype("int64"),
                "first_byte": first.astype("int32"),
                "byte_checksum": checksum.astype("int64"),
                # fake decode: pretend bytes are a square-ish image
                "fake_width": (n_bytes % 256).astype("int32"),
                "fake_height": (n_bytes // 256 + 1).astype("int32"),
            }
        )


@register(
    "mm_decode_features",
    oracle="""
    WITH bytes AS (
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CAST(ascii(left(text, 1)) AS INT) AS first_byte,
               CAST(list_sum(list_transform(range(1, length(text) + 1),
                    i -> ascii(substr(text, i, 1)))) % 997 AS BIGINT) AS byte_checksum
        FROM documents
    )
    SELECT doc_id, n_bytes, first_byte, byte_checksum,
           CAST(n_bytes % 256 AS INT) AS fake_width,
           CAST(n_bytes // 256 + 1 AS INT) AS fake_height
    FROM bytes
    """,
    doc="mapInPandas decode plumbing: binary payload → Arrow batch → pandas "
    "kernel → typed feature schema. Kernel is a deterministic fake "
    "(real codecs import-gated in decode_image_stub).",
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: mapInPandas streams Arrow batches partition-local — no
    shuffle; batch size bounds peak memory (spark.sql.execution.arrow.
    maxRecordsPerBatch). This is the only Python-touching operator family
    in the engine, and it is batch-vectorized by construction."""
    docs = load_table(spark, sf_dir, "documents")
    payload_df = docs.select("doc_id", F.col("text").cast("binary").alias("payload"))
    return payload_df.mapInPandas(_decode_batches, schema=_DECODE_SCHEMA)


@register(
    "mm_frame_sample",
    oracle=f"""
    WITH frames AS (
        SELECT doc_id, unnest(range(0, CAST(ceil(length(text) / {FRAME_BYTES}.0) AS INT))) AS frame_idx,
               text
        FROM documents
    )
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(octet_length(encode(substr(text, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES}))) AS BIGINT) AS frame_bytes,
           md5(substr(text, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES})) AS frame_md5
    FROM frames
    WHERE frame_idx % {FRAME_STRIDE} = 0
    """,
    doc=f"Frame sampling: payload split into {FRAME_BYTES}-byte frames, "
    f"every {FRAME_STRIDE}nd kept — the video frame-sample plan shape "
    "(generate+explode, map-only, no shuffle).",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_frames = F.ceil(F.length("text") / float(FRAME_BYTES)).cast("int")
    frames = docs.select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).filter(F.col("frame_idx") % FRAME_STRIDE == 0)
    chunk = F.expr(f"substring(text, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES})")
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.length(chunk.cast("binary")).cast("long").alias("frame_bytes"),
        F.md5(chunk).alias("frame_md5"),
    )


RESIZE_STRIDE = 4  # keep every 4th byte ≙ nearest-neighbor downsample


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched 'resize': stride-sample the payload bytes (the 1-D
    stand-in for nearest-neighbor image downsampling — a real build swaps
    in PIL.Image.resize here, same batch shape, same output schema)."""
    for pdf in batches:
        resized = pdf["payload"].map(lambda b: bytes(b[::RESIZE_STRIDE]))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "orig_bytes": pdf["payload"].map(len).astype("int64"),
                "resized_bytes": resized.map(len).astype("int64"),
                "resized_md5": resized.map(
                    lambda b: __import__("hashlib").md5(b).hexdigest()
                ),
            }
        )


@register(
    "mm_resize",
    oracle=f"""
    WITH sampled AS (
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS orig_bytes,
               list_aggregate(list_transform(
                   range(1, length(text) + 1, {RESIZE_STRIDE}),
                   i -> substr(text, i, 1)), 'string_agg', '') AS resized
        FROM documents
    )
    SELECT doc_id, orig_bytes,
           CAST(octet_length(encode(resized)) AS BIGINT) AS resized_bytes,
           md5(resized) AS resized_md5
    FROM sampled
    """,
    doc=f"Multimodal resize: stride-{RESIZE_STRIDE} byte downsample through "
    "the mapInPandas kernel (nearest-neighbor shape; real codec slots into "
    "the same batch plumbing) — output verified by content hash.",
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same Arrow-batch contract as mm_decode_features: binary in, typed
    features out, partition-local, no shuffle. Peak memory = one Arrow
    batch of payloads per core — the knob is
    spark.sql.execution.arrow.maxRecordsPerBatch, which matters once
    payloads are megabyte-scale images rather than test strings."""
    docs = load_table(spark, sf_dir, "documents")
    payload_df = docs.select("doc_id", F.col("text").cast("binary").alias("payload"))
    return payload_df.mapInPandas(
        _resize_batches,
        schema="doc_id long, orig_bytes long, resized_bytes long, resized_md5 string",
    )
