"""Compressed JSONL corpus shards (sources/compressed.py): native
zstd/brotli codecs via ctypes, shard IO, and the quarantine contract."""

from __future__ import annotations

import pytest

from etl_loading_scripts_spark.sources.compressed import (
    brotli_compress,
    brotli_decompress,
    compressed_libs_available,
    read_text_shard,
    scan_jsonl_shards,
    write_text_shard,
    zstd_compress,
    zstd_decompress,
)

needs_libs = pytest.mark.skipif(
    not compressed_libs_available(), reason="libzstd/libbrotli not present"
)


@needs_libs
def test_codec_roundtrips_and_multiframe():
    data = b'{"doc": 1, "text": "abc"}\n' * 4000
    assert zstd_decompress(zstd_compress(data)) == data
    assert brotli_decompress(brotli_compress(data)) == data
    # multi-frame concatenation (the zstd CLI's append behavior)
    two = zstd_compress(b"hello ") + zstd_compress(b"world")
    assert zstd_decompress(two) == b"hello world"


@needs_libs
def test_corrupt_and_truncated_quarantine():
    data = b"x" * 10_000
    with pytest.raises(ValueError, match="truncated"):
        zstd_decompress(zstd_compress(data)[:-4])
    with pytest.raises(ValueError, match="not a zstd frame"):
        zstd_decompress(b"definitely not zstd")
    with pytest.raises(ValueError, match="corrupt|truncated"):
        brotli_decompress(b"\x00\x01\x02garbage")


@needs_libs
def test_shard_io_and_jvm_side_parsing(spark, tmp_path):
    """Shards round-trip through every extension; the scan stops at the
    codec boundary and from_json parses JVM-side."""
    from pyspark.sql import functions as F

    d = tmp_path / "shards"
    d.mkdir()
    text = b'{"doc_id": 1, "n": 10}\n{"doc_id": 2, "n": 20}\n'
    for ext in (".jsonl.zst", ".jsonl.br", ".jsonl.gz", ".jsonl"):
        write_text_shard(str(d / f"s{ext}"), text)
        assert read_text_shard(str(d / f"s{ext}")) == text
    rows = scan_jsonl_shards(spark, str(d))
    parsed = rows.select(
        "source_file",
        F.from_json("json", "doc_id long, n int").alias("r"),
    )
    agg = parsed.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("r.n").alias("n_sum"),
    ).first()
    assert (agg.n_rows, agg.n_sum) == (8, 120)
    # the plan carries NO Python JSON parsing — from_json is JVM-side
    assert "from_json" in parsed._jdf.queryExecution().optimizedPlan().toString()


def test_no_library_gate(monkeypatch):
    from etl_loading_scripts_spark.sources import compressed as c

    monkeypatch.setattr(c, "_ZSTD", None)
    monkeypatch.setattr(c, "_ZSTD_TRIED", True)
    with pytest.raises(NotImplementedError, match="libzstd"):
        c.zstd_decompress(b"x")
