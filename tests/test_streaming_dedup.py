"""Streaming Bloom dedup: no duplicate ever emitted, first occurrence
wins, bounded false-drop rate, state carries across micro-batches."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sketchlib.spark.streaming import streaming_dedup


@pytest.fixture(scope="module")
def dup_stream_dir(tmp_path_factory):
    """3 micro-batches with heavy cross-batch and in-batch duplication:
    batch i carries keys [0, 400*(i+1)) — every earlier key repeats —
    plus an in-batch dup of key 0. payload records the batch index."""
    out = tmp_path_factory.mktemp("dedup_src")
    for i in range(3):
        ks = list(range(400 * (i + 1))) + [0]
        tbl = pa.table({
            "url": [f"https://ex.com/{k}" for k in ks],
            "batch": [i] * len(ks),
        })
        pq.write_table(tbl, str(out / f"batch-{i:02d}.parquet"))
    return str(out)


def test_streaming_dedup_exact_on_dups_bounded_on_drops(
        spark, dup_stream_dir, tmp_path):
    batch_schema = spark.read.parquet(dup_stream_dir).schema
    stream = (spark.readStream.schema(batch_schema)
              .option("maxFilesPerTrigger", 1).parquet(dup_stream_dir))
    dedup = streaming_dedup(stream, "url", n_expected=2000, p=1e-4,
                            shards=8)
    q = (dedup.writeStream.format("memory").queryName("dedup_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM dedup_out").toPandas()

    # HARD guarantee: no key emitted twice (across AND within batches)
    assert not out["url"].duplicated().any()
    # first occurrence wins: each surviving key's payload is the
    # earliest batch that contained it (keys [0,400) -> batch 0, etc.)
    first_batch = out.set_index("url")["batch"]
    for k, b in first_batch.items():
        assert b == int(k.rsplit("/", 1)[1]) // 400
    # bounded false drops: >= 99.9% of the 1200 unique keys survive
    assert len(out) >= 0.999 * 1200
    assert len(out) <= 1200


def test_streaming_dedup_validates_shards(spark):
    with pytest.raises(ValueError):
        streaming_dedup(spark.readStream.format("rate").load(),
                        "value", 100, shards=0)
