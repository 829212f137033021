"""Watermarked windowed streaming: per-window sketches finalize on
watermark passage; late data beyond the watermark is dropped."""

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sketchlib.core.serde import sketch_from_bytes
from sketchlib.spark.specs import SketchSpec
from sketchlib.spark.streaming import streaming_windowed_build

SPECS = [SketchSpec("h", "hll", "key", {"b": 10})]
T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _write_batch(path, rows, order):
    tbl = pa.table({
        "ts": pa.array([r[0] for r in rows], type=pa.timestamp("us")),
        "lang": pa.array([r[1] for r in rows], type=pa.string()),
        "key": pa.array([r[2] for r in rows], type=pa.string()),
    })
    pq.write_table(tbl, path)
    # the file source processes by modification time; quick writes tie
    # on mtime and scramble micro-batch order — force distinct mtimes
    import os
    base = 1_700_000_000
    os.utime(path, (base + order, base + order))


@pytest.fixture(scope="module")
def stream_src(tmp_path_factory):
    out = tmp_path_factory.mktemp("win_stream")
    h = dt.timedelta(hours=1)
    # batch 0: day-1 data
    _write_batch(str(out / "b0.parquet"),
                 [(T0 + i * h, "en", f"d1-{i}") for i in range(10)], order=0)
    # batch 1: day-2 data (advances watermark past day-1 end)
    _write_batch(str(out / "b1.parquet"),
                 [(T0 + dt.timedelta(days=1, hours=13) + i * h, "en", f"d2-{i}")
                  for i in range(8)], order=1)
    # batch 2: far future (closes day 2) + a LATE day-1 row (behind watermark)
    _write_batch(str(out / "b2.parquet"),
                 [(T0 + dt.timedelta(days=3, hours=2), "en", "d3-0"),
                  (T0 + dt.timedelta(hours=2), "en", "LATE-d1")], order=2)
    return str(out)


def test_windowed_finalization_and_late_drop(spark, stream_src, tmp_path):
    schema = "ts timestamp, lang string, key string"
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(stream_src))
    out = streaming_windowed_build(stream, "ts", ["lang"], SPECS,
                                   window="1 day", watermark="1 hour")
    q = (out.writeStream.format("memory").queryName("win_updates")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM win_updates ORDER BY win_start").collect()
    assert rows, "no windowed updates"
    finals = {r["win_start"].date().isoformat(): r for r in rows if r["is_final"]}
    # day 1 and day 2 windows finalized (day 3+ may still be open)
    assert "2024-01-01" in finals and "2024-01-02" in finals
    d1 = sketch_from_bytes(bytes(finals["2024-01-01"]["sketch"]))
    d2 = sketch_from_bytes(bytes(finals["2024-01-02"]["sketch"]))
    # the LATE-d1 row arrived after the watermark passed day-1: dropped
    assert finals["2024-01-01"]["n_rows"] == 10
    assert round(d1.estimate()) == 10
    assert finals["2024-01-02"]["n_rows"] == 8
    assert round(d2.estimate()) == 8


def test_windowed_nonutc_session_timezone(spark, stream_src, tmp_path):
    """Regression: timeout epoch must come from JVM-side unix_millis —
    pandas .timestamp() on session-local naive keys broke non-UTC tz."""
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        schema = "ts timestamp, lang string, key string"
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(stream_src))
        out = streaming_windowed_build(stream, "ts", ["lang"], SPECS,
                                       window="1 day", watermark="1 hour")
        q = (out.writeStream.format("memory").queryName("win_tz")
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ck_tz"))
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        assert q.exception() is None, q.exception()
        rows = spark.sql("SELECT * FROM win_tz").collect()
        finals = [r for r in rows if r["is_final"]]
        assert len(finals) >= 2  # day windows still finalize
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
