"""Streaming corpus curation: the STATELESS text operators (quality,
PII scrub, token counts, lang-id, fingerprints) are pure column
expressions / Arrow map ops, so the SAME operator functions run
unchanged on a stream — this pins stream == batch row-for-row across
micro-batches. (repetition_scores aggregates per doc via groupBy, so
on a stream it belongs with the windowed/stateful machinery, not
here.)"""

import pyarrow.parquet as pq
import pytest

from sketchlib.spark import textops


@pytest.fixture(scope="module")
def doc_stream_dir(tmp_path_factory):
    """sf0.001 documents split into 3 files = 3 micro-batches."""
    tbl = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    out = tmp_path_factory.mktemp("doc_stream")
    n = tbl.num_rows // 3
    for i in range(3):
        part = tbl.slice(i * n, n if i < 2 else tbl.num_rows - 2 * n)
        pq.write_table(part, str(out / f"batch-{i:02d}.parquet"))
    return str(out)


def _run_stream(spark, df_stream, op, name, tmp_path):
    q = (op(df_stream).writeStream.format("memory").queryName(name)
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / f"{name}_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


@pytest.mark.parametrize("opname", ["quality", "pii", "fingerprint",
                                    "tokens", "langid"])
def test_stream_equals_batch(spark, doc_stream_dir, tmp_path, opname):
    batch_df = spark.read.parquet(doc_stream_dir)
    ops = {
        "quality": lambda d: textops.quality_scores(d, "doc_id", "text"),
        "pii": lambda d: textops.pii_scrub(d, "doc_id", "text"),
        "fingerprint": lambda d: textops.content_fingerprint(d, "doc_id",
                                                             "text"),
        "tokens": lambda d: textops.token_counts_bpe(d, "doc_id", "text"),
        "langid": lambda d: textops.langid_heuristic(d, "doc_id", "text"),
    }
    op = ops[opname]
    stream = (spark.readStream.schema(batch_df.schema)
              .option("maxFilesPerTrigger", 1).parquet(doc_stream_dir))
    got = _run_stream(spark, stream, op, f"cur_{opname}", tmp_path)
    want = op(batch_df)
    key = lambda r: tuple(str(v) for v in r)
    assert sorted(map(key, got.collect())) == \
        sorted(map(key, want.collect()))
