"""Small DataFrame utilities shared across operator modules."""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize(df: DataFrame) -> DataFrame:
    """Eagerly materialize a DataFrame that later stages read multiple
    times (or whose lineage must be truncated for an iterative loop).

    Uses the RELIABLE ``checkpoint`` when the session has a checkpoint
    dir configured (``sc.setCheckpointDir`` — survives executor loss /
    preemption on a real cluster), else ``localCheckpoint`` (blocks
    live on executors: fastest, fine for local mode, and released by
    the ContextCleaner with the result instead of lingering in the
    session's cache manager the way ``.cache()`` does).

    NOTE: Spark does NOT delete reliable checkpoint files by default —
    set ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (our
    ``get_spark`` does) or the checkpoint dir grows with every
    iterative round until quota exhaustion.
    """
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
