"""Stages 1+2: calibration and distributed sketch build.

Reproduces the reference's dataflow (/root/reference/spark/main.py:
stage 1 count-per-class :100-137, stage 2 partition-local build +
OR-merge :139-164) with the Spark-native architecture from SURVEY.md §4:

  1. ``calibrate``      — exact `groupBy().count()` (Catalyst partial
                          aggregation; the only full-row shuffle-free scan).
  2. ``build_partials`` — ``mapInPandas`` over *input partitions*: one
                          partial sketch per (group, spec) per partition.
                          Raw rows NEVER shuffle (the reference's
                          `groupByKey` at main.py:146 shuffles every row —
                          its known skew trap, SURVEY.md G1). Only
                          fixed-size sketch states cross the wire.
  3. ``merge_partials`` — hierarchical merge via ``applyInPandas``;
                          optional two-level (salted) fan-in for very
                          wide clusters, treeAggregate-style.

At 100 TB: the shuffle volume is (#input_partitions × #groups ×
sketch_bytes) regardless of row count — the property that makes the
reference's design scale, preserved verbatim.
"""

from __future__ import annotations

from collections.abc import Iterator

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pa_compute
from pyspark.sql import DataFrame
import pyspark.sql.functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType)

from sketchlib.core.cms import CountMinSketch
from sketchlib.core.sample import WeightedBottomKSample
from sketchlib.core.countsketch import CountSketch
from sketchlib.core.params import bloom_params
from sketchlib.core.serde import sketch_from_bytes
from sketchlib.spark.specs import SketchSpec


def calibrate(df: DataFrame, group_cols: list[str]) -> DataFrame:
    """Stage 1: exact per-group counts (n). Catalyst does partial agg."""
    return df.groupBy(*group_cols).agg(F.count("*").alias("n"))


def task_partition_id() -> int:
    """Current task's input partition id, or -1 when called off-task
    (driver-side tests). The -1 sentinel participates in
    ``merge_partials``' (partition_id, chunk) sort contract — every
    partial-producing kernel must use THIS helper so the sentinel can
    never drift between producers."""
    from pyspark import TaskContext
    ctx = TaskContext.get()
    return ctx.partitionId() if ctx is not None else -1


def bloom_params_by_group(calib: DataFrame, p: float) -> dict:
    """Driver-side (m, k) per group from collected calibration counts.

    Mirrors /root/reference/spark/main.py:117-125 (collect n per class,
    derive m per class, one k) — bounded by #groups, never by #rows.
    """
    rows = calib.collect()
    out = {}
    for r in rows:
        vals = r.asDict()
        n = vals.pop("n")
        key = tuple(vals.values())
        if len(key) == 1:
            key = key[0]
        m, k = bloom_params(n, p)
        out[key] = {"m": m, "k": k}
    return out


def _group_fields(df: DataFrame, group_cols: list[str]) -> list[StructField]:
    by_name = {f.name: f for f in df.schema.fields}
    return [StructField(c, by_name[c].dataType, True) for c in group_cols]


def _partials_schema(df: DataFrame, group_cols: list[str]) -> StructType:
    return StructType(_group_fields(df, group_cols) + [
        StructField("sketch_name", StringType(), False),
        StructField("partial", BinaryType(), False),
        StructField("n_rows", LongType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("chunk", IntegerType(), False),
    ])


def _norm_nan(key):
    """pandas groupby(dropna=False) yields float NaN for null keys while
    Spark's collect() yields None — normalize to None so per-group param
    dicts and validation self-exclusion line up across the boundary."""
    if isinstance(key, tuple):
        return tuple(_norm_nan(k) for k in key)
    if isinstance(key, float) and np.isnan(key):
        return None
    return key


def tokens_arrow(col: pd.Series) -> "pa.Array":
    """Arrow-native tokenizer: drop nulls, split on single space, drop
    empty tokens — identical semantics to the old pandas
    split/explode path and the DuckDB oracles (parity-tested), but the
    split/flatten/filter runs in Arrow C++ with no per-token Python
    objects: measured 6.3x faster on the pages corpus, where
    tokenization was 95% of the CMS build stage.

    Non-string columns coerce via pandas astype(str) — Python str()
    semantics (1.0 -> '1.0'), matching the old path, Spark's CAST AS
    STRING, and the oracles; an arrow float->string cast would yield
    '1' and silently change token identity."""
    col = col.dropna()
    try:
        arr = pa.array(col, type=pa.large_string())
    except (pa.ArrowTypeError, pa.ArrowInvalid, pa.ArrowNotImplementedError):
        # non-string / mixed batch: coerce per-element like the old
        # pandas path (Python str() semantics: 1.0 -> '1.0')
        arr = pa.array(col.astype(str), type=pa.large_string())
    toks = pa_compute.list_flatten(pa_compute.split_pattern(arr, " "))
    return toks.filter(pa_compute.not_equal(toks, ""))


def update_from_token_counts(freq_sketch, tracker, col: pd.Series) -> bool:
    """Tokenize + value_counts + weighted frequency-sketch update, with
    an optional SpaceSaving-style tracker — the one token-feed shared
    by heavy hitters and its streaming twin (so the two cannot drift).
    Returns False when the batch had no tokens."""
    toks = tokens_arrow(col)
    if not len(toks):
        return False
    vc = pa_compute.value_counts(toks)
    counts = vc.field("counts").to_numpy()
    freq_sketch.update_batch(vc.field("values"), counts)
    if tracker is not None:
        tracker.add_batch(vc.field("values").to_pylist(), counts)
    return True


def _values_for(spec: SketchSpec, sub: pd.DataFrame):
    col = sub[spec.value_col]
    if spec.tokenize:
        return tokens_arrow(col)
    if spec.numeric:
        return col.to_numpy(dtype=np.float64, na_value=np.nan)
    return col.dropna()


def _feed(spec: SketchSpec, sketch, sub: pd.DataFrame,
          vcache: dict | None = None) -> None:
    """Feed one pandas sub-frame into a sketch per its spec (tokenize /
    numeric / weighted dispatch) — the single update path shared by the
    batch build and both streaming builds, so semantics cannot drift.

    ``vcache`` memoizes extracted value columns across specs sharing a
    (value_col, tokenize, numeric) triple within one sub-frame.
    """
    if spec.weight_col is not None:  # cms/countsketch/wsample
        vals = sub[spec.value_col]
        w = pd.to_numeric(sub[spec.weight_col], errors="coerce")
        if isinstance(sketch, WeightedBottomKSample):
            # positive-float weights; the kernel applies the shared
            # null rules (null key / NaN weight drop the row) and
            # raises on non-positive weights
            sketch.update_batch(vals, w.to_numpy(np.float64))
            return
        mask = (vals.notna() & w.notna()).to_numpy()
        if mask.any():
            wf = w[mask].to_numpy(np.float64)
            wi = np.rint(wf)
            # fractions are a caller bug, not something to round away
            # quietly; negative weights would decrement CMS cells and
            # silently void its overestimate-only guarantee — but are
            # legitimate deletes for the SIGNED count sketch
            if not np.array_equal(wi, wf):
                raise ValueError(
                    f"weight_col {spec.weight_col!r} must hold "
                    "integral weights (counts)")
            if (wi < 0).any() and isinstance(sketch, CountMinSketch):
                raise ValueError(
                    f"weight_col {spec.weight_col!r} has negative "
                    "weights — CMS counters are overestimate-only; "
                    "use kind='countsketch' for delete streams")
            sketch.update_batch(vals[mask], wi.astype(np.int64))
        return
    vk = (spec.value_col, spec.tokenize, spec.numeric)
    vals = vcache.get(vk) if vcache is not None else None
    if vals is None:
        vals = _values_for(spec, sub)
        if vcache is not None:
            vcache[vk] = vals
    if not len(vals):
        return
    if spec.tokenize and isinstance(sketch, (CountMinSketch, CountSketch)):
        # weighted update over unique tokens: hashes the batch
        # vocabulary, not every occurrence
        vc = pa_compute.value_counts(vals)
        sketch.update_batch(vc.field("values"),
                            vc.field("counts").to_numpy())
    else:
        sketch.update_batch(vals)


def build_partials(df: DataFrame, group_cols: list[str],
                   specs: list[SketchSpec],
                   max_groups_in_flight: int | None = None) -> DataFrame:
    """Stage 2a: one partial sketch per (input partition, group, spec).

    Column-prunes to exactly the needed columns before the Python
    boundary so the parquet scan reads only those (ReadSchema check).

    ``max_groups_in_flight`` (default env SKETCHLIB_MAX_GROUPS_IN_FLIGHT
    or 8192) bounds task memory on HIGH-CARDINALITY group keys: when a
    task is holding that many (group, spec) states it FLUSHES them as
    partial rows (tagged with an increasing ``chunk``) and starts
    fresh, so memory is O(max_groups x state_bytes) instead of
    O(#groups-in-partition x state_bytes). Flushed chunks are just
    more partials: lattice kernels merge back bitwise-identical to the
    unflushed build; the lossy quantile kernels get one more merge
    boundary — the same effect the partition split already has — and
    stay deterministic because the merge totally orders partial rows
    by (partition_id, chunk).
    """
    if not specs:
        raise ValueError("at least one SketchSpec required")
    names = [s.name for s in specs]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate spec names: {names}")
    if max_groups_in_flight is None:
        max_groups_in_flight = int(os.environ.get(
            "SKETCHLIB_MAX_GROUPS_IN_FLIGHT", "8192"))
    if max_groups_in_flight < 1:
        raise ValueError("max_groups_in_flight must be >= 1")
    value_cols = sorted(({s.value_col for s in specs}
                         | {s.weight_col for s in specs if s.weight_col})
                        - set(group_cols))  # a group col can be sketched
    sel = df.select(*group_cols, *value_cols)
    schema = _partials_schema(df, group_cols)
    n_groups = len(group_cols)
    flush_at = max_groups_in_flight * len(specs)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = task_partition_id()
        acc: dict = {}  # (group_tuple, spec_idx) -> [sketch, n_rows]
        chunk = 0

        def emit():
            rows = []
            for (gkey, si), (sk, n) in acc.items():
                rows.append((*gkey, specs[si].name, sk.to_bytes(), n, pid,
                             chunk))
            return pd.DataFrame(rows, columns=[*group_cols, "sketch_name",
                                               "partial", "n_rows",
                                               "partition_id", "chunk"])

        for pdf in batches:
            for gkey, sub in pdf.groupby(group_cols, sort=False, dropna=False):
                if not isinstance(gkey, tuple):
                    gkey = (gkey,)
                gkey = _norm_nan(gkey)
                # extract each distinct (value_col, tokenize, numeric)
                # once per group — specs often share a column (e.g. a
                # Bloom and an HLL over url)
                vcache: dict = {}
                for si, spec in enumerate(specs):
                    slot = acc.get((gkey, si))
                    if slot is None:
                        slot = [spec.make(gkey if n_groups > 1 else gkey[0]), 0]
                        acc[(gkey, si)] = slot
                    _feed(spec, slot[0], sub, vcache)
                    slot[1] += len(sub)
                # checked per GROUP, not per batch: one wide arrow
                # batch must not blow past the memory bound (pandas
                # groupby iteration order is first-occurrence —
                # deterministic, so chunk boundaries are too)
                if len(acc) >= flush_at:
                    yield emit()
                    acc.clear()
                    chunk += 1
        if acc:
            yield emit()

    return sel.mapInPandas(fn, schema)


def _merged_schema(partials: DataFrame, group_cols: list[str]) -> StructType:
    return StructType(_group_fields(partials, group_cols) + [
        StructField("sketch_name", StringType(), False),
        StructField("sketch", BinaryType(), False),
        StructField("n_rows", LongType(), False),
        StructField("n_partials", LongType(), False),
    ])


def _parse_dtype(dtype: str):
    from pyspark.sql.types import _parse_datatype_string
    return _parse_datatype_string(dtype)


def merge_partials(partials: DataFrame, group_cols: list[str],
                   fanout: int | str | list[int] | None = None,
                   allow_narrow: bool = True,
                   readout: list | None = None) -> DataFrame:
    """Stage 2b: hierarchical merge of partial sketches per (group, spec).

    ``fanout=S`` inserts one salted pre-merge level (treeAggregate
    depth-2): partials first merge within (group, partition_id % S)
    buckets, then across buckets. ``fanout=[b1, b2, ...]`` is the
    general MULTI-LEVEL tree — bucket counts per salt level, each
    followed by a final cross-bucket fold — bounding every task's
    fan-in AND its input bytes even when the merged state is much
    larger than a partial (a skewed group's Bloom densifies after the
    first level: one more cheap level caps the big-blob fan-in where a
    depth-2 tree must choose which side to bound). ``fanout="auto"``
    sizes the plan from the partials' partition count (resolved HERE
    so every caller — including the checkpointed build — accepts it).
    Partials are merged in (partition_id, chunk) order — a total order
    over a group's partial rows even when the memory-bounded flush
    split a partition into chunks; bucket indices become the next
    level's partition_id, so the fold order is deterministic
    run-to-run at every level for the lossy quantile sketches too.

    ``readout=[(col, dtype, fn), ...]`` fuses estimate extraction into
    the FINAL merge task: each ``fn(sketch_name, sketch)`` runs right
    after the fold, appending a value column to the output row — no
    separate python-eval read-out stage (one fewer Arrow round-trip;
    the round-4 gap vs percentile_approx was exactly these boundaries,
    BENCH/builtin_compare.py). The merged blob column still ships, so
    the result stays persistable and mergeable.
    """
    # nparts is needed to resolve "auto" and to detect the narrow
    # single-partition case; an explicit multi-level fanout needs
    # neither, so skip the DataFrame->RDD plan conversion then
    nparts = None
    if fanout == "auto":
        nparts = partials.rdd.getNumPartitions()
        fanout = _auto_fanout(nparts)
    out_schema = _merged_schema(partials, group_cols)
    if readout is not None:
        out_schema = StructType(out_schema.fields + [
            StructField(col, _parse_dtype(dtype), True)
            for col, dtype, _fn in readout])
    keys = [*group_cols, "sketch_name"]

    def _fold_sorted(pdf):
        """Deterministic fold shared by both merge levels."""
        pdf = pdf.sort_values(["partition_id", "chunk"], kind="stable")
        sk = sketch_from_bytes(bytes(pdf["partial"].iloc[0]))
        for blob in pdf["partial"].iloc[1:]:
            sk.merge(sketch_from_bytes(bytes(blob)))
        return sk, pdf

    def merge_fn(key, pdf):
        sk, pdf = _fold_sorted(pdf)
        extra = {}
        if readout is not None:
            name = key[len(keys) - 1]
            for col, _dtype, fn in readout:
                extra[col] = [fn(name, sk)]
        return pd.DataFrame({
            **{c: [key[i]] for i, c in enumerate(keys)},
            "sketch": [sk.to_bytes()],
            "n_rows": [int(pdf["n_rows"].sum())],
            "n_partials": [int(pdf["n_partials"].sum()) if "n_partials" in pdf
                           else len(pdf)],
            **extra,
        })

    plan = list(fanout) if isinstance(fanout, (list, tuple)) else \
        ([int(fanout)] if fanout and fanout > 1 else [])
    if not plan and nparts is None:
        nparts = partials.rdd.getNumPartitions()

    if nparts == 1 and not plan and allow_narrow:
        # every partial row of a (group, spec) lives in the one input
        # partition, so a NARROW per-partition fold is complete — no
        # Exchange, no extra stage wave: it pipelines with the partial
        # build in the same task (measurably faster on small inputs,
        # where the shuffle stage latency dominates the whole query).
        # Fold order is the same (partition_id, chunk) sort, so the
        # result is bitwise-identical to the shuffle path.
        #
        # Memory shape: batches accumulate per GROUP and each group is
        # folded (and its accumulation freed) independently, so the
        # transient is all partial blobs once plus ONE group's frame —
        # never a single concat of every group's dense partials. For
        # inputs where even that is too much (a large checkpoint store
        # read back as one partition), callers pass allow_narrow=False
        # and take the shuffle path, which holds one group per task.
        def fold_partition(batches):
            groups: dict = {}
            for pdf in batches:
                if not len(pdf):
                    continue
                for key, sub in pdf.groupby(keys, sort=False, dropna=False):
                    if not isinstance(key, tuple):
                        key = (key,)
                    # normalize BEFORE the dict insert: distinct NaN
                    # objects are unequal, so a null numeric group key
                    # spanning multiple Arrow batches would otherwise
                    # split into duplicate partial rows (review r5)
                    groups.setdefault(_norm_nan(key), []).append(sub)
            if not groups:
                return
            out = []
            for key in list(groups):
                sub = pd.concat(groups.pop(key), ignore_index=True)
                out.append(merge_fn(key, sub))
            yield pd.concat(out, ignore_index=True)

        return partials.mapInPandas(fold_partition, out_schema)

    if plan:
        mid_schema = StructType(_group_fields(partials, group_cols) + [
            StructField("sketch_name", StringType(), False),
            StructField("partial", BinaryType(), False),
            StructField("n_rows", LongType(), False),
            StructField("partition_id", IntegerType(), False),
            StructField("chunk", IntegerType(), False),
            StructField("n_partials", LongType(), False),
        ])

        def level_fn(key, pdf, bucket):
            sk, pdf = _fold_sorted(pdf)
            return pd.DataFrame({
                **{c: [key[i]] for i, c in enumerate(keys)},
                "partial": [sk.to_bytes()],
                "n_rows": [int(pdf["n_rows"].sum())],
                # bucket index becomes next level's partition_id: the
                # fold order at every level is then a pure function of
                # the tree shape, not of task scheduling
                "partition_id": [int(bucket)],
                "chunk": [0],
                "n_partials": [int(pdf["n_partials"].sum())
                               if "n_partials" in pdf else len(pdf)],
            })

        level = partials
        for buckets in plan:
            salted = level.withColumn(
                "salt", F.pmod(F.col("partition_id"), F.lit(int(buckets))))
            level = (salted.groupBy(*keys, "salt")
                     .applyInPandas(lambda k, p: level_fn(k[:-1], p, k[-1]),
                                    mid_schema))
        return level.groupBy(*keys).applyInPandas(merge_fn, out_schema)

    return partials.groupBy(*keys).applyInPandas(merge_fn, out_schema)


def _fold_blobs(pdf: pd.DataFrame, context: str | None = None):
    """Deserialize + fold-merge one group's sketch blobs (shared by
    rollup_sketches and incremental_update merge tasks)."""
    sk = sketch_from_bytes(bytes(pdf["sketch"].iloc[0]))
    for blob in pdf["sketch"].iloc[1:]:
        try:
            sk.merge(sketch_from_bytes(bytes(blob)))
        except ValueError as e:
            if context:
                raise ValueError(f"{context}: {e}") from e
            raise
    return sk


def rollup_sketches(sketches: DataFrame, from_cols: list[str],
                    to_cols: list[str],
                    readout: list | None = None) -> DataFrame:
    """Roll a sketch table keyed by ``from_cols`` up to ``to_cols`` by
    MERGING the stored states — no rebuild from raw rows.

    This is the other half of the mergeability contract the reference's
    ``reduceByKey(|)`` embodies (/root/reference/spark/main.py:150): a
    (lang, day) HLL table rolls up to per-lang distinct estimates by
    register-max alone. For the lattice sketches (bloom/hll/cms/theta)
    the rolled-up state is bitwise-identical to one built directly at
    the coarser key; for the lossy quantile sketches (kll/tdigest) the
    result is a valid merged sketch (deterministic here: blobs merge in
    sorted dropped-key order) whose error bound still holds.

    Input must have the ``build_sketches`` output shape
    (from_cols..., sketch_name, sketch, n_rows, n_partials).
    ``readout=[(col, dtype, fn), ...]`` appends estimate columns
    extracted inside the rollup's own merge task (same contract as
    ``merge_partials``): rolled-up read-outs with zero extra stages.
    SQL equivalent (registered by ``register_sql_functions``):
    ``SELECT to_cols, sketch_merge(collect_list(sketch)) ... GROUP BY``.
    """
    missing = [c for c in to_cols if c not in from_cols]
    if missing:
        raise ValueError(f"to_cols {missing} not in from_cols {from_cols}")
    dropped = [c for c in from_cols if c not in to_cols]
    keys = [*to_cols, "sketch_name"]
    out_schema = StructType(_group_fields(sketches, to_cols) + [
        StructField("sketch_name", StringType(), False),
        StructField("sketch", BinaryType(), False),
        StructField("n_rows", LongType(), False),
        StructField("n_partials", LongType(), False),
    ])
    if readout is not None:
        out_schema = StructType(out_schema.fields + [
            StructField(col, _parse_dtype(dtype), True)
            for col, dtype, _fn in readout])

    def merge_fn(key, pdf):
        if dropped:
            pdf = pdf.sort_values(dropped, kind="stable")
        # e.g. per-group Bloom params: each fine group has its own
        # (m, k), so states across the dropped key cannot merge
        sk = _fold_blobs(pdf, context=(
            f"cannot roll up group {key}: states across the dropped "
            f"key(s) {dropped} have incompatible params; rollup "
            "requires params uniform over the dropped keys "
            "(HLL/CMS/theta/KLL/t-digest with fixed params qualify; "
            "per-group-calibrated Bloom does not)"))
        extra = {}
        if readout is not None:
            name = key[len(keys) - 1]
            for col, _dtype, fn in readout:
                extra[col] = [fn(name, sk)]
        return pd.DataFrame({
            **{c: [key[i]] for i, c in enumerate(keys)},
            "sketch": [sk.to_bytes()],
            "n_rows": [int(pdf["n_rows"].sum())],
            "n_partials": [int(pdf["n_partials"].sum())],
            **extra,
        })

    return sketches.groupBy(*keys).applyInPandas(merge_fn, out_schema)


def build_sketches(df: DataFrame, group_cols: list[str],
                   specs: list[SketchSpec],
                   fanout: int | str | None = "auto",
                   readout: list | None = None) -> DataFrame:
    """Full stage-2: partial build then hierarchical merge.

    ``fanout="auto"`` (default) is resolved inside ``merge_partials``
    (see ``_auto_fanout``): single fold up to 64 partials per group,
    else a multi-level salt plan bounding every merge task's fan-in
    AND input bytes; a single-partition input merges in a narrow
    no-Exchange fold.

    Returns one row per (group, sketch_name):
    (group_cols..., sketch_name, sketch binary, n_rows, n_partials).
    """
    return merge_partials(build_partials(df, group_cols, specs),
                          group_cols, fanout=fanout, readout=readout)


def build_sketches_local(df: DataFrame, group_cols: list[str],
                         specs: list[SketchSpec]) -> dict:
    """ONE-python-stage build for interactive read-outs: build partials
    distributed, collect the ≤ #partitions × #groups × #specs
    fixed-size blobs, fold driver-side in (partition_id, chunk) order
    — bitwise-identical to ``merge_partials`` (same total order), but
    without the merge shuffle and its second python-eval stage. This
    closes the read-out latency gap to JVM-native aggregates
    (BENCH/builtin_compare.py: KLL median read-out 0.35s -> 0.20s vs
    percentile_approx 0.19s at sf0.1/local[32]).

    Returns {(group_key..., sketch_name): sketch object}; single group
    col keys collapse to (value, sketch_name). Use ONLY when
    #groups × #partitions is driver-small (interactive estimates,
    validation loops); the persisted/mergeable path at 10^12 rows
    stays ``build_sketches``, whose merge runs on executors.
    """
    from collections import defaultdict
    parts = build_partials(df, group_cols, specs) \
        .select(*group_cols, "sketch_name", "partition_id", "chunk",
                "partial").collect()
    groups = defaultdict(list)
    for r in parts:
        key = tuple(r[c] for c in group_cols) + (r["sketch_name"],)
        groups[key].append((r["partition_id"], r["chunk"], r["partial"]))
    out = {}
    for key, lst in groups.items():
        lst.sort(key=lambda t: (t[0], t[1]))
        sk = sketch_from_bytes(bytes(lst[0][2]))
        for _pid, _chunk, blob in lst[1:]:
            sk.merge(sketch_from_bytes(bytes(blob)))
        out[key if len(key) > 2 else (key[0], key[1])] = sk
    return out


def _auto_fanout(parts: int) -> list[int] | None:
    """Merge-tree plan from the partial count (per-group fan-in ==
    #partitions): single fold up to 64 partials/group; above that, a
    multi-level plan whose FIRST level caps fan-in at 16 (inputs are
    small sparse partials — spread the deserialize work) and whose
    later levels cap fan-in at 4 (inputs are merged, often densified,
    blobs — bound the straggler's input BYTES, which a two-level
    sqrt(parts) tree cannot once merged-state >> partial-state; the
    skew bench BENCH/skew.py measures the difference). Depth is
    O(log parts): 257 -> [17, 5], 10k -> [625, 157, 40, 10, 3]."""
    if parts <= 64:
        return None
    plan = [int(np.ceil(parts / 16))]
    while plan[-1] > 6:
        plan.append(int(np.ceil(plan[-1] / 4)))
    return plan


def incremental_update(sketch_table: DataFrame, new_df: DataFrame,
                       group_cols: list[str], specs: list[SketchSpec],
                       fanout: int | str | None = "auto",
                       readout: list | None = None) -> DataFrame:
    """Fold NEW rows into an existing sketch table — the daily-append
    maintenance op mergeability buys: sketch only the delta, merge with
    the stored states, never re-read the base corpus.

    For lattice kernels the result is bitwise-identical to a full
    rebuild over base+delta (test-enforced); for the lossy quantile
    kernels it is a valid merged state within bounds. Groups appearing
    only in the delta (a new lang/day) pass through from the delta
    build; groups untouched by the delta pass through unchanged from
    the stored table.

    specs must match the ones that built ``sketch_table`` (same kinds
    and params — kernel merge validates and refuses mismatches).

    Plan shape: one partial build over the DELTA only + a merge whose
    input is (stored_states + delta_state) per group — the base data
    is never scanned. At 10^12 base rows and a 10^9-row daily delta,
    that is the difference between a job and an outage.
    """
    delta = build_sketches(new_df, group_cols, specs, fanout=fanout)
    keys = [*group_cols, "sketch_name"]
    both = (sketch_table.select(*keys, "sketch", "n_rows", "n_partials")
            .unionByName(delta.select(*keys, "sketch", "n_rows",
                                      "n_partials")))
    out_schema = StructType(_group_fields(sketch_table, group_cols) + [
        StructField("sketch_name", StringType(), False),
        StructField("sketch", BinaryType(), False),
        StructField("n_rows", LongType(), False),
        StructField("n_partials", LongType(), False),
    ])
    if readout is not None:
        # same fused-extraction contract as merge_partials(readout=):
        # estimate columns come out of the update's own merge task
        out_schema = StructType(out_schema.fields + [
            StructField(col, _parse_dtype(dtype), True)
            for col, dtype, _fn in readout])

    def merge_fn(key, pdf):
        # deterministic merge order for the lossy kernels: base first
        # (larger n_rows), then delta. Row arrival order inside
        # applyInPandas is shuffle-dependent, so ties on n_rows (equal
        # base/delta sizes, repeated updates) need a content-based
        # secondary key — the blob bytes — to make the fold a total
        # order independent of arrival order.
        pdf = pdf.assign(_blob=pdf["sketch"].map(bytes)).sort_values(
            ["n_rows", "_blob"], ascending=[False, True], kind="stable")
        sk = _fold_blobs(pdf, context=(
            f"cannot update group {key}: the stored state and the "
            "delta build have incompatible params — pass the same "
            "specs that built the sketch table"))
        extra = {}
        if readout is not None:
            name = key[len(keys) - 1]
            for col, _dtype, fn in readout:
                extra[col] = [fn(name, sk)]
        return pd.DataFrame({
            **{c: [key[i]] for i, c in enumerate(keys)},
            "sketch": [sk.to_bytes()],
            "n_rows": [int(pdf["n_rows"].sum())],
            "n_partials": [int(pdf["n_partials"].sum())],
            **extra,
        })

    return both.groupBy(*keys).applyInPandas(merge_fn, out_schema)
