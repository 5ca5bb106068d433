"""Per-column statistics in ONE aggregation pass — the table-scale
generalization of required/minimum/maximum/minLength (SURVEY.md §2.4):
null-rate, approximate distinct (HyperLogLog++), min/max/mean, length
stats. One scan, one shuffle, all columns (SURVEY.md §4.1 fused pass)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.FloatType, T.DoubleType, T.DecimalType)


def column_stats(
    df: DataFrame,
    columns: list[str] | None = None,
    partition_col: str | None = None,
    rsd: float = 0.05,
) -> DataFrame:
    """Wide per-partition stats: one groupBy(partition) pass emitting, for
    every column c: c__null_rate, c__approx_distinct, and (numeric)
    c__min/c__max/c__mean or (string) c__len_min/c__len_max/c__len_mean.

    Returns one row per partition (plus rows_checked)."""
    columns = columns or [c for c in df.columns if c != partition_col]
    aggs = [F.count(F.lit(1)).alias("rows_checked")]
    for c in columns:
        dtype = df.schema[c].dataType
        col = F.col(c)
        aggs.append(F.avg(col.isNull().cast("double")).alias(f"{c}__null_rate"))
        aggs.append(F.approx_count_distinct(c, rsd).cast("double").alias(f"{c}__approx_distinct"))
        if isinstance(dtype, NUMERIC):
            aggs += [
                F.min(col).cast("double").alias(f"{c}__min"),
                F.max(col).cast("double").alias(f"{c}__max"),
                F.avg(col).cast("double").alias(f"{c}__mean"),
            ]
        elif isinstance(dtype, T.StringType):
            ln = F.length(col)
            aggs += [
                F.min(ln).cast("double").alias(f"{c}__len_min"),
                F.max(ln).cast("double").alias(f"{c}__len_max"),
                F.avg(ln).cast("double").alias(f"{c}__len_mean"),
            ]
        elif isinstance(dtype, (T.TimestampType, T.DateType)):
            aggs += [
                F.min(col).cast("double").alias(f"{c}__min"),
                F.max(col).cast("double").alias(f"{c}__max"),
            ]
    grouped = df.groupBy(partition_col) if partition_col else df.groupBy()
    return grouped.agg(*aggs)


def _hll_input(col, dtype):
    """Cast a column to a type hll_sketch_agg accepts (int/long/string/
    binary), preserving distinctness."""
    if isinstance(dtype, (T.StringType, T.BinaryType, T.IntegerType, T.LongType)):
        return col
    if isinstance(dtype, (T.ByteType, T.ShortType, T.BooleanType)):
        return col.cast("long")
    if isinstance(dtype, T.TimestampType):
        return F.unix_micros(col)
    if isinstance(dtype, T.DateType):
        return F.unix_date(col)
    # float/double/decimal: canonical string repr keeps distinct values apart
    return col.cast("string")


def stats_partial_aggs(schema: T.StructType, columns: list[str]) -> list:
    """Decomposable (mergeable) per-column stat partials for a fine-grained
    groupBy — the map-side half of column_stats. Distinct counts use
    Datasketches HLL (hll_sketch_agg), whose sketches MERGE across groups,
    unlike approx_count_distinct whose final estimate can't re-aggregate.
    Pair with stats_merge_aggs at the coarser (partition-level) groupBy."""
    aggs = []
    for c in columns:
        dtype = schema[c].dataType
        col = F.col(c)
        aggs.append(F.sum(col.isNull().cast("long")).alias(f"{c}__P_nulls"))
        aggs.append(F.count(col).alias(f"{c}__P_cnt"))
        aggs.append(F.hll_sketch_agg(_hll_input(col, dtype)).alias(f"{c}__P_hll"))
        if isinstance(dtype, NUMERIC):
            aggs += [
                F.min(col).alias(f"{c}__P_min"),
                F.max(col).alias(f"{c}__P_max"),
                F.sum(col.cast("double")).alias(f"{c}__P_sum"),
            ]
        elif isinstance(dtype, T.StringType):
            ln = F.length(col)
            aggs += [
                F.min(ln).alias(f"{c}__P_lmin"),
                F.max(ln).alias(f"{c}__P_lmax"),
                F.sum(ln.cast("double")).alias(f"{c}__P_lsum"),
            ]
        elif isinstance(dtype, (T.TimestampType, T.DateType)):
            aggs += [F.min(col).alias(f"{c}__P_min"), F.max(col).alias(f"{c}__P_max")]
    return aggs


def stats_merge_aggs(schema: T.StructType, columns: list[str]) -> list:
    """Merge stats_partial_aggs partials to the column_stats output schema
    (c__null_rate, c__approx_distinct, c__min/max/mean, c__len_*). The
    caller's agg must also provide sum(__n) -> rows_checked."""
    aggs = []
    for c in columns:
        dtype = schema[c].dataType
        aggs.append(
            (F.sum(f"{c}__P_nulls") / (F.sum(f"{c}__P_nulls") + F.sum(f"{c}__P_cnt")))
            .alias(f"{c}__null_rate")
        )
        aggs.append(
            F.coalesce(
                F.hll_sketch_estimate(F.hll_union_agg(f"{c}__P_hll")).cast("double"),
                F.lit(0.0),
            ).alias(f"{c}__approx_distinct")
        )
        if isinstance(dtype, NUMERIC):
            aggs += [
                F.min(f"{c}__P_min").cast("double").alias(f"{c}__min"),
                F.max(f"{c}__P_max").cast("double").alias(f"{c}__max"),
                (F.sum(f"{c}__P_sum") / F.sum(f"{c}__P_cnt")).alias(f"{c}__mean"),
            ]
        elif isinstance(dtype, T.StringType):
            aggs += [
                F.min(f"{c}__P_lmin").cast("double").alias(f"{c}__len_min"),
                F.max(f"{c}__P_lmax").cast("double").alias(f"{c}__len_max"),
                (F.sum(f"{c}__P_lsum") / F.sum(f"{c}__P_cnt")).alias(f"{c}__len_mean"),
            ]
        elif isinstance(dtype, (T.TimestampType, T.DateType)):
            aggs += [
                F.min(f"{c}__P_min").cast("double").alias(f"{c}__min"),
                F.max(f"{c}__P_max").cast("double").alias(f"{c}__max"),
            ]
    return aggs


def length_histogram(
    df: DataFrame,
    column: str,
    partition_col: str | None = None,
    bucket_width: int = 100,
) -> DataFrame:
    """Length histogram for a string column: (partition?, bucket, n).
    bucket = floor(length / bucket_width); NULLs get bucket -1."""
    b = F.coalesce(
        F.floor(F.length(F.col(column)) / bucket_width), F.lit(-1)
    ).alias("bucket")
    keys = ([partition_col] if partition_col else []) + ["bucket"]
    return df.select(*([partition_col] if partition_col else []), b).groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n")
    )


def top_values(df: DataFrame, col: str, k: int = 10) -> DataFrame:
    """Top-k most frequent values of a column with counts and share —
    the classic data-quality "what dominates this column" check.
    One groupBy (partial+final agg) + a rank over the tiny aggregated
    result (cardinality(col) rows, not input rows), so the window never
    sees raw data. Ties break by value for determinism."""
    from pyspark.sql import Window

    counts = df.groupBy(col).agg(F.count(F.lit(1)).alias("n"))
    # total from the aggregated result (one scan total, no second action);
    # the global window runs over cardinality(col) rows, not input rows
    w_all = Window.partitionBy()
    w = Window.orderBy(F.desc("n"), F.col(col))
    return (
        counts.withColumn("total", F.sum("n").over(w_all))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "rank",
            F.col(col).alias("value"),
            F.col("n"),
            F.round(F.col("n") / F.col("total"), 6).alias("share"),
        )
    )


def fd_violations(df: DataFrame, determinant: str, dependent: str) -> DataFrame:
    """Functional-dependency check: determinant -> dependent should be
    single-valued; report determinant values that map to more than one
    distinct dependent (count + the min/max dependent as witnesses).
    Pure aggregation — partial+final, skew-safe (see BENCH/BASELINE.md
    skew section: map-side combine collapses hot keys)."""
    return (
        df.groupBy(determinant)
        .agg(
            F.count_distinct(F.col(dependent)).alias("n_dependent"),
            F.min(dependent).alias("dep_min"),
            F.max(dependent).alias("dep_max"),
        )
        .filter(F.col("n_dependent") > 1)
    )


def top_k_per_group(
    df: DataFrame,
    group: str,
    value: str,
    id_col: str,
    k: int,
    salt_buckets: int | None = None,
) -> DataFrame:
    """Top-k rows per group by ``value`` (descending; ties break by
    descending ``id_col`` for determinism) — the "keep the k best
    documents per language" selection step.

    ``salt_buckets=None``: the window form (row_number over a per-group
    sort) — one exchange, but a whale group sorts in ONE task, the
    exact spot the skew study showed windows melt.

    ``salt_buckets=B``: the skew-safe two-stage aggregate. Stage 1
    groups by (group, salt(id)) and keeps each bucket's local top-k
    (sort_array + slice over a collect_list bounded by the bucket,
    which is whale/B rows); stage 2 merges the B candidate lists per
    group — k*B tiny structs, never raw rows. Correct because every
    global top-k row is necessarily in its own bucket's local top-k.
    Both modes return identical rows (pinned in pytest).

    Returns (group, rank, id_col, value).
    """
    pair = F.struct(F.col(value).alias("v"), F.col(id_col).alias("i"))
    if salt_buckets is None:
        from pyspark.sql import Window

        w = Window.partitionBy(group).orderBy(F.desc(value), F.desc(id_col))
        ranked = df.withColumn("__rank", F.row_number().over(w))
        return ranked.filter(F.col("__rank") <= k).select(
            group,
            F.col("__rank").alias("rank"),
            id_col,
            value,
        )
    local = (
        df.withColumn(
            "__salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets))
        )
        .groupBy(group, "__salt")
        .agg(
            F.slice(F.sort_array(F.collect_list(pair), asc=False), 1, k).alias(
                "__top"
            )
        )
    )
    merged = local.groupBy(group).agg(
        F.slice(
            F.sort_array(F.flatten(F.collect_list("__top")), asc=False), 1, k
        ).alias("__top")
    )
    return merged.select(group, F.posexplode("__top").alias("__pos", "__p")).select(
        group,
        (F.col("__pos") + 1).alias("rank"),
        F.col("__p.i").alias(id_col),
        F.col("__p.v").alias(value),
    )


def key_skew_profile(df: DataFrame, key: str) -> DataFrame:
    """Join/agg-key skew diagnostic — the "should I salt / can I
    broadcast / will AQE need to split this" pre-flight at 100 TB:
    one row of (n_rows, n_keys, top1_share, top10_share, entropy_bits,
    entropy_norm) for the distribution of ``key``.

    entropy_bits is the Shannon entropy of the key distribution
    (H = log2 N - sum(c*log2 c)/N, the same algebraic identity as
    textstats.word_entropy); entropy_norm divides by log2(n_keys) —
    1.0 means perfectly uniform, ->0 means one whale owns the table.
    top1/top10 share are the mass of the heaviest keys (ties broken by
    key value for determinism).

    Scale shape: ONE partial+final aggregation over the input (the
    groupBy(key) count), then all statistics — including the top-10
    rank — computed over the O(distinct keys) aggregated relation; the
    global window never sees raw rows (same bound as top_values).
    """
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key).alias("__k")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    w = Window.orderBy(F.desc("__c"), F.col("__k"))
    ranked = counts.withColumn("__r", F.row_number().over(w))
    return ranked.agg(
        F.sum("__c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        (F.max(F.when(F.col("__r") == 1, F.col("__c"))) / F.sum("__c")).alias(
            "top1_share"
        ),
        (
            F.sum(F.when(F.col("__r") <= 10, F.col("__c")).otherwise(F.lit(0)))
            / F.sum("__c")
        ).alias("top10_share"),
        (
            F.log2(F.sum("__c"))
            - F.sum(F.col("__c") * F.log2("__c")) / F.sum("__c")
        ).alias("entropy_bits"),
        F.when(
            F.count(F.lit(1)) > 1,
            (
                F.log2(F.sum("__c"))
                - F.sum(F.col("__c") * F.log2("__c")) / F.sum("__c")
            )
            / F.log2(F.count(F.lit(1))),
        )
        .otherwise(F.lit(0.0))
        .alias("entropy_norm"),
    )


def winsorized_stats(
    df: DataFrame,
    value_col: str,
    group_by: str,
    lower: float = 0.05,
    upper: float = 0.95,
) -> DataFrame:
    """Robust per-group moments: clamp the value to its group's exact
    [p_lower, p_upper] quantiles, then mean/stddev of the clamped
    series. Plain mean/stddev have breakdown point 0 — one corrupted
    ingest value (a 1e308 sentinel, a sign flip) drags the screen's
    threshold arbitrarily; winsorizing bounds any single row's
    influence, the same motivation as the median/MAD volume screen
    (operators/anomaly.py) but for value-level checks where a trimmed
    MEAN is the contract.

    Two passes by construction (exact quantiles need a full pass before
    clamping): pass 1 is one groupBy(group) percentile agg — the
    resulting per-group bounds relation is O(groups) and broadcast back
    onto the rows — pass 2 one partial+final agg of the clamped value.
    At 100 TB swap pass 1 to approx_percentile for a single-digit-%
    error at a fraction of the sort cost; the contract query pins the
    exact path against quantile_cont.

    Output per group: n, n_low / n_high (rows clamped at each edge),
    lo / hi (the bounds), w_mean / w_std (winsorized moments,
    population-std sample flavor: stddev_samp). A NULL group key forms
    its own output group (the join-back is null-safe) — NULL-keyed rows
    are screened, not silently dropped.
    """
    v = F.col(value_col)
    bounds = df.filter(v.isNotNull()).groupBy(group_by).agg(
        F.percentile(value_col, F.lit(float(lower))).alias("lo"),
        F.percentile(value_col, F.lit(float(upper))).alias("hi"),
    )
    j = df.filter(v.isNotNull()).join(
        F.broadcast(bounds.withColumnRenamed(group_by, "__grp")),
        F.col(group_by).eqNullSafe(F.col("__grp")),
    ).drop("__grp")
    clamped = F.least(F.greatest(v, F.col("lo")), F.col("hi"))
    return (
        j.groupBy(group_by)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((v < F.col("lo")).cast("long")).alias("n_low"),
            F.sum((v > F.col("hi")).cast("long")).alias("n_high"),
            F.first("lo").alias("lo"),
            F.first("hi").alias("hi"),
            F.avg(clamped).alias("w_mean"),
            F.stddev_samp(clamped).alias("w_std"),
        )
    )


def correlation_matrix(
    df: DataFrame, cols: list[str], group_by: str | None = None
) -> DataFrame:
    """Pairwise Pearson correlation of numeric columns, optionally per
    partition — the cross-COLUMN drift screen: per-column stats stay
    flat when an upstream join bug decouples columns that always moved
    together (price vs quantity, value vs payload size); the
    correlation structure is what breaks.

    ONE partial+final aggregation pass computes all C(n,2) pairs —
    corr is algebraic (sums of x, y, xy, x^2, y^2), so Catalyst's
    map-side combine makes this skew-immune like the other stat aggs;
    no column pair ever leaves the reducer as raw rows. Output one row
    per group: n plus corr__<a>__<b> for each pair (NULL when either
    side is constant)."""
    # NOT F.corr: under ANSI mode (Spark 4 default) a constant column
    # makes corr's internal divide-by-zero ABORT the job — and a screen
    # that dies on exactly the broken-column condition it exists to
    # catch is useless. Algebraic sums + CASE-guarded division return
    # NULL for degenerate pairs instead; pairwise-NULL semantics match
    # SQL corr (a row counts for a pair iff both sides are non-null).
    aggs = [F.count(F.lit(1)).alias("n")]
    finals = [F.col("n")]
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            both = F.col(a).isNotNull() & F.col(b).isNotNull()
            x = F.when(both, F.col(a).cast("double"))
            y = F.when(both, F.col(b).cast("double"))
            p = f"__{a}__{b}"
            aggs += [
                F.count(x).cast("double").alias(f"n{p}"),
                F.sum(x).alias(f"sx{p}"),
                F.sum(y).alias(f"sy{p}"),
                F.sum(x * y).alias(f"sxy{p}"),
                F.sum(x * x).alias(f"sxx{p}"),
                F.sum(y * y).alias(f"syy{p}"),
            ]
            np_, sx, sy = F.col(f"n{p}"), F.col(f"sx{p}"), F.col(f"sy{p}")
            cov = np_ * F.col(f"sxy{p}") - sx * sy
            vx = np_ * F.col(f"sxx{p}") - sx * sx
            vy = np_ * F.col(f"syy{p}") - sy * sy
            finals.append(
                F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy)).alias(
                    f"corr__{a}__{b}"
                )
            )
    grouped = df.groupBy(group_by) if group_by else df.groupBy()
    agged = grouped.agg(*aggs)
    keys = [group_by] if group_by else []
    return agged.select(*keys, *finals)


def equi_depth_histogram(df: DataFrame, value_col: str, k: int = 10) -> DataFrame:
    """Equi-DEPTH histogram: k buckets holding ~n/k rows each, bounded
    by exact quantiles — the histogram query optimizers keep, and the
    right shape for skewed values where equi-WIDTH buckets put 99% of
    rows in one bar. Two passes by necessity (boundaries before
    bucketing, like winsorized_stats): pass 1 one agg computing ALL
    k-1 exact percentiles in a single `percentile(col, array(...))`
    (one sort, not k-1), result broadcast as a 1-row bounds relation;
    pass 2 buckets each row with an O(k) fold over the bounds array —
    no join, no per-row search structure — and aggregates count/min/
    max per bucket. Repeated values straddling a boundary land in the
    upper bucket (v >= bound), so heavy ties make depths unequal —
    that is the data's story, not an artifact. NULLs are excluded.
    At 100 TB swap pass 1 to approx_percentile.

    Output per bucket (0..k-1): n, lo, hi."""
    v = F.col(value_col)
    fracs = F.array(*[F.lit(i / k) for i in range(1, k)])
    bounds = (
        df.filter(v.isNotNull())
        .agg(F.percentile(value_col, fracs).alias("__bounds"))
    )
    j = df.filter(v.isNotNull()).crossJoin(F.broadcast(bounds))
    bucket = F.aggregate(
        "__bounds", F.lit(0), lambda acc, b: acc + (v >= b).cast("int")
    )
    return (
        j.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(v).alias("lo"),
            F.max(v).alias("hi"),
        )
        .orderBy("bucket")
    )


def heavy_hitters(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Every key with frequency STRICTLY ABOVE n/k — exact, in two
    passes, without ever shuffling the full key distribution:

    Pass 1 (candidates): per-partition Misra-Gries summaries with k
    counters via mapInPandas — O(k) state per partition, batch-vectorized
    (pandas value_counts + an order-statistic trim), never per-row
    Python. MG with k counters keeps every item of local frequency
    > n_p/(k+1); a globally heavy item (freq > n/k) is locally heavy
    (freq_p > n_p/k >= n_p/(k+1)) in at least one partition (averaging
    argument), so the union of per-partition candidates is a SUPERSET of
    the true answer — at most k * partitions keys, whatever the data.

    Pass 2 (exact recount): broadcast the candidate set, count only
    candidate rows, keep cnt * k > n. The recount makes the output a
    pure function of the DATA — partitioning affects only which extra
    candidates get recounted and discarded, never the result.

    This is the frequency screen that a plain groupBy(key) cannot give
    at 10^12 rows with ~10^9 distinct keys: the full distribution never
    exists anywhere; shuffled state is O(k * partitions). NULL keys are
    excluded (a missing key is not a hot key). Returns
    (key_col, cnt, frac) with frac = cnt/n rounded to 6 places.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    key_field = df.schema[key_col]
    spark_type = key_field.dataType.simpleString()

    def _mg(batches):
        import numpy as np
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            vc = pdf[key_col].dropna().value_counts()
            for val, c in zip(vc.index, vc.to_numpy()):
                counters[val] = counters.get(val, 0) + int(c)
            excess = len(counters) - k
            if excess > 0:
                vals = np.fromiter(counters.values(), dtype=np.int64)
                # subtract the excess-th smallest count from everyone and
                # drop the non-positive: one batched MG decrement round
                delta = np.partition(vals, excess - 1)[excess - 1]
                counters = {
                    key: c - delta for key, c in counters.items() if c > delta
                }
        yield pd.DataFrame({key_col: list(counters.keys())})

    candidates = (
        df.select(key_col)
        .mapInPandas(_mg, schema=f"`{key_col}` {spark_type}")
        .distinct()
    )
    total = df.select(F.count(key_col).alias("__n")).withColumn(
        "__one", F.lit(1)
    )
    return (
        df.join(F.broadcast(candidates), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("__one", F.lit(1))
        .join(F.broadcast(total), "__one")
        .filter(F.col("cnt") * k > F.col("__n"))
        .select(
            key_col,
            "cnt",
            F.round(F.col("cnt") / F.col("__n"), 6).alias("frac"),
        )
    )


def mergeable_quantile(
    df: DataFrame,
    value_col: str,
    part_col,
    q: float = 0.5,
    lo: float = 0.0,
    hi: float = 1.0,
    buckets: int = 64,
) -> DataFrame:
    """Checkpoint-MERGEABLE quantile: per-partition fixed-grid histogram
    partials (B additive bucket counts — the shape a resumable run
    persists per partition, mergeable by plain sum exactly like the HLL
    sketches in stats_partial_aggs), merged back up, and the q-quantile
    read off the merged histogram. approx_percentile's final estimate
    cannot re-aggregate; a fixed-grid histogram CAN, exactly — integer
    sums commute — which is what incremental stats at 10^12 rows needs.
    The estimate is the right edge of the bucket where the cumulative
    count crosses ceil(q*n): within one bucket width of the exact
    quantile by construction.

    Values outside [lo, hi) clamp into the edge buckets (same contract
    as the drift histogram's fixed grid); NULLs are excluded. Both the
    per-partition stage and the merge are partial+final aggregations;
    the crossing search runs on the O(B) exploded relation. Returns one
    row (n, est).
    """
    if not 0 < q < 1:
        raise ValueError(f"q must be in (0,1), got {q}")
    if buckets < 2 or hi <= lo:
        raise ValueError("need buckets >= 2 and hi > lo")
    width = (hi - lo) / buckets
    v = F.col(value_col).cast("double")
    bkt = F.least(
        F.lit(buckets - 1),
        F.greatest(F.lit(0), F.floor((v - lo) / F.lit(width)).cast("int")),
    )
    part = F.col(part_col) if isinstance(part_col, str) else part_col
    partials = (
        df.filter(v.isNotNull())
        .groupBy(part.alias("__part"))
        .agg(
            *[
                F.sum((bkt == i).cast("long")).alias(f"__b{i}")
                for i in range(buckets)
            ]
        )
    )
    merged = partials.groupBy().agg(
        *[F.sum(f"__b{i}").alias(f"__b{i}") for i in range(buckets)]
    )
    arr = merged.select(
        F.array(*[F.col(f"__b{i}") for i in range(buckets)]).alias("__h")
    )
    n = F.aggregate("__h", F.lit(0).cast("long"), lambda a, x: a + x)
    hist = arr.select("__h", n.alias("n"))
    from pyspark.sql import Window  # local import, same idiom as length_histogram

    exploded = hist.select(
        "n", F.posexplode("__h").alias("idx", "cnt")
    ).withColumn(
        "cum",
        F.sum("cnt").over(
            Window.orderBy("idx").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    crossing = (
        exploded.filter(F.col("cum") >= F.ceil(F.lit(q) * F.col("n")))
        .groupBy("n")
        .agg(F.min("idx").alias("idx"))
    )
    return crossing.select(
        "n",
        F.round(F.lit(lo) + (F.col("idx") + 1) * F.lit(width), 6).alias("est"),
    )


def cube_profile(df, dims: list[str], measure: str):
    """Multi-dimensional OLAP rollup: one CUBE aggregation produces
    every dimension subset's (count, sum) in a single shuffle — the
    2^d GROUPING SETS share one exchange via Catalyst's Expand, so at
    100 TB this costs one pass, not 2^d scans. `gid` is Spark's
    grouping_id bitmask (1 bit = dimension rolled up), the same
    encoding DuckDB's GROUPING() emits, which makes the oracle a
    literal GROUP BY CUBE. Rolled-up cells carry NULL in their
    dimension columns (standard SQL semantics)."""
    return (
        df.cube(*dims)
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(measure), 2).alias("total"),
        )
        .orderBy("gid", *dims)
    )


def gini(df: DataFrame, value_col: str, group: str | None = None) -> DataFrame:
    """Per-group Gini coefficient of a non-negative ``value_col`` —
    the concentration screen behind "is 1% of users generating 90% of
    the events" (activity skew, token-budget concentration, vendor
    imbalance).

    Exact sorted-rank form G = (2 * sum(i * x_(i)) - (n+1) * sum(x))
    / (n * sum(x)), which is tie-invariant (equal values commute under
    any rank assignment). The corpus reduces to the O(groups x
    distinct-values) block relation by ONE aggregation; the rank
    cumsum window runs over that reduced relation only (the AUC
    pattern — raw rows never enter a window). For a block of m copies
    of value v starting after rank r0: sum i*x = v * (m*r0 +
    m*(m+1)/2). NULL values are excluded; negative values raise (Gini
    is undefined below 0); an all-zero group yields NULL via
    try_divide. Returns (group?, n, total, gini) with gini rounded 6.
    """
    from pyspark.sql import Window

    gcols = [group] if group else []
    vals = df.filter(F.col(value_col).isNotNull()).select(
        *gcols, F.col(value_col).cast("double").alias("__x")
    )
    blocks = vals.groupBy(*gcols, "__x").agg(F.count(F.lit(1)).alias("__m"))
    w = (
        Window.partitionBy(*gcols).orderBy("__x")
        if gcols
        else Window.partitionBy(F.lit(1)).orderBy("__x")
    )
    ranked = blocks.withColumn(
        "__r0",
        F.coalesce(
            F.sum("__m").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
        ),
    )
    agg = ranked.groupBy(*gcols).agg(
        F.sum("__m").alias("n"),
        F.sum(F.col("__x") * F.col("__m")).alias("total"),
        F.sum(
            F.col("__x")
            * (
                F.col("__m") * F.col("__r0")
                + F.col("__m") * (F.col("__m") + 1) / 2.0
            )
        ).alias("__ix"),
        F.min("__x").alias("__minx"),
    )
    g = F.try_divide(
        2.0 * F.col("__ix") - (F.col("n") + 1) * F.col("total"),
        F.col("n") * F.col("total"),
    )
    # lazy in-plan guard: assert_true yields NULL when the contract
    # holds and aborts the job when it doesn't — no eager second pass
    guard = F.assert_true(
        F.col("__minx") >= 0, F.lit("gini is undefined for negative values")
    ).cast("double")
    return agg.select(
        *gcols,
        "n",
        F.round("total", 6).alias("total"),
        (F.round(g, 6) + F.coalesce(guard, F.lit(0.0))).alias("gini"),
    )


def linear_trend(
    df: DataFrame, x_col: str, y_col: str, group: str | None = None
) -> DataFrame:
    """Per-group OLS line y = a + b*x with r^2 — the trend screen over
    per-day volumes ("is this source's document count drifting down").

    Closed-form from ONE aggregation of the five power sums (n, Sx,
    Sy, Sxx, Sxy, Syy); no window, no second pass. Rows with NULL x or
    y are excluded. A group with zero x-variance (one distinct x)
    yields NULL slope/intercept/r2 via try_divide — a vertical-line
    fit is not a trend. r2 = cov^2 / (varx * vary), NULL when y is
    constant too (0/0, not 1: a flat series explains nothing).
    Returns (group?, n, slope, intercept, r2), rounded to 6.
    """
    gcols = [group] if group else []
    xy = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull()).select(
        *gcols,
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
    )
    agg = xy.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
    )
    n = F.col("n").cast("double")
    cov = F.col("__sxy") - F.col("__sx") * F.col("__sy") / n
    varx = F.col("__sxx") - F.col("__sx") * F.col("__sx") / n
    vary = F.col("__syy") - F.col("__sy") * F.col("__sy") / n
    slope = F.try_divide(cov, F.when(varx > 0, varx))
    intercept = (F.col("__sy") - slope * F.col("__sx")) / n
    r2 = F.try_divide(cov * cov, F.when(varx * vary > 0, varx * vary))
    return agg.select(
        *gcols,
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


def mutual_information(df: DataFrame, a: str, b: str) -> DataFrame:
    """Mutual information (nats) between two categorical columns, plus
    the entropies and sqrt-normalized NMI — the dependence screen
    behind split-leakage and label-bias audits ("is my train/test
    split independent of the label / language / source?"): MI 0 iff
    the columns are independent, NMI ~1 at determinism.

    Scale shape: ONE (a, b) aggregation reduces the table to the
    O(|A| x |B|) joint relation — the only full-data shuffle; the
    marginals are windows over that tiny relation (the gini/AUC
    pattern: raw rows never enter a window) and everything collapses
    to a single global sum. NULL categories are real categories
    (groupBy keeps them). Returns one row: (n, mi, h_a, h_b, nmi),
    floats in nats rounded to 6; NMI is NULL when either entropy is 0
    (a constant column carries no information to normalize by).
    """
    from pyspark.sql import Window

    joint = df.groupBy(F.col(a).alias("__a"), F.col(b).alias("__b")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    wa = Window.partitionBy("__a")
    wb = Window.partitionBy("__b")
    wall = Window.partitionBy(F.lit(1))
    e = joint.select(
        "__c",
        F.sum("__c").over(wa).alias("__ca"),
        F.sum("__c").over(wb).alias("__cb"),
        F.sum("__c").over(wall).alias("__n"),
    )
    # every term is a ratio of integer counts: p log p terms replay
    # exactly in any engine
    p = F.col("__c") / F.col("__n")
    mi_term = p * F.log(
        (F.col("__c") * F.col("__n")) / (F.col("__ca") * F.col("__cb"))
    )
    # H(a): sum over joint cells of p * ln(n/ca) counts each a-row
    # cell-wise — identical to the marginal-sum form
    ha_term = p * F.log(F.col("__n") / F.col("__ca"))
    hb_term = p * F.log(F.col("__n") / F.col("__cb"))
    agg = e.agg(
        F.max("__n").alias("n"),
        F.sum(mi_term).alias("mi"),
        F.sum(ha_term).alias("h_a"),
        F.sum(hb_term).alias("h_b"),
    )
    return agg.select(
        "n",
        F.round("mi", 6).alias("mi"),
        F.round("h_a", 6).alias("h_a"),
        F.round("h_b", 6).alias("h_b"),
        F.round(
            F.when(
                (F.col("h_a") > 0) & (F.col("h_b") > 0),
                F.col("mi") / F.sqrt(F.col("h_a") * F.col("h_b")),
            ),
            6,
        ).alias("nmi"),
    )


def chi_squared(df: DataFrame, a: str, b: str) -> DataFrame:
    """Chi-squared test of independence + Cramér's V between two
    categorical columns — the classical sibling of
    ``mutual_information`` (reference scope: enum/dependency keyword
    semantics lifted to a table-level dependence screen; cf.
    /root/reference/src/keywords/type_.rs for the per-row contract this
    generalizes).

    ONE joint ``groupBy(a, b)`` aggregation over the data; everything
    after runs on the tiny joint relation. Zero-observed cells still
    contribute (0-E)^2/E = E, so the cell grid is densified by
    cross-joining the two marginal relations (bounded: r x c category
    pairs, both marginals are tiny) and left-joining observed counts.
    NULL categories are real levels (null-safe join keys). Returns one
    row: n, r, c, dof, chi2, cramers_v. Every expected count is a ratio
    of integer counts — exact replay in any engine.
    """
    from pyspark.sql import Window

    joint = df.groupBy(
        F.col(a).cast("string").alias("__a"), F.col(b).cast("string").alias("__b")
    ).agg(F.count(F.lit(1)).alias("__c"))
    # marginal keys are renamed so the grid-vs-joint join is not an
    # ambiguous self-join (all three relations share joint's lineage)
    ma = joint.groupBy(F.col("__a").alias("__ga")).agg(F.sum("__c").alias("__ca"))
    mb = joint.groupBy(F.col("__b").alias("__gb")).agg(F.sum("__c").alias("__cb"))
    grid = ma.crossJoin(mb)  # bounded: r*c cells, both sides tiny
    cells = grid.join(
        joint,
        F.col("__ga").eqNullSafe(F.col("__a")) & F.col("__gb").eqNullSafe(F.col("__b")),
        "left",
    ).select(
        F.col("__ga").alias("__a"),
        F.col("__gb").alias("__b"),
        "__ca",
        "__cb",
        F.coalesce("__c", F.lit(0)).alias("__c"),
    )
    w = Window.partitionBy()
    cells = cells.withColumn("__n", F.sum("__c").over(w))
    e = F.col("__ca") * F.col("__cb") / F.col("__n")
    term = F.pow(F.col("__c") - e, F.lit(2.0)) / e
    agg = cells.agg(
        F.max("__n").alias("n"),
        # struct-wrapped so a NULL category counts as a real level
        F.count_distinct(F.struct("__a")).alias("r"),
        F.count_distinct(F.struct("__b")).alias("c"),
        F.sum(term).alias("__chi2"),
    )
    min_dof = F.least(F.col("r") - 1, F.col("c") - 1)
    return agg.select(
        "n",
        "r",
        "c",
        ((F.col("r") - 1) * (F.col("c") - 1)).alias("dof"),
        F.round("__chi2", 6).alias("chi2"),
        F.round(
            # NULL when either dimension is a single level (dof 0):
            # independence is vacuous there, not "infinitely associated"
            F.when(min_dof > 0, F.sqrt(F.col("__chi2") / (F.col("n") * min_dof))),
            6,
        ).alias("cramers_v"),
    )


def spearman_rho(df: DataFrame, x: str, y: str) -> DataFrame:
    """Spearman rank correlation (tie-corrected): Pearson correlation of
    average ranks. Ranks come from the per-distinct-value reduced
    relation — cumulative counts over distinct values give each value's
    average rank (ties share the mean of their rank block), and the
    mapping joins back to rows by value. The single-partition sort is
    over DISTINCT values only; the join-back is shuffle-parallel, so
    high-cardinality columns cost a fine-grained equi-join rather than a
    global row sort. Rows with NULL in either column are excluded
    (standard pairwise deletion). Returns one row: n, rho.
    """
    from pyspark.sql import Window

    d = (
        df.select(F.col(x).cast("double").alias("__x"), F.col(y).cast("double").alias("__y"))
        .filter(F.col("__x").isNotNull() & F.col("__y").isNotNull())
    )

    def rank_map(col: str) -> DataFrame:
        vc = d.groupBy(col).agg(F.count(F.lit(1)).alias("__cnt"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
        return vc.select(
            col,
            (F.sum("__cnt").over(w) - F.col("__cnt") + (F.col("__cnt") + 1) / 2).alias(
                f"__r{col}"
            ),
        )

    ranked = d.join(rank_map("__x"), "__x").join(rank_map("__y"), "__y")
    return ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.corr(f"__r__x", f"__r__y"), 6).alias("rho"),
    )


def anova_f(df: DataFrame, value_col: str, group_col: str) -> DataFrame:
    """One-way ANOVA F statistic across the groups of ``group_col`` —
    the k-sample mean-shift screen (the parametric complement of the
    KS/PSI drift pair). ONE aggregation pass collects per-group
    (n, sum, sumsq); between/within sums of squares are exact integer-
    weighted arithmetic on the k-row relation. NULL values are excluded;
    a NULL group key is a real group. Returns one row:
    k, n, ss_between, ss_within, df1, df2, f_stat.
    """
    v = F.col(value_col).cast("double")
    g = df.filter(v.isNotNull()).groupBy(group_col).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(v).alias("__s"),
        F.sum(v * v).alias("__ss"),
    )
    tot = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("__n").alias("n"),
        F.sum("__s").alias("__gs"),
        # SS_within = sum_g (ss_g - s_g^2/n_g)
        F.sum(F.col("__ss") - F.col("__s") * F.col("__s") / F.col("__n")).alias("__ssw"),
        # sum_g s_g^2/n_g, for SS_between = that - gs^2/n
        F.sum(F.col("__s") * F.col("__s") / F.col("__n")).alias("__sb"),
    )
    ssb = F.col("__sb") - F.col("__gs") * F.col("__gs") / F.col("n")
    df1 = F.col("k") - 1
    df2 = F.col("n") - F.col("k")
    return tot.select(
        "k",
        "n",
        F.round(ssb, 6).alias("ss_between"),
        F.round("__ssw", 6).alias("ss_within"),
        df1.alias("df1"),
        df2.alias("df2"),
        F.round((ssb / df1) / (F.col("__ssw") / df2), 6).alias("f_stat"),
    )


def pass_rate_wilson(
    df: DataFrame,
    ok: Column,
    partition_col: str,
    sla: float = 0.95,
    z: float = 1.959964,
) -> DataFrame:
    """Per-partition validation pass-rate with a Wilson score interval
    and an uncertainty-aware SLA verdict — the decision layer the raw
    rate can't give: a 3-row partition at 2/3 and a 3M-row partition at
    0.6667 have the same point rate but opposite evidence. Wilson (not
    Wald) stays inside [0,1] and behaves at rate 0/1 and tiny n.

    verdict per partition: 'breach' when the UPPER bound is below the
    SLA (confidently failing), 'met' when the LOWER bound clears it
    (confidently passing), else 'at_risk' (the CI straddles the line —
    collect more rows before paging anyone). One aggregation, map-side
    combinable; O(partitions) output. Returns (part, n, passed, rate,
    wilson_lo, wilson_hi, verdict), floats rounded to 6."""
    agg = df.groupBy(F.col(partition_col).alias("part")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(ok.cast("int")).alias("passed"),
    )
    return pass_rate_wilson_from_counts(agg, sla=sla, z=z)


def pass_rate_wilson_from_counts(
    counts_df: DataFrame,
    sla: float = 0.95,
    z: float = 1.959964,
) -> DataFrame:
    """The Wilson/SLA verdict over an ALREADY-aggregated
    (part, n, passed) relation — the mergeable entry point (same split
    as volume_anomaly_from_counts): (n, passed) partials are plain
    integer sums, so a streaming sink or per-shard checkpoint can
    maintain them additively and THIS recomputes the verdict at any
    point. Sums the relation per part first, so feeding raw partials
    (several rows per part) is valid. Same output contract as
    pass_rate_wilson."""
    agg = counts_df.groupBy("part").agg(
        F.sum("n").alias("n"), F.sum("passed").alias("passed")
    )
    n = F.col("n").cast("double")
    p = F.col("passed") / n
    z2 = z * z
    denom = 1.0 + z2 / n
    center = p + z2 / (2 * n)
    half = z * F.sqrt((p * (1 - p) + z2 / (4 * n)) / n)
    lo = (center - half) / denom
    hi = (center + half) / denom
    return agg.select(
        "part",
        "n",
        "passed",
        F.round(p, 6).alias("rate"),
        F.round(lo, 6).alias("wilson_lo"),
        F.round(hi, 6).alias("wilson_hi"),
        F.when(hi < sla, F.lit("breach"))
        .when(lo >= sla, F.lit("met"))
        .otherwise(F.lit("at_risk"))
        .alias("verdict"),
    )


def kruskal_wallis(df: DataFrame, value_col: str, group_col: str) -> DataFrame:
    """Kruskal-Wallis H across the groups of ``group_col`` — the
    k-sample nonparametric location screen: the rank-based sibling of
    anova_f (which assumes normal-ish residuals) and the k-group
    generalization of the Mann-Whitney pair test. Flags "at least one
    partition's value distribution sits elsewhere" without any
    distributional assumption.

    Rank arithmetic never touches raw rows: one groupBy(value, group)
    reduces to the O(distinct-values x groups) block relation, midranks
    come from a cumulative window over DISTINCT values only, and the
    per-group rank sums / tie terms are exact sums over that tiny
    relation (same contract as spearman_rho / mann_whitney_u; for
    continuous columns at extreme cardinality pre-bucket first and the
    midrank arithmetic stays exact on buckets). NULL values are
    excluded; a NULL group key is a real group.

    H = 12/(N(N+1)) * sum_g R_g^2/n_g - 3(N+1); tie correction
    C = 1 - sum(t^3-t)/(N^3-N); h_corrected = H/C (NULL when every
    row ties on one value, where the statistic is undefined). Returns
    one row: k, n, dof, h_stat, h_corrected.
    """
    from pyspark.sql import Window

    v = F.col(value_col).cast("double")
    d = df.filter(v.isNotNull()).select(
        v.alias("__v"), F.col(group_col).alias("__g")
    )
    vg = d.groupBy("__v", "__g").agg(F.count(F.lit(1)).alias("__tg"))
    vc = vg.groupBy("__v").agg(F.sum("__tg").alias("__t"))
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    vc = vc.withColumn(
        "__rank", F.sum("__t").over(w) - F.col("__t") + (F.col("__t") + 1) / 2
    )
    blocks = vg.join(vc, "__v")
    per_group = blocks.groupBy("__g").agg(
        F.sum("__tg").alias("__ng"),
        F.sum(F.col("__rank") * F.col("__tg")).alias("__rg"),
    )
    agg = per_group.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("__ng").alias("n"),
        F.sum(F.col("__rg") * F.col("__rg") / F.col("__ng")).alias("__rr"),
    )
    ties = vc.agg(
        F.sum(F.col("__t") * F.col("__t") * F.col("__t") - F.col("__t")).alias(
            "__ties"
        )
    )
    n = F.col("n").cast("double")
    h = 12.0 / (n * (n + 1)) * F.col("__rr") - 3.0 * (n + 1)
    c = 1.0 - F.col("__ties") / (n * n * n - n)
    return agg.crossJoin(ties).select(
        "k",
        "n",
        (F.col("k") - 1).alias("dof"),
        F.round(h, 6).alias("h_stat"),
        F.round(F.when(c > 0, h / c), 6).alias("h_corrected"),
    )


def bh_fdr(
    df: DataFrame,
    p_col: str,
    test_cols: list[str],
    alpha: float = 0.05,
) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control over a relation of
    hypothesis tests — the multiple-testing layer every wide screen
    needs: run KS over 365x364/2 day pairs at per-test alpha=0.05 and
    ~3,300 pairs flag by CHANCE; BH bounds the expected FALSE-discovery
    fraction among flags at alpha instead.

    q_i = min_{j >= i} (p_(j) * m / j) — the reverse running min of the
    step-up bound, clamped to 1; reject where q <= alpha. Ranking ties
    break deterministically on ``test_cols`` so q-values are stable
    across runs and partitionings.

    Scale shape: the input is a relation of TESTS, not data rows —
    O(tests) by construction (435 pairs for 30 parts, ~66k for 365) —
    so the two single-partition rank windows are bounded regardless of
    input size; the data-sized work happened upstream in whatever
    produced the p-values. Adds (rank, m, q_value, reject); p-values
    must be in [0, 1] and non-null (filter upstream).
    """
    from pyspark.sql import Window

    order = [F.col(p_col).asc()] + [F.col(c).asc() for c in test_cols]
    w_rank = Window.orderBy(*order)
    w_all = Window.partitionBy()
    w_rev = Window.orderBy(F.col("rank").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = (
        df.withColumn("rank", F.row_number().over(w_rank))
        .withColumn("m", F.count(F.lit(1)).over(w_all))
        .withColumn(
            "q_value",
            F.round(
                F.least(
                    F.min(
                        F.col(p_col) * F.col("m") / F.col("rank")
                    ).over(w_rev),
                    F.lit(1.0),
                ),
                6,
            ),
        )
    )
    return ranked.withColumn("reject", F.col("q_value") <= alpha)


def cochran_armitage(
    df: DataFrame,
    ok: Column,
    partition_col: str,
    z_crit: float = 2.576,
) -> DataFrame:
    """Cochran-Armitage trend test on a per-partition pass rate — the
    significance layer for "is validity DEGRADING over time": a plain
    slope over daily rates ignores that a 100-row day and a 1M-row day
    carry different evidence, and per-day Wilson verdicts can't say
    whether the drift is systematic. CA scores the ordered partitions
    0..k-1 and tests a linear trend in the PROPORTION, weighting each
    day by its size.

    T = sum_i s_i * (r_i - n_i * pbar); Var(T) = pbar * (1 - pbar) *
    (sum s_i^2 n_i - (sum s_i n_i)^2 / N); z = T / sqrt(Var). Scores
    are the dense order of ``partition_col`` (0-based), assigned on the
    O(partitions) aggregated relation. One map-side-combinable
    aggregation of the data; everything after runs on k rows. Var = 0
    (pbar 0 or 1, or a single partition) -> z NULL, never flagged.
    Returns one row: k, n, passed, t_stat, var_t, z, trend
    ('degrading' z < -z_crit / 'improving' z > z_crit / 'stable').
    """
    from pyspark.sql import Window

    agg = df.groupBy(F.col(partition_col).alias("part")).agg(
        F.count(F.lit(1)).alias("n"), F.sum(ok.cast("int")).alias("r")
    )
    scored = agg.withColumn(
        "s", F.row_number().over(Window.orderBy("part")) - 1
    )
    tot = scored.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("n"),
        F.sum("r").alias("passed"),
        F.sum(F.col("s") * F.col("n")).alias("__sn"),
        F.sum(F.col("s") * F.col("s") * F.col("n")).alias("__ssn"),
        F.sum(F.col("s") * F.col("r")).alias("__sr"),
    )
    nn = F.col("n").cast("double")
    pbar = F.col("passed") / nn
    t = F.col("__sr") - pbar * F.col("__sn")
    var_t = pbar * (1.0 - pbar) * (
        F.col("__ssn") - F.col("__sn") * F.col("__sn") / nn
    )
    z = F.when(var_t > 0, t / F.sqrt(var_t))
    return tot.select(
        "k",
        "n",
        "passed",
        F.round(t, 6).alias("t_stat"),
        F.round(var_t, 6).alias("var_t"),
        F.round(z, 6).alias("z"),
        F.when(z < -z_crit, F.lit("degrading"))
        .when(z > z_crit, F.lit("improving"))
        .otherwise(F.lit("stable"))
        .alias("trend"),
    )


def median_ci(
    df: DataFrame,
    value_col: str,
    group_col: str,
    z: float = 1.959964,
) -> DataFrame:
    """Per-group exact median with a DISTRIBUTION-FREE confidence
    interval from order statistics — the value-column sibling of
    pass_rate_wilson: the interval endpoints are the sample values at
    binomial-quantile ranks l = max(1, floor((n - z*sqrt(n))/2)) and
    u = min(n, ceil((n + z*sqrt(n))/2 + 1)) (normal approximation to
    Binomial(n, 1/2) — no distributional assumption on the VALUES, the
    randomness is in which order statistics bracket the true median).
    A mean +/- z*sd band is meaningless on the heavy-tailed columns
    this screens; this one is exact-coverage-conservative on anything.

    All order statistics come off the per-group distinct-value block
    relation: one groupBy(group, value) count, a cumulative window per
    group over DISTINCT values, and each rank resolves as
    min(value | cum >= rank) — raw rows are never sorted or windowed.
    NULL values excluded; the median averages the two central order
    statistics for even n. Returns (part, n, median, ci_lo, ci_hi).
    """
    from pyspark.sql import Window

    v = F.col(value_col).cast("double")
    d = df.filter(v.isNotNull()).select(
        F.col(group_col).alias("part"), v.alias("__v")
    )
    blocks = d.groupBy("part", "__v").agg(F.count(F.lit(1)).alias("__c"))
    w = Window.partitionBy("part").orderBy("__v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    blocks = blocks.withColumn("__cum", F.sum("__c").over(w))
    n_col = F.sum("__c").over(Window.partitionBy("part"))
    blocks = blocks.withColumn("__n", n_col)
    nn = F.col("__n").cast("double")
    l_rank = F.greatest(F.lit(1.0), F.floor((nn - z * F.sqrt(nn)) / 2.0))
    u_rank = F.least(nn, F.ceil((nn + z * F.sqrt(nn)) / 2.0 + 1.0))
    m1 = F.ceil(nn / 2.0)
    m2 = F.floor(nn / 2.0) + 1
    cum = F.col("__cum")
    return (
        blocks.groupBy("part")
        .agg(
            F.first("__n").alias("n"),
            F.min(F.when(cum >= l_rank, F.col("__v"))).alias("ci_lo"),
            F.min(F.when(cum >= m1, F.col("__v"))).alias("__m1"),
            F.min(F.when(cum >= m2, F.col("__v"))).alias("__m2"),
            F.min(F.when(cum >= u_rank, F.col("__v"))).alias("ci_hi"),
        )
        .select(
            "part",
            "n",
            F.round((F.col("__m1") + F.col("__m2")) / 2.0, 6).alias("median"),
            F.round("ci_lo", 6).alias("ci_lo"),
            F.round("ci_hi", 6).alias("ci_hi"),
        )
    )


def association_lift(
    df: DataFrame,
    col_a: str,
    col_b: str,
    min_support: float = 0.0,
) -> DataFrame:
    """Association-rule screen between two categorical columns: for
    every observed (a, b) level pair, support, confidence P(b|a) and
    lift P(a,b)/(P(a)P(b)) — the per-CELL drill-down of chi_squared
    (which says "the columns are dependent" in one number but not
    WHICH combinations drive it). lift > 1 over-represented, < 1
    under-represented; a pipeline regression that only corrupts
    (source=X, lang=Y) shows up here while the marginals stay flat.

    One joint aggregation; marginals come from windows OVER the
    O(levels_a x levels_b) joint relation, never a second scan. NULL
    is a real level in both columns (matching chi_squared — the
    "missingness co-occurs with a category" signal is usually the
    interesting one). ``min_support`` prunes rare cells AFTER the
    exact arithmetic. Returns (a, b, n_ab, n_a, n_b, support,
    confidence, lift), floats rounded to 6.
    """
    from pyspark.sql import Window

    joint = df.groupBy(
        F.col(col_a).alias("a"), F.col(col_b).alias("b")
    ).agg(F.count(F.lit(1)).alias("n_ab"))
    wa = Window.partitionBy("a")
    wb = Window.partitionBy("b")
    wn = Window.partitionBy()
    joint = (
        joint.withColumn("n_a", F.sum("n_ab").over(wa))
        .withColumn("n_b", F.sum("n_ab").over(wb))
        .withColumn("__n", F.sum("n_ab").over(wn))
    )
    nn = F.col("__n").cast("double")
    support = F.col("n_ab") / nn
    return (
        joint.filter(support >= min_support)
        .select(
            "a",
            "b",
            "n_ab",
            "n_a",
            "n_b",
            F.round(support, 6).alias("support"),
            F.round(F.col("n_ab") / F.col("n_a"), 6).alias("confidence"),
            F.round(
                nn * F.col("n_ab") / (F.col("n_a") * F.col("n_b")), 6
            ).alias("lift"),
        )
    )


def weighted_quantile(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    group_col: str,
    qs: tuple = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Exact WEIGHTED quantiles per group — the question "what's the
    median document length" is usually wrong at training time; the
    right one is "the median TOKEN sits in how long a document", i.e.
    the length distribution weighted by tokens (or price weighted by
    quantity): every unweighted percentile operator here answers
    per-ROW, this answers per-UNIT-OF-WEIGHT.

    The q-quantile is the smallest value whose cumulative weight
    reaches q * total_weight (left-continuous inverse CDF — exact, no
    interpolation, so equal inputs give equal outputs on any engine).
    All arithmetic on the per-group distinct-value block relation:
    weights sum per (group, value) first, one cumulative window over
    distinct values, each q resolves as min(value | cumw >= q*W).
    NULL values and NULL/non-positive weights are excluded. Returns
    one row per group: (part, total_weight, q_<q> ...), quantile
    columns named q_25 / q_50 / q_75 style.
    """
    from pyspark.sql import Window

    v = F.col(value_col).cast("double")
    wt = F.col(weight_col).cast("double")
    d = df.filter(v.isNotNull() & wt.isNotNull() & (wt > 0)).select(
        F.col(group_col).alias("part"), v.alias("__v"), wt.alias("__w")
    )
    blocks = d.groupBy("part", "__v").agg(F.sum("__w").alias("__bw"))
    w = Window.partitionBy("part").orderBy("__v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    blocks = blocks.withColumn("__cum", F.sum("__bw").over(w)).withColumn(
        "__tw", F.sum("__bw").over(Window.partitionBy("part"))
    )
    aggs = [F.round(F.first("__tw"), 6).alias("total_weight")]
    for q in qs:
        name = f"q_{str(q).replace('0.', '').ljust(2, '0')}"
        aggs.append(
            F.min(
                F.when(F.col("__cum") >= q * F.col("__tw"), F.col("__v"))
            ).alias(name)
        )
    return blocks.groupBy("part").agg(*aggs)


def species_richness(
    df: DataFrame,
    key_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Chao1 species-richness estimate + Good-Turing coverage per
    group: from the frequency-of-frequencies of an observed key column,
    estimate how many distinct keys the POPULATION has (including
    never-seen ones) and what probability mass the unseen keys carry —
    the question behind "have we crawled enough", "is the vocabulary
    saturating", "how many users exist, not how many we counted" that
    HLL (which counts only the OBSERVED) cannot answer.

    Chao1 = d_obs + f1^2 / (2*f2), with the bias-corrected
    f1*(f1-1)/2 form when no doubletons exist (f2 = 0); Good-Turing
    unseen mass p0 = f1/n, coverage = 1 - p0. Singletons are the
    signal: a corpus whose keys are all singletons (f1 = d_obs) is
    nowhere near saturated. Two aggregations, both map-side
    combinable: keys -> counts, counts -> frequency-of-frequencies;
    output is O(groups). NULL keys excluded. Returns
    (part?, n, d_obs, f1, f2, chao1, coverage), floats rounded to 6.
    """
    gcols = ["part"] if group_col else []
    sel = ([F.col(group_col).alias("part")] if group_col else []) + [
        F.col(key_col).alias("__k")
    ]
    d = df.filter(F.col(key_col).isNotNull()).select(*sel)
    counts = d.groupBy(*gcols, "__k").agg(F.count(F.lit(1)).alias("__c"))
    agg = counts.groupBy(*gcols).agg(
        F.sum("__c").alias("n"),
        F.count(F.lit(1)).alias("d_obs"),
        F.sum((F.col("__c") == 1).cast("long")).alias("f1"),
        F.sum((F.col("__c") == 2).cast("long")).alias("f2"),
    )
    f1 = F.col("f1").cast("double")
    f2 = F.col("f2").cast("double")
    chao1 = F.col("d_obs") + F.when(f2 > 0, f1 * f1 / (2.0 * f2)).otherwise(
        f1 * (f1 - 1.0) / 2.0
    )
    coverage = 1.0 - f1 / F.col("n").cast("double")
    return agg.select(
        *gcols,
        "n",
        "d_obs",
        "f1",
        "f2",
        F.round(chao1, 6).alias("chao1"),
        F.round(coverage, 6).alias("coverage"),
    )


def simpsons_check(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_col: str,
) -> DataFrame:
    """Simpson's-paradox screen: does the pooled x-y trend REVERSE
    inside every stratum? The aggregation trap behind bad pipeline
    decisions ("longer documents score higher" overall, yet within
    every source the opposite holds because sources differ in both) —
    a correlation read off pooled data without this check can be
    exactly backwards.

    One aggregation computes the per-group five power sums; the pooled
    sums are THEIR sums (no second scan), both slopes close in the OLS
    form. Groups with undefined slope (zero x-variance) are reported
    but take no side. paradox = pooled slope nonzero AND every
    defined-slope group disagrees with its sign; sign_mixed flags the
    weaker "some strata disagree". Rows with NULL x or y are excluded.
    Returns one row: (pooled_slope, n_groups, n_defined, n_agree,
    n_disagree, paradox, sign_mixed), slope rounded to 6.
    """
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    d = df.filter(x.isNotNull() & y.isNotNull()).select(
        F.col(group_col).alias("g"), x.alias("__x"), y.alias("__y")
    )
    per = d.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__x").alias("sx"),
        F.sum("__y").alias("sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("sxx"),
        F.sum(F.col("__x") * F.col("__y")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    gvarx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    gslope = F.when(
        gvarx > 0, (F.col("sxy") - F.col("sx") * F.col("sy") / n) / gvarx
    )
    scored = per.withColumn("__slope", gslope)
    tot = scored.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("n").alias("N"),
        F.sum("sx").alias("SX"),
        F.sum("sy").alias("SY"),
        F.sum("sxx").alias("SXX"),
        F.sum("sxy").alias("SXY"),
        F.sum(F.col("__slope").isNotNull().cast("long")).alias("n_defined"),
        F.sum((F.col("__slope") > 0).cast("long")).alias("__n_pos"),
        F.sum((F.col("__slope") < 0).cast("long")).alias("__n_neg"),
    )
    NN = F.col("N").cast("double")
    pvarx = F.col("SXX") - F.col("SX") * F.col("SX") / NN
    pooled = F.when(
        pvarx > 0, (F.col("SXY") - F.col("SX") * F.col("SY") / NN) / pvarx
    )
    agree = F.when(pooled > 0, F.col("__n_pos")).when(
        pooled < 0, F.col("__n_neg")
    )
    disagree = F.when(pooled > 0, F.col("__n_neg")).when(
        pooled < 0, F.col("__n_pos")
    )
    return tot.select(
        F.round(pooled, 6).alias("pooled_slope"),
        "n_groups",
        "n_defined",
        F.coalesce(agree, F.lit(0)).alias("n_agree"),
        F.coalesce(disagree, F.lit(0)).alias("n_disagree"),
        F.coalesce(
            pooled.isNotNull()
            & (F.col("n_defined") > 0)
            & (disagree == F.col("n_defined")),
            F.lit(False),
        ).alias("paradox"),
        F.coalesce(disagree > 0, F.lit(False)).alias("sign_mixed"),
    )


def count_min_sketch(
    df: DataFrame, key: str, width: int = 256, depth: int = 3
) -> DataFrame:
    """Build a Count-Min sketch (Cormode & Muthukrishnan 2005) over an
    integer key column as the O(depth x width) counter relation
    (d, bucket, n) — the mergeable frequency summary for key spaces too
    large to count exactly (two sketches over disjoint data merge by
    plain integer sum on (d, bucket), the same additivity contract as
    mergeable_quantile's histogram partials).

    Row hashes use the package's engine-portable mixer (sampling.
    mix_key) salted per depth row with key + d * 1_000_003, so a SQL
    oracle replays every bucket assignment verbatim — no engine hash.
    One explode to depth rows per input row, ONE groupBy (d, bucket):
    map-side combinable, output size independent of input rows. NULL
    keys are excluded (count them separately if they matter).
    """
    from jsonschema_validator_spark.operators.sampling import mix_key

    if width < 2 or depth < 1:
        raise ValueError("width >= 2 and depth >= 1 required")
    k = F.col(key).cast("long")
    rows = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(mix_key(k + d * 1_000_003), F.lit(width)).alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    return (
        df.filter(k.isNotNull())
        .select(F.explode(rows).alias("r"))
        .groupBy(F.col("r.d").alias("d"), F.col("r.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_estimate(
    counters: DataFrame,
    probes: DataFrame,
    key: str,
    width: int = 256,
    depth: int = 3,
) -> DataFrame:
    """Point-frequency estimates from a count_min_sketch counter
    relation: est(key) = min over d of counter[d][h_d(key)] — an
    OVERestimate by construction (collisions only add), within
    2n/width of truth with probability 1 - (1/2)^depth. The probe
    relation fans out to depth rows and equi-joins the O(depth x
    width) counter relation (broadcastable); no raw-data access.
    Returns probes + (cms_count,). Probe keys absent from the sketch
    estimate as the collision floor of their buckets (0 only if all
    their buckets are empty).
    """
    from jsonschema_validator_spark.operators.sampling import mix_key

    k = F.col(key).cast("long")
    rows = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(mix_key(k + d * 1_000_003), F.lit(width)).alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    fan = probes.select(F.col(key), F.explode(rows).alias("r")).select(
        key, F.col("r.d").alias("d"), F.col("r.bucket").alias("bucket")
    )
    j = fan.join(F.broadcast(counters), ["d", "bucket"], "left").select(
        key, F.coalesce(F.col("n"), F.lit(0)).alias("n")
    )
    return j.groupBy(key).agg(F.min("n").cast("long").alias("cms_count"))


def kendall_tau(df: DataFrame, x: str, y: str) -> DataFrame:
    """Kendall tau-b rank correlation between two columns, exact with
    tie correction — the concordance view beside spearman_rho's
    average-rank view (tau is more robust to a few wild rows; both
    detect the monotone association Pearson misses).

    Scale shape: rows reduce FIRST to the O(distinct (x,y) cells)
    block relation; concordant/discordant mass comes from the
    cell-pair self-join restricted to x1 < x2 — O(cells^2) pairs of
    COUNTS, never row pairs (use bucketed/binned inputs when a column
    is continuous: tau on bins is tau with ties, which tau-b
    corrects). Tie terms come from the two marginal relations.
    Returns one row: (n, concordant, discordant, tau_b); tau_b is
    NULL when either column is constant (try_divide).
    """
    d = df.filter(F.col(x).isNotNull() & F.col(y).isNotNull()).select(
        F.col(x).alias("gx"), F.col(y).alias("gy")
    )
    cells = d.groupBy("gx", "gy").agg(F.count(F.lit(1)).alias("c"))
    a, b = cells.alias("a"), cells.alias("b")
    pairs = a.join(b, F.col("a.gx") < F.col("b.gx")).select(
        (F.col("a.c") * F.col("b.c")).alias("m"),
        F.when(F.col("a.gy") < F.col("b.gy"), F.lit(1))
        .when(F.col("a.gy") > F.col("b.gy"), F.lit(-1))
        .otherwise(F.lit(0))
        .alias("sgn"),
    )
    cd = pairs.agg(
        F.coalesce(F.sum(F.when(F.col("sgn") == 1, F.col("m"))), F.lit(0)).alias(
            "concordant"
        ),
        F.coalesce(F.sum(F.when(F.col("sgn") == -1, F.col("m"))), F.lit(0)).alias(
            "discordant"
        ),
    )
    tx = (
        cells.groupBy("gx")
        .agg(F.sum("c").alias("t"))
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1) / 2).alias("n1"),
            F.sum("t").alias("n"),
        )
    )
    ty = (
        cells.groupBy("gy")
        .agg(F.sum("c").alias("t"))
        .agg(F.sum(F.col("t") * (F.col("t") - 1) / 2).alias("n2"))
    )
    out = cd.crossJoin(tx).crossJoin(ty)
    n0 = F.col("n") * (F.col("n") - 1) / 2
    tau = F.try_divide(
        (F.col("concordant") - F.col("discordant")).cast("double"),
        F.sqrt((n0 - F.col("n1")) * (n0 - F.col("n2"))),
    )
    return out.select(
        F.col("n").cast("long").alias("n"),
        F.col("concordant").cast("long").alias("concordant"),
        F.col("discordant").cast("long").alias("discordant"),
        F.round(tau, 6).alias("tau_b"),
    )


def welch_t(
    df: DataFrame,
    value: str,
    group: str,
    group_a,
    group_b,
    crit: float = 1.959964,
) -> DataFrame:
    """Welch's unequal-variance two-sample t: the mean-difference
    sibling of the rank-based mann_whitney_u (that one asks "do values
    from A tend to exceed B", this one "do the MEANS differ" without
    the classic pooled-variance assumption that breaks when one slice
    is noisier).

    ONE conditional aggregation over the scan — five power sums per
    side — then closed-form t and Satterthwaite df; the verdict flags
    |t| > ``crit`` (normal-approximation critical value; at the df
    this screen runs on, t and normal quantiles agree to the third
    decimal). Degenerate sides (n < 2 or zero variance on both) yield
    NULL t via try_divide and never flag. Returns one row:
    (n_a, n_b, mean_a, mean_b, mean_diff, t_stat, df_welch, flag).
    """
    v = F.col(value).cast("double")
    in_a = F.col(group) == group_a
    in_b = F.col(group) == group_b
    d = df.filter(v.isNotNull() & (in_a | in_b))
    agg = d.agg(
        F.sum(F.when(in_a, 1).otherwise(0)).alias("na"),
        F.sum(F.when(in_b, 1).otherwise(0)).alias("nb"),
        F.sum(F.when(in_a, v).otherwise(0.0)).alias("sa"),
        F.sum(F.when(in_b, v).otherwise(0.0)).alias("sb"),
        F.sum(F.when(in_a, v * v).otherwise(0.0)).alias("qa"),
        F.sum(F.when(in_b, v * v).otherwise(0.0)).alias("qb"),
    )
    ma = F.col("sa") / F.col("na")
    mb = F.col("sb") / F.col("nb")
    va = F.try_divide(F.col("qa") - F.col("sa") * F.col("sa") / F.col("na"), F.col("na") - 1)
    vb = F.try_divide(F.col("qb") - F.col("sb") * F.col("sb") / F.col("nb"), F.col("nb") - 1)
    se2 = va / F.col("na") + vb / F.col("nb")
    t = F.try_divide(ma - mb, F.sqrt(se2))
    dfw = F.try_divide(
        se2 * se2,
        F.pow(va / F.col("na"), F.lit(2.0)) / (F.col("na") - 1)
        + F.pow(vb / F.col("nb"), F.lit(2.0)) / (F.col("nb") - 1),
    )
    return agg.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.round(ma - mb, 6).alias("mean_diff"),
        F.round(t, 6).alias("t_stat"),
        F.round(dfw, 6).alias("df_welch"),
        F.coalesce(F.abs(t) > crit, F.lit(False)).alias("flag"),
    )


def mcnemar(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """McNemar's paired test: do two row-level validators (boolean
    verdict columns evaluated on the SAME rows) disagree more than
    chance in one direction? The unpaired two-proportion z-test is the
    wrong tool here — verdicts on the same row are correlated — and
    McNemar conditions that correlation away by looking only at the
    DISCORDANT pairs: b rows where A passes and B fails, c rows where
    B passes and A fails. chi2 = (|b - c| - 1)^2 / (b + c) (Edwards
    continuity correction), chi-square(1) under H0 "both validators
    have the same marginal pass rate"; degenerate b + c = 0 yields
    NULL chi2 and a False flag rather than 0/0.

    Scale: one conditional aggregation over the full table — no
    shuffle beyond the final 4-counter reduce, no window, no Python.
    NULL verdicts count as failures (a validator that cannot decide a
    row has not passed it). Returns one row: (n_both_pass, n_a_only,
    n_b_only, n_both_fail, chi2, reject_5pct).
    """
    a = F.coalesce(F.col(a_col).cast("boolean"), F.lit(False))
    b = F.coalesce(F.col(b_col).cast("boolean"), F.lit(False))
    agg = df.agg(
        F.sum((a & b).cast("long")).alias("n_both_pass"),
        F.sum((a & ~b).cast("long")).alias("n_a_only"),
        F.sum((~a & b).cast("long")).alias("n_b_only"),
        F.sum((~a & ~b).cast("long")).alias("n_both_fail"),
    )
    disc = F.col("n_a_only") + F.col("n_b_only")
    diff = F.abs(F.col("n_a_only") - F.col("n_b_only"))
    chi2 = F.pow(diff - 1.0, 2) / disc
    return agg.select(
        "n_both_pass",
        "n_a_only",
        "n_b_only",
        "n_both_fail",
        F.when(disc > 0, F.round(chi2, 6)).alias("chi2"),
        F.when(disc > 0, chi2 > 3.841459).otherwise(F.lit(False)).alias(
            "reject_5pct"
        ),
    )


def eb_shrunk_rates(
    df: DataFrame,
    key_col: str,
    pass_col: str,
) -> DataFrame:
    """Empirical-Bayes (beta-binomial, method-of-moments) shrinkage of
    per-key pass rates. Raw per-key rates are the single most abused
    data-quality readout: a key with 2/2 passes "beats" one with
    980/1000, purely because small n makes extreme rates cheap.
    Fitting Beta(alpha, beta) to the observed rate distribution and
    reporting the posterior mean (k + alpha) / (n + alpha + beta)
    pulls low-evidence keys toward the corpus prior while leaving
    high-n keys essentially untouched — the standard Morris/Efron
    moment estimator: with m and v the mean and sample variance of the
    raw rates, s = m(1 - m)/v - 1, alpha = m*s, beta = (1 - m)*s
    (keys with v = 0 or s <= 0 degenerate to no shrinkage, alpha =
    beta = 0, documented rather than clamped silently).

    Scale: one groupBy to the per-key relation, one 3-scalar reduce
    over THAT relation (not the raw rows) for the prior, broadcast
    back — O(keys) state end to end, no window, no Python. NULL keys
    are excluded (rate of an unknown key is undefined). Returns one
    row per key: (key, n, k, raw_rate, shrunk_rate, delta, alpha,
    beta), floats rounded to 6, ordered by key.
    """
    per_key = (
        df.filter(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).alias("key"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(pass_col).cast("int")).alias("k"),
        )
        .withColumn("raw_rate", F.col("k") / F.col("n"))
    )
    prior = per_key.agg(
        F.avg("raw_rate").alias("__m"),
        F.var_samp("raw_rate").alias("__v"),
    ).select(
        "__m",
        "__v",
        F.when(
            (F.col("__v") > 0)
            & (F.col("__m") * (1.0 - F.col("__m")) / F.col("__v") - 1.0 > 0),
            F.col("__m") * (1.0 - F.col("__m")) / F.col("__v") - 1.0,
        )
        .otherwise(F.lit(0.0))
        .alias("__s"),
    )
    joined = per_key.crossJoin(F.broadcast(prior))
    alpha = F.col("__m") * F.col("__s")
    beta = (1.0 - F.col("__m")) * F.col("__s")
    shrunk = (F.col("k") + alpha) / (F.col("n") + alpha + beta)
    return joined.select(
        "key",
        "n",
        "k",
        F.round("raw_rate", 6).alias("raw_rate"),
        F.round(shrunk, 6).alias("shrunk_rate"),
        F.round(shrunk - F.col("raw_rate"), 6).alias("delta"),
        F.round(alpha, 6).alias("alpha"),
        F.round(beta, 6).alias("beta"),
    ).orderBy("key")


def cramers_v_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """All-pairs Cramér's V association matrix over categorical
    columns — the screening companion of the single-pair chi-square
    test: chi2 says "is THIS pair dependent", the V matrix says "which
    of my categorical columns move together at all", normalized to
    [0, 1] so a 3-level and a 50-level column are comparable:

        V = sqrt(chi2 / (n * (min(r, c) - 1)))

    NULL is a real category ('(null)') — a column whose nullness
    tracks another column is exactly the dependence a screen must
    surface. Expected counts use the margin product e = row_total *
    col_total / n; cells never observed contribute (0 - e)^2 / e = e,
    folded in WITHOUT completing the grid via
    sum_all e = n  =>  chi2 = sum_obs((n_ij - e)^2/e) + (n - sum_obs e).

    Scale: ONE pass — each row explodes into its p(p-1)/2 column
    pairs (p is small and fixed), one groupBy(pair, a, b) to the
    contingency cells, margins and totals from aggregations over
    THOSE cells, broadcast-joined back. No window, no Python, state
    O(sum of contingency sizes). Returns one row per pair: (col_a,
    col_b, n, dof, chi2, cramers_v), ordered by (col_a, col_b);
    a degenerate pair (either side constant) has NULL V.
    """
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    structs = [
        F.struct(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            F.coalesce(F.col(a).cast("string"), F.lit("(null)")).alias("va"),
            F.coalesce(F.col(b).cast("string"), F.lit("(null)")).alias("vb"),
        )
        for a, b in pairs
    ]
    exploded = df.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
    cells = exploded.groupBy("col_a", "col_b", "va", "vb").agg(
        F.count(F.lit(1)).alias("nij")
    )
    rowm = cells.groupBy("col_a", "col_b", "va").agg(F.sum("nij").alias("ra"))
    colm = cells.groupBy("col_a", "col_b", "vb").agg(F.sum("nij").alias("cb"))
    tot = cells.groupBy("col_a", "col_b").agg(
        F.sum("nij").alias("n"),
        F.count_distinct("va").alias("r"),
        F.count_distinct("vb").alias("c"),
    )
    e = F.col("ra") * F.col("cb") / F.col("n")
    contrib = cells.join(rowm, ["col_a", "col_b", "va"]).join(
        colm, ["col_a", "col_b", "vb"]
    ).join(F.broadcast(tot), ["col_a", "col_b"]).groupBy("col_a", "col_b").agg(
        F.sum(F.pow(F.col("nij") - e, 2) / e).alias("__obs"),
        F.sum(e).alias("__esum"),
    )
    out = contrib.join(F.broadcast(tot), ["col_a", "col_b"])
    chi2 = F.col("__obs") + (F.col("n") - F.col("__esum"))
    mindim = F.least("r", "c") - 1
    v = F.sqrt(chi2 / (F.col("n") * mindim))
    return out.select(
        "col_a",
        "col_b",
        "n",
        mindim.cast("long").alias("dof"),
        F.round(chi2, 6).alias("chi2"),
        F.when(mindim > 0, F.round(v, 6)).alias("cramers_v"),
    ).orderBy("col_a", "col_b")


def theil_decomposition(
    df: DataFrame, value_col: str, group_col: str
) -> DataFrame:
    """Theil T inequality index with its exact between/within
    decomposition — the reason to use Theil over the Gini it sits next
    to (stats.gini): Gini does not decompose, Theil does,

        T = sum_g s_g * T_g  +  sum_g s_g * ln(mu_g / mu)

    with s_g the group's value share (n_g mu_g / n mu) and T_g the
    within-group index (1/n_g) sum (x/mu_g) ln(x/mu_g) — so "is the
    inequality BETWEEN my sources or INSIDE them" is a read-off, which
    for corpus curation decides whether rebalancing sources or
    filtering within sources is the lever. Only defined for positive
    values; zero/negative/NULL rows are excluded (documented, counted
    in n_excluded upstream if needed). NULL group is its own category.

    Scale: one conditional aggregation to O(groups) — sum, count, and
    sum(x ln x) per group are all algebraic/map-side-combinable — then
    pure arithmetic on that relation with the two global scalars
    broadcast back. Returns one row per group: (group, n_g, mean_g,
    share, theil_within, between_term, plus the global theil_total /
    within_total / between_total repeated), floats rounded to 6,
    ordered by group.
    """
    d = df.filter(F.col(value_col).isNotNull() & (F.col(value_col) > 0)).select(
        F.coalesce(F.col(group_col).cast("string"), F.lit("(null)")).alias(
            "group"
        ),
        F.col(value_col).cast("double").alias("__x"),
    )
    per_g = d.groupBy("group").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum("__x").alias("__sx"),
        F.sum(F.col("__x") * F.log("__x")).alias("__sxlx"),
    )
    glob = per_g.agg(
        F.sum("n_g").alias("__n"), F.sum("__sx").alias("__s")
    ).select("__n", "__s", (F.col("__s") / F.col("__n")).alias("__mu"))
    j = per_g.crossJoin(F.broadcast(glob))
    mu_g = F.col("__sx") / F.col("n_g")
    share = F.col("__sx") / F.col("__s")
    # T_g = (1/n_g) sum (x/mu_g) ln(x/mu_g)
    #     = (sum x ln x) / (n_g mu_g) - ln(mu_g)
    t_g = F.col("__sxlx") / F.col("__sx") - F.log(mu_g)
    within = share * t_g
    between = share * F.log(mu_g / F.col("__mu"))
    wsum = F.sum(within).over(Window.partitionBy(F.lit(1)))
    bsum = F.sum(between).over(Window.partitionBy(F.lit(1)))
    # "+ 0.0" folds IEEE -0.0 (a tiny negative term rounded to 6) into
    # +0.0 so the emitted value is engine- and sign-stable.
    return j.select(
        "group",
        "n_g",
        F.round(mu_g, 6).alias("mean_g"),
        F.round(share, 6).alias("share"),
        (F.round(within, 6) + 0.0).alias("theil_within"),
        (F.round(between, 6) + 0.0).alias("between_term"),
        (F.round(wsum + bsum, 6) + 0.0).alias("theil_total"),
        (F.round(wsum, 6) + 0.0).alias("within_total"),
        (F.round(bsum, 6) + 0.0).alias("between_total"),
    ).orderBy("group")


def runs_test(df: DataFrame, order_col: str, value_col: str) -> DataFrame:
    """Wald-Wolfowitz runs test on a sequence: is the above/below-
    median pattern of an ORDERED series random, or does it cluster
    (trend / regime persistence -> too few runs) or oscillate
    (over-dispersion / alternation -> too many)? The trend screens
    (theil_sen, mann_kendall) ask "is it going up"; the runs test asks
    the orthogonal "is it even exchangeable", which catches regime
    structure a zero-slope series can hide.

    Sequence sign = value strictly above the series median (exact
    interpolated percentile, matching percentile_cont); ties at the
    median count as below (deterministic). With n1 above, n2 below and
    R observed runs: E[R] = 2 n1 n2 / n + 1, Var[R] = 2 n1 n2
    (2 n1 n2 - n) / (n^2 (n - 1)), z = (R - E)/sqrt(Var), flagged at
    |z| > 1.959964; degenerate all-one-side series yield NULL z.

    Scale: the caller passes an already-reduced series (e.g. one row
    per day) — the lag window and the median run over that O(series)
    relation only, never raw rows. Returns one row: (n, n1, n2, runs,
    e_runs, var_runs, z_stat, flag).
    """
    d = df.filter(
        F.col(order_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(F.col(order_col).alias("__o"), F.col(value_col).cast("double").alias("__v"))
    med = d.agg(F.percentile("__v", F.lit(0.5)).alias("__med"))
    signed = d.crossJoin(F.broadcast(med)).select(
        "__o", (F.col("__v") > F.col("__med")).cast("int").alias("__s")
    )
    w = Window.partitionBy(F.lit(1)).orderBy("__o")
    flips = signed.select(
        "__s",
        F.when(
            F.lag("__s").over(w).isNull()
            | (F.col("__s") != F.lag("__s").over(w)),
            1,
        )
        .otherwise(0)
        .alias("__new_run"),
    )
    agg = flips.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__s").alias("n1"),
        F.sum(1 - F.col("__s")).alias("n2"),
        F.sum("__new_run").alias("runs"),
    )
    n = F.col("n").cast("double")
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    e_r = 2.0 * n1 * n2 / n + 1.0
    var_r = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (n * n * (n - 1.0))
    )
    z = (F.col("runs") - e_r) / F.sqrt(var_r)
    ok = (F.col("n1") > 0) & (F.col("n2") > 0) & (F.col("n") > 1)
    return agg.select(
        "n",
        "n1",
        "n2",
        "runs",
        F.when(ok, F.round(e_r, 6)).alias("e_runs"),
        F.when(ok, F.round(var_r, 6)).alias("var_runs"),
        F.when(ok & (var_r > 0), F.round(z, 6)).alias("z_stat"),
        F.when(ok & (var_r > 0), F.abs(z) > 1.959964)
        .otherwise(F.lit(False))
        .alias("flag"),
    )


def jackknife_ratio(
    df: DataFrame,
    group_col: str,
    num_col,
    den_col,
) -> DataFrame:
    """Delete-one-group jackknife standard error of a ratio estimator
    theta = sum(num) / sum(den) — the honest error bar for rates whose
    rows are NOT independent (pass rates cluster by day/source/user;
    the binomial SE pretends they don't and is too small exactly when
    it matters). Leave each group out, recompute the ratio from the
    group-complement sums, and use the Tukey jackknife variance
    (g - 1)/g * sum (theta_(i) - theta_bar)^2.

    Scale: rows reduce by ONE aggregation to (group, num, den); every
    leave-one-out ratio is (N - num_g) / (D - den_g) — pure arithmetic
    against the broadcast totals, no resampling pass, no window over
    raw rows. Returns one row: (n_groups, ratio, jk_mean, jk_se,
    ci_lo, ci_hi) with a 95% normal interval; degenerate (< 2 groups
    or a zero complement denominator) yields NULL se.
    """
    per_g = df.groupBy(F.col(group_col).alias("__g")).agg(
        F.sum(num_col).alias("__num"), F.sum(den_col).alias("__den")
    )
    tot = per_g.agg(
        F.count(F.lit(1)).alias("__k"),
        F.sum("__num").alias("__tn"),
        F.sum("__den").alias("__td"),
    )
    loo = per_g.crossJoin(F.broadcast(tot)).select(
        "__k",
        "__tn",
        "__td",
        F.when(
            F.col("__td") - F.col("__den") != 0,
            (F.col("__tn") - F.col("__num")) / (F.col("__td") - F.col("__den")),
        ).alias("__theta_i"),
    )
    agg = loo.agg(
        F.first("__k").alias("n_groups"),
        F.first("__tn").alias("__tn"),
        F.first("__td").alias("__td"),
        F.count("__theta_i").alias("__k_ok"),
        F.avg("__theta_i").alias("__tbar"),
        F.sum(F.pow(F.col("__theta_i"), 2)).alias("__tsq"),
    )
    k = F.col("__k_ok").cast("double")
    # (g-1)/g * sum (theta_i - tbar)^2  via the power-sum identity
    ssq = F.col("__tsq") - k * F.col("__tbar") * F.col("__tbar")
    var = (k - 1.0) / k * ssq
    theta = F.col("__tn") / F.col("__td")
    ok = (F.col("__k_ok") == F.col("n_groups")) & (F.col("n_groups") > 1)
    se = F.sqrt(F.greatest(var, F.lit(0.0)))
    return agg.select(
        "n_groups",
        F.round(theta, 6).alias("ratio"),
        F.when(ok, F.round(F.col("__tbar"), 6)).alias("jk_mean"),
        F.when(ok, F.round(se, 6)).alias("jk_se"),
        F.when(ok, F.round(theta - 1.959964 * se, 6)).alias("ci_lo"),
        F.when(ok, F.round(theta + 1.959964 * se, 6)).alias("ci_hi"),
    )


def friedman_test(
    df: DataFrame,
    item: str,
    treatment: str,
    value_col: str,
) -> DataFrame:
    """Friedman rank test over matched CONTINUOUS scores — the
    repeated-measures sibling of kruskal_wallis and the k-treatment
    extension of the paired designs (McNemar for binary, Bland-Altman
    for two scorers): the same items scored by k scorers, testing "do
    all k score distributions sit at the same location" while blocking
    out the huge between-item variance a k-sample Kruskal-Wallis would
    drown in.

    Midranks within each complete block, then Conover's tie-robust form

        A = sum r_ij^2,  B = (1/b) * sum_j R_j^2
        chi2 = (k-1) * (B - b*k*(k+1)^2/4) / (A - B),  df = k-1

    which reduces to the classic 12/(bk(k+1)) * sum R_j^2 - 3b(k+1)
    when there are no ties; A == B (every block internally tied) yields
    NULL. Verdict via the Wilson-Hilferty normal approximation,
    one-sided at 5%. Incomplete blocks are excluded and counted.

    Scale: ranks never touch raw rows globally — blocks are ranked by
    an item-keyed window over the (item, value)-distinct relation
    (bounded at k rows per item), and everything after is two
    map-side-combinable aggregations. Returns one row:
    (k, n_items, n_complete, chi2, df, z, reject_5pct).
    """
    from pyspark.sql import Window

    v = F.col(value_col).cast("double")
    labeled = df.filter(v.isNotNull()).select(
        F.col(item).alias("__i"), F.col(treatment).alias("__t"), v.alias("__v")
    )
    k_rel = labeled.agg(F.count_distinct("__t").alias("k"))
    sizes = labeled.groupBy("__i").agg(F.count(F.lit(1)).alias("__cnt"))
    sized = sizes.crossJoin(F.broadcast(k_rel))
    block_stats = sized.agg(
        F.first("k").alias("k"),
        F.count(F.lit(1)).alias("n_items"),
        F.sum((F.col("__cnt") == F.col("k")).cast("long")).alias("n_complete"),
    )
    complete = labeled.join(
        sized.filter(F.col("__cnt") == F.col("k")).select("__i"), "__i"
    )
    vc = complete.groupBy("__i", "__v").agg(F.count(F.lit(1)).alias("__tc"))
    w = Window.partitionBy("__i").orderBy("__v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    vc = vc.withColumn(
        "__rank", F.sum("__tc").over(w) - F.col("__tc") + (F.col("__tc") + 1) / 2
    )
    ranked = complete.join(vc.select("__i", "__v", "__rank"), ["__i", "__v"])
    a_rel = ranked.agg(F.sum(F.col("__rank") * F.col("__rank")).alias("__a"))
    per_t = ranked.groupBy("__t").agg(F.sum("__rank").alias("__rj"))
    b_rel = per_t.agg(F.sum(F.col("__rj") * F.col("__rj")).alias("__bb"))
    m = block_stats.crossJoin(a_rel).crossJoin(b_rel)
    kd = F.col("k").cast("double")
    b = F.col("n_complete").cast("double")
    bstat = F.col("__bb") / b
    centre = b * kd * (kd + 1.0) * (kd + 1.0) / 4.0
    denom = F.col("__a") - bstat
    chi2 = (kd - 1.0) * (bstat - centre) / denom
    dfree = kd - 1.0
    z = (
        F.pow(chi2 / dfree, 1.0 / 3.0) - (1.0 - 2.0 / (9.0 * dfree))
    ) / F.sqrt(2.0 / (9.0 * dfree))
    ok = (F.col("k") >= 2) & (F.col("n_complete") >= 1) & (denom > 0) & (
        chi2 >= 0
    )
    return m.select(
        "k",
        "n_items",
        "n_complete",
        F.when(ok, F.round(chi2, 6)).alias("chi2"),
        (F.col("k") - 1).alias("df"),
        F.when(ok, F.round(z, 6) + 0.0).alias("z"),
        F.when(ok, z > 1.644854).alias("reject_5pct"),
    )


def cooks_distance(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group: str | None = None,
    threshold: float | None = None,
) -> DataFrame:
    """Per-point Cook's distance for the per-group simple OLS fit — the
    influence diagnostic linear_trend needs beside it: a slope verdict
    produced by ONE wild day is not a trend, and Cook's D says exactly
    which points own the fit. Closed form for simple regression:

        h_i = 1/n + (x_i - xbar)^2 / Sxx          (leverage)
        D_i = e_i^2 / (2 s^2) * h_i / (1 - h_i)^2, s^2 = SSE/(n - 2)

    flagged at the conventional 4/n (or an explicit ``threshold``).

    One power-sum aggregation per group, then a broadcast of the
    O(groups) coefficient relation back onto the points — no windows,
    no second data pass. Input is expected to be a reduced relation
    (daily volumes, per-slice stats), one row per (group, x). Returns
    one row per input point: (group?, x, y, resid, leverage, cooks_d,
    influential); groups with n < 4 or zero x-variance or a perfect
    fit (s^2 = 0) yield NULL cooks_d.
    """
    gcols = [group] if group else []
    xy = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull()).select(
        *gcols,
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
    )
    fit = xy.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("x").alias("__sx"),
        F.sum("y").alias("__sy"),
        F.sum(F.col("x") * F.col("x")).alias("__sxx"),
        F.sum(F.col("x") * F.col("y")).alias("__sxy"),
        F.sum(F.col("y") * F.col("y")).alias("__syy"),
    )
    nd = F.col("__n").cast("double")
    sxx = F.col("__sxx") - F.col("__sx") * F.col("__sx") / nd
    cov = F.col("__sxy") - F.col("__sx") * F.col("__sy") / nd
    syy = F.col("__syy") - F.col("__sy") * F.col("__sy") / nd
    slope = F.try_divide(cov, F.when(sxx > 0, sxx))
    sse = syy - slope * cov
    coef = fit.select(
        *gcols,
        "__n",
        slope.alias("__b"),
        ((F.col("__sy") - slope * F.col("__sx")) / nd).alias("__a"),
        (F.col("__sx") / nd).alias("__xbar"),
        sxx.alias("__sxxc"),
        F.when(F.col("__n") > 2, sse / (nd - 2.0)).alias("__s2"),
    )
    j = (
        xy.join(F.broadcast(coef), gcols)
        if gcols
        else xy.crossJoin(F.broadcast(coef))
    )
    e = F.col("y") - (F.col("__a") + F.col("__b") * F.col("x"))
    h = (
        1.0 / F.col("__n")
        + (F.col("x") - F.col("__xbar"))
        * (F.col("x") - F.col("__xbar"))
        / F.col("__sxxc")
    )
    d = (
        e * e / (2.0 * F.col("__s2")) * h / ((1.0 - h) * (1.0 - h))
    )
    thr = (
        F.lit(float(threshold))
        if threshold is not None
        else 4.0 / F.col("__n").cast("double")
    )
    ok = (
        (F.col("__n") >= 4)
        & F.col("__b").isNotNull()
        & (F.col("__s2") > 0)
        & (h < 1.0)
    )
    return j.select(
        *gcols,
        "x",
        "y",
        F.when(F.col("__b").isNotNull(), F.round(e, 6) + 0.0).alias("resid"),
        F.when(F.col("__b").isNotNull(), F.round(h, 6)).alias("leverage"),
        F.when(ok, F.round(d, 6)).alias("cooks_d"),
        F.when(ok, d > thr).alias("influential"),
    )


# Poisson(1) inverse-CDF thresholds: P(X <= j) = e^-1 * sum_{i<=j} 1/i!.
# Written as exact double literals so any SQL engine replaying the same
# u < c comparisons takes the identical branch.
_POISSON1_CDF = (
    0.36787944117144233,  # P(0)
    0.7357588823428847,   # P(<=1)
    0.9196986029286058,   # P(<=2)
    0.9810118431238462,   # P(<=3)
    0.9963401531726563,   # P(<=4)
    0.9994058151824183,   # P(<=5)
)


def poisson_bootstrap(
    df: DataFrame,
    value_col: str,
    key_col: str,
    B: int = 32,
    group: str | None = None,
    z: float = 1.959964,
) -> DataFrame:
    """Deterministic Poisson bootstrap SE of the mean — the
    distribution-free error bar jackknife_ratio gives rates, for means:
    replicate b reweights every row by an independent Poisson(1) draw
    (the large-n limit of multinomial resampling, and the ONLY bootstrap
    that is embarrassingly parallel: each row's weight is a pure
    function of (key, b), so no replicate ever needs a global sample —
    the classic n-out-of-n bootstrap is unimplementable at 10^12 rows,
    this one is one scan).

    Weights come from the package mixer: u = (mix_key(key*B + b) mod
    DOMAIN + 1) / (DOMAIN + 1), inverted through the Poisson(1) CDF
    (capped at 6, beyond the 1e-7 tail). The replicate INDEX is
    exploded first and the weight computed once per exploded row — one
    small codegen-friendly CASE, not B inlined copies (a B-wide array
    of CASE trees blows the JVM's 64 KB method limit and drops the
    whole stage to interpreted mode). B rows per input row BEFORE
    map-side combine, B rows per PARTITION after it, so the shuffle is
    O(B x partitions) regardless of table size.

    Returns one row per group: (group?, n, b, mean, boot_mean,
    boot_se, ci_lo, ci_hi) with the +/- z normal interval around the
    PLAIN mean (the bootstrap estimates spread, not location).
    Replicates whose total weight is 0 (possible only for tiny groups)
    drop out as NULL replicate means on both engines alike; groups
    with n < 2 yield NULL se.
    """
    from jsonschema_validator_spark.operators.sampling import DOMAIN, mix_key

    gcols = [group] if group else []
    v = F.col(value_col).cast("double")
    k = F.col(key_col).cast("long")
    base = df.filter(v.isNotNull() & k.isNotNull()).select(
        *gcols, v.alias("__v"), k.alias("__k")
    )

    ex = base.select(
        *gcols,
        "__v",
        "__k",
        F.explode(F.sequence(F.lit(0), F.lit(B - 1))).alias("__b"),
    )
    u = (
        F.pmod(mix_key(F.col("__k") * B + F.col("__b")), F.lit(DOMAIN)) + 1.0
    ) / float(DOMAIN + 1)
    w = F.lit(6)
    for j in range(len(_POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < _POISSON1_CDF[j], F.lit(j)).otherwise(w)
    ex = ex.select(*gcols, "__v", "__b", w.cast("double").alias("__w"))
    per_rep = ex.groupBy(*gcols, "__b").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__v").alias("__sv"),
        F.sum("__w").alias("__sw"),
        F.sum(F.col("__w") * F.col("__v")).alias("__swv"),
    )
    rep_mean = F.try_divide(F.col("__swv"), F.when(F.col("__sw") > 0, F.col("__sw")))
    agg = per_rep.select(*gcols, "__n", "__sv", rep_mean.alias("__rm")).groupBy(
        *gcols
    ).agg(
        F.first("__n").alias("n"),
        (F.first("__sv") / F.first("__n")).alias("__mean"),
        F.avg("__rm").alias("__bmean"),
        F.stddev_samp("__rm").alias("__bse"),
    )
    ok = (F.col("n") >= 2) & F.col("__bse").isNotNull()
    return agg.select(
        *gcols,
        "n",
        F.lit(B).alias("b"),
        F.round("__mean", 6).alias("mean"),
        F.round("__bmean", 6).alias("boot_mean"),
        F.when(ok, F.round("__bse", 6)).alias("boot_se"),
        F.when(ok, F.round(F.col("__mean") - z * F.col("__bse"), 6)).alias(
            "ci_lo"
        ),
        F.when(ok, F.round(F.col("__mean") + z * F.col("__bse"), 6)).alias(
            "ci_hi"
        ),
    )


def pairwise_welch(
    df: DataFrame,
    value_col: str,
    group_col: str,
    z_crit: float = 1.959964,
) -> DataFrame:
    """All-pairs Welch mean comparison — the post-hoc step the one-way
    ANOVA verdict demands: "the groups differ" names no group, this
    names every pair. For each unordered pair (a, b):

        z = (mean_a - mean_b) / sqrt(var_a/n_a + var_b/n_b)

    compared against ``z_crit``. Pass the Bonferroni-adjusted normal
    critical for the pair count (e.g. 2.807034 for 10 pairs at family
    alpha 0.05) — the caller pins the constant because a Column plan
    cannot invert Phi. Large-sample normal form (Welch-Satterthwaite
    df is irrelevant past n ~ 100 per group).

    One aggregation to the O(groups) moment relation, then a self-join
    over it — the pair relation never touches raw rows. Returns one
    row per pair: (group_a, group_b, n_a, n_b, mean_diff, se, z,
    significant); degenerate pairs (a zero-variance side with n < 2,
    or se = 0) yield NULL z.
    """
    v = F.col(value_col).cast("double")
    per = (
        df.filter(v.isNotNull() & F.col(group_col).isNotNull())
        .groupBy(F.col(group_col).alias("__g"))
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.avg(v).alias("__m"),
            F.var_samp(v).alias("__v"),
        )
    )
    a = per.select(
        F.col("__g").alias("group_a"),
        F.col("__n").alias("n_a"),
        F.col("__m").alias("__ma"),
        F.col("__v").alias("__va"),
    )
    b = per.select(
        F.col("__g").alias("group_b"),
        F.col("__n").alias("n_b"),
        F.col("__m").alias("__mb"),
        F.col("__v").alias("__vb"),
    )
    pairs = a.join(F.broadcast(b), F.col("group_a") < F.col("group_b"))
    se = F.sqrt(
        F.col("__va") / F.col("n_a") + F.col("__vb") / F.col("n_b")
    )
    z = (F.col("__ma") - F.col("__mb")) / se
    ok = (
        (F.col("n_a") >= 2)
        & (F.col("n_b") >= 2)
        & F.col("__va").isNotNull()
        & F.col("__vb").isNotNull()
        & (se > 0)
    )
    return pairs.select(
        "group_a",
        "group_b",
        "n_a",
        "n_b",
        F.round(F.col("__ma") - F.col("__mb"), 6).alias("mean_diff"),
        F.when(ok, F.round(se, 6)).alias("se"),
        F.when(ok, F.round(z, 6) + 0.0).alias("z"),
        F.when(ok, F.abs(z) > z_crit).alias("significant"),
    ).orderBy("group_a", "group_b")


def brown_forsythe(
    df: DataFrame,
    value_col: str,
    group_col: str,
    f_crit: float | None = None,
) -> DataFrame:
    """Brown-Forsythe homogeneity-of-variance test — the admission
    check for every pooled-variance statistic in the suite: one-way
    ANOVA on the absolute deviations from the per-group MEDIAN
    (median, not mean, is what makes it robust to the heavy tails
    hill_tail measures). F = MS_between / MS_within on z_ij =
    |x_ij - med_j|.

    The per-group median is one exact percentile aggregation; the
    transformed values need a broadcast join back and ONE more
    aggregation — raw rows are scanned twice, shuffled by group twice,
    never sorted globally. ``f_crit`` is caller-pinned (e.g. 2.372 for
    df1=4 at the 5% level with large df2); when omitted the verdict
    column is NULL and only the statistic is reported. Returns one
    row: (k, n, f_stat, df1, heteroscedastic); k < 2 or zero within-
    group variation yields NULL f_stat.
    """
    v = F.col(value_col).cast("double")
    base = df.filter(v.isNotNull() & F.col(group_col).isNotNull()).select(
        F.col(group_col).alias("__g"), v.alias("__x")
    )
    med = base.groupBy("__g").agg(
        F.expr("percentile(__x, 0.5)").alias("__med")
    )
    z = base.join(F.broadcast(med), "__g").select(
        "__g", F.abs(F.col("__x") - F.col("__med")).alias("__z")
    )
    per = z.groupBy("__g").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__z").alias("__s"),
        F.sum(F.col("__z") * F.col("__z")).alias("__q"),
    )
    tot = per.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("__n").alias("n"),
        F.sum("__s").alias("__ts"),
        F.sum("__q").alias("__tq"),
        F.sum(F.col("__s") * F.col("__s") / F.col("__n")).alias("__sb"),
    )
    nd = F.col("n").cast("double")
    kd = F.col("k").cast("double")
    ssb = F.col("__sb") - F.col("__ts") * F.col("__ts") / nd
    ssw = F.col("__tq") - F.col("__sb")
    fstat = (ssb / (kd - 1.0)) / (ssw / (nd - kd))
    ok = (F.col("k") >= 2) & (nd > kd) & (ssw > 0)
    crit = (
        F.when(ok, fstat > float(f_crit))
        if f_crit is not None
        else F.lit(None).cast("boolean")
    )
    return tot.select(
        "k",
        "n",
        F.when(ok, F.round(fstat, 6)).alias("f_stat"),
        (F.col("k") - 1).alias("df1"),
        crit.alias("heteroscedastic"),
    )


def partial_correlation(
    df: DataFrame,
    x_col: str,
    y_col: str,
    z_col: str,
    group: str | None = None,
) -> DataFrame:
    """First-order partial correlation r_xy.z — the confounder screen
    the plain correlation matrix can't be: quantity and price can
    correlate entirely THROUGH discount, and

        r_xy.z = (r_xy - r_xz * r_yz) / sqrt((1 - r_xz^2)(1 - r_yz^2))

    is the correlation left after z is held fixed. ONE aggregation of
    the nine power sums over rows where all three are present; pure
    arithmetic after. Returns (group?, n, r_xy, r_xz, r_yz, r_partial,
    confounded); groups with n < 3, any zero-variance column, or a
    degenerate denominator yield NULL r_partial. ``confounded`` flags
    |r_xy| > 0.1 collapsing to |r_partial| <= 0.1 — a correlation that
    was mostly the confounder.
    """
    gcols = [group] if group else []
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    z = F.col(z_col).cast("double")
    base = df.filter(
        x.isNotNull() & y.isNotNull() & z.isNotNull()
    ).select(*gcols, x.alias("__x"), y.alias("__y"), z.alias("__z"))
    agg = base.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum("__z").alias("__sz"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
        F.sum(F.col("__z") * F.col("__z")).alias("__szz"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__x") * F.col("__z")).alias("__sxz"),
        F.sum(F.col("__y") * F.col("__z")).alias("__syz"),
    )
    nd = F.col("n").cast("double")
    vx = F.col("__sxx") - F.col("__sx") * F.col("__sx") / nd
    vy = F.col("__syy") - F.col("__sy") * F.col("__sy") / nd
    vz = F.col("__szz") - F.col("__sz") * F.col("__sz") / nd
    cxy = F.col("__sxy") - F.col("__sx") * F.col("__sy") / nd
    cxz = F.col("__sxz") - F.col("__sx") * F.col("__sz") / nd
    cyz = F.col("__syz") - F.col("__sy") * F.col("__sz") / nd
    rxy = F.try_divide(cxy, F.when(vx * vy > 0, F.sqrt(vx * vy)))
    rxz = F.try_divide(cxz, F.when(vx * vz > 0, F.sqrt(vx * vz)))
    ryz = F.try_divide(cyz, F.when(vy * vz > 0, F.sqrt(vy * vz)))
    den = (1.0 - rxz * rxz) * (1.0 - ryz * ryz)
    rp = F.try_divide(rxy - rxz * ryz, F.when(den > 0, F.sqrt(den)))
    ok = (F.col("n") >= 3) & rp.isNotNull()
    return agg.select(
        *gcols,
        "n",
        F.round(rxy, 6).alias("r_xy"),
        F.round(rxz, 6).alias("r_xz"),
        F.round(ryz, 6).alias("r_yz"),
        F.when(ok, F.round(rp, 6) + 0.0).alias("r_partial"),
        F.when(ok, (F.abs(rxy) > 0.1) & (F.abs(rp) <= 0.1)).alias(
            "confounded"
        ),
    )
