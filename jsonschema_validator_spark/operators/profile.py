"""JSON key profiling + schema inference over a JSON-string column.

The engine's validators answer "does this payload match the schema?";
this module answers the prior question "what schema does this payload
population actually follow?" — the per-key type/stat profile a data
owner reads before writing a spec, and the drift signal when a
producer silently adds keys or changes a type (schema drift, as
opposed to the value drift of operators/drift.py).

Design: one scan — parse to variant once, explode the top-level object
map, and aggregate per key with pure algebraic aggregates (per-tag
conditional counts, numeric min/max, max string length). The exploded
relation shuffles (key, tag, long, int) — the values themselves never
leave the map side except as 8-byte extracts. groupBy(key) is
skew-tolerant the same way every other algebraic rollup here is:
partial aggregation combines map-side, so one universal key ("id" on
every row) is fine.

`infer_schema` then turns the (tiny, post-aggregation) profile into a
draft-07 schema document: observed types per key, required = keys
present in every parsed document, integer bounds where every observed
value was integral. The loop closes in tests: a schema inferred from a
population validates that population clean through api.Schema.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.accessors import _vtag

#: tag vocabulary of functions.accessors._vtag, fixed column order
TAGS = ("null", "boolean", "integer", "number", "string", "array", "object")


def json_key_profile(
    df: DataFrame, json_col: Column | str, partition_col: str | None = None
) -> DataFrame:
    """Per-top-level-key profile of a JSON object column.

    Returns one row per key (per partition when ``partition_col`` is
    given): ``n_present`` (documents carrying the key), per-type-tag
    counts (``n_null`` .. ``n_object``, the _vtag vocabulary — integral
    floats count as integer, per corpus semantics), ``min_int``/
    ``max_int`` over integer-tagged values and ``max_strlen`` over
    string-tagged values. Non-object and unparseable documents
    contribute nothing (they are ``malformed_json_check``'s
    department)."""
    json_col = F.col(json_col) if isinstance(json_col, str) else json_col
    obj = F.try_variant_get(F.try_parse_json(json_col), "$", "map<string,variant>")
    keep = [F.col(partition_col).alias("part")] if partition_col else []
    kv = df.select(*keep, F.explode(obj).alias("key", "v"))
    tag = _vtag(F.col("v"))
    # extract ONCE into slim typed columns so the shuffle carries
    # (key, tag, 8B, 4B) instead of the variant payload
    slim = kv.select(
        *(["part"] if partition_col else []),
        "key",
        tag.alias("tag"),
        F.when(tag == "integer", F.try_variant_get(F.col("v"), "$", "long")).alias(
            "iv"
        ),
        F.when(
            tag == "string", F.length(F.try_variant_get(F.col("v"), "$", "string"))
        ).alias("slen"),
    )
    aggs = [F.count(F.lit(1)).alias("n_present")]
    aggs += [
        F.sum((F.col("tag") == t).cast("long")).alias(f"n_{t}") for t in TAGS
    ]
    aggs += [
        F.min("iv").alias("min_int"),
        F.max("iv").alias("max_int"),
        F.max("slen").alias("max_strlen"),
    ]
    group = (["part"] if partition_col else []) + ["key"]
    return slim.groupBy(*group).agg(*aggs)


def schema_drift(profile: DataFrame, part_a: str, part_b: str) -> DataFrame:
    """SCHEMA drift between two partitions of a partitioned profile
    (``json_key_profile(..., partition_col=...)``): which keys appeared
    or vanished, and how far each common key's type mix moved.

    Per key: ``n_a``/``n_b`` presence counts (0 when absent),
    ``status`` ('added' = only in b, 'removed' = only in a, 'common'),
    and ``type_l1`` — the L1 distance between the two per-key type-tag
    distributions (0 = identical mix, 2 = disjoint; an absent side
    counts as the zero distribution, so added/removed keys score 1.0
    per present tag mass). Runs entirely on the post-aggregation
    profile relation — O(keys), no input re-scan."""
    def side(part: str, suffix: str) -> DataFrame:
        cols = [F.col("n_present").alias(f"n{suffix}")] + [
            F.col(f"n_{t}").alias(f"{t}{suffix}") for t in TAGS
        ]
        return profile.filter(F.col("part") == part).select("key", *cols)

    j = side(part_a, "_a").join(side(part_b, "_b"), "key", "full_outer")
    na = F.coalesce(F.col("n_a"), F.lit(0))
    nb = F.coalesce(F.col("n_b"), F.lit(0))
    l1 = None
    for t in TAGS:
        fa = F.when(na > 0, F.coalesce(F.col(f"{t}_a"), F.lit(0)) / na).otherwise(
            F.lit(0.0)
        )
        fb = F.when(nb > 0, F.coalesce(F.col(f"{t}_b"), F.lit(0)) / nb).otherwise(
            F.lit(0.0)
        )
        term = F.abs(fa - fb)
        l1 = term if l1 is None else l1 + term
    status = (
        F.when((na > 0) & (nb > 0), F.lit("common"))
        .when(nb > 0, F.lit("added"))
        .otherwise(F.lit("removed"))
    )
    return j.select(
        "key",
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        status.alias("status"),
        l1.alias("type_l1"),
    )


def infer_schema(profile_rows, n_docs: int) -> dict:
    """Draft-07 schema from a collected profile (driver-side over the
    post-aggregation relation — O(distinct keys), not O(rows)).

    ``n_docs`` is the number of parsed object documents; a key present
    in all of them becomes ``required``. Integer-only keys get observed
    [minimum, maximum] bounds; string-only keys get maxLength. Mixed
    observed types become a type union — the widest schema the
    population satisfies, so inferred-then-validate round-trips clean.
    """
    props: dict[str, dict] = {}
    required: list[str] = []
    for r in profile_rows:
        d = r.asDict() if hasattr(r, "asDict") else dict(r)
        types = [t for t in TAGS if d[f"n_{t}"]]
        node: dict = {}
        if types:
            node["type"] = types[0] if len(types) == 1 else types
        if types == ["integer"] and d["min_int"] is not None:
            node["minimum"] = d["min_int"]
            node["maximum"] = d["max_int"]
        if types == ["string"] and d["max_strlen"] is not None:
            node["maxLength"] = d["max_strlen"]
        props[d["key"]] = node
        if d["n_present"] == n_docs:
            required.append(d["key"])
    out: dict = {"type": "object", "properties": props}
    if required:
        out["required"] = sorted(required)
    return out


def join_cardinality(
    left: DataFrame,
    left_col: str,
    right: DataFrame,
    right_col: str,
    label: str | None = None,
) -> DataFrame:
    """EXACT size of an equi-join without running it — the pre-flight
    explosion screen for 100-TB plans: join_rows = sum_k c_l(k)*c_r(k)
    computed from the two per-key count relations, so the cost is two
    aggregations plus a join of DISTINCT KEYS, never the |L|x|R|
    blowup being diagnosed. Self-joins (pass the same frame twice)
    give the sum-of-squares quadratic-skew diagnostic.

    Reports the hottest key and its share of the output: one whale key
    contributing 60% of join_rows means salting/AQE-skew-join BEFORE
    running, not after the stage straggles. Top-key ties break to the
    larger key (struct max), deterministically. NULL keys never join
    (SQL semantics) and are excluded everywhere. join_rows is exact,
    not an estimate; BIGINT overflow needs join_rows > 9.2e18 — at
    that size the answer is "don't run this join" regardless. Returns
    one row: (candidate, n_left, n_right, matched_keys, join_rows,
    expansion_left, expansion_right, top_key, top_key_rows,
    top_share)."""
    name = label or f"{left_col}x{right_col}"
    ca = (
        left.filter(F.col(left_col).isNotNull())
        .groupBy(F.col(left_col).alias("__k"))
        .agg(F.count(F.lit(1)).alias("__ca"))
    )
    cb = (
        right.filter(F.col(right_col).isNotNull())
        .groupBy(F.col(right_col).alias("__k"))
        .agg(F.count(F.lit(1)).alias("__cb"))
    )
    j = ca.join(cb, "__k").select(
        "__k", (F.col("__ca") * F.col("__cb")).alias("__prod")
    )
    jstats = j.agg(
        F.count(F.lit(1)).alias("matched_keys"),
        F.coalesce(F.sum("__prod"), F.lit(0)).alias("join_rows"),
        F.max(F.struct(F.col("__prod"), F.col("__k"))).alias("__top"),
    )
    nl = ca.agg(F.coalesce(F.sum("__ca"), F.lit(0)).alias("n_left"))
    nr = cb.agg(F.coalesce(F.sum("__cb"), F.lit(0)).alias("n_right"))
    row = nl.crossJoin(nr).crossJoin(jstats)
    jr = F.col("join_rows").cast("double")
    return row.select(
        F.lit(name).alias("candidate"),
        "n_left",
        "n_right",
        "matched_keys",
        "join_rows",
        F.round(
            F.when(F.col("n_left") > 0, jr / F.col("n_left")), 6
        ).alias("expansion_left"),
        F.round(
            F.when(F.col("n_right") > 0, jr / F.col("n_right")), 6
        ).alias("expansion_right"),
        F.col("__top.__k").alias("top_key"),
        F.col("__top.__prod").alias("top_key_rows"),
        F.round(
            F.when(F.col("join_rows") > 0, F.col("__top.__prod") / jr), 6
        ).alias("top_share"),
    )


def shape_profile(df: DataFrame, col: str, k: int = 20) -> DataFrame:
    """Format inference for a string column: collapse every value to
    its character-class SHAPE (runs of [a-z] -> 'a', [A-Z] -> 'A',
    digits -> '9', whitespace -> '_'; punctuation kept verbatim) and
    report the top-k shapes with counts and share — the profiling
    question "what FORMAT is this column" ('9999-99-99' vs 'a@a.a' vs
    free text) that null-rate/min/max stats can't see, and the
    schema-drift tripwire when a new shape appears.

    Each class collapses via its own run-regex (`[a-z]+` -> 'a', ...)
    — deliberately NO backreferences, so RE2-based engines replay the
    exact transform. NULL values profile as the '<null>' shape (a
    missingness format, not a dropped row). One projection + one
    groupBy; the rank window runs over the O(distinct shapes)
    aggregated relation. Ties break by shape string. Returns
    (rank, shape, n, share).
    """
    from pyspark.sql import Window

    s = F.col(col)
    shape = F.regexp_replace(s, "[a-z]+", "a")
    shape = F.regexp_replace(shape, "[A-Z]+", "A")
    shape = F.regexp_replace(shape, "[0-9]+", "9")
    shape = F.regexp_replace(shape, "\\s+", "_")
    shape = F.coalesce(shape, F.lit("<null>"))
    counts = df.select(shape.alias("shape")).groupBy("shape").agg(
        F.count(F.lit(1)).alias("n")
    )
    w_all = Window.partitionBy()
    w = Window.orderBy(F.desc("n"), F.col("shape"))
    return (
        counts.withColumn("total", F.sum("n").over(w_all))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "rank",
            "shape",
            "n",
            F.round(F.col("n") / F.col("total"), 6).alias("share"),
        )
    )


def column_risk_profile(
    df: DataFrame,
    columns: list[str] | None = None,
    id_ratio: float = 0.9,
    quasi_ratio: float = 0.1,
    top_share_cut: float = 0.5,
) -> DataFrame:
    """Per-column re-identification / shape triage over any table:
    for every profiled column — null rate, distinct count, distinct
    ratio, Shannon entropy of the value distribution (bits), the top
    value's frequency share — and a coarse ``role`` classification:

        identifier   distinct_ratio >= id_ratio  (joins to a person)
        quasi_id     distinct_ratio >= quasi_ratio (k-anonymity input)
        dominated    top value holds > top_share_cut of rows
        categorical  everything else

    This is the SELECTION step in front of the privacy suite: which
    columns belong in k_anonymity's quasi tuple, which are the
    sensitive attributes worth l-diversity/t-closeness, and which are
    constants masquerading as features. Thresholds are caller-pinned
    (same contract as every cutoff in this engine).

    Scale shape: the table is MELTED once to a (col, value) relation
    (one stringified value row per cell, columns pruned to the
    profiled set) and everything — counts, entropy regrouping, top
    share — is two aggregations over it; profiling C columns costs
    one C-fold row expansion, not C scans. NULL is profiled via the
    null_rate column, not as a value (entropy is over observed
    values; an all-NULL column classifies as dominated with NULL
    entropy, stated).

    Returns one row per column: (column, n_rows, null_rate,
    n_distinct, distinct_ratio, entropy_bits, top_value, top_share,
    role).
    """
    cols = df.columns if columns is None else columns
    if not cols:
        raise ValueError("no columns to profile")
    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("c"),
                        F.col(c).cast("string").alias("v"),
                    )
                    for c in cols
                ]
            )
        ).alias("kv")
    ).select("kv.c", "kv.v")
    counts = melted.groupBy("c", "v").agg(F.count(F.lit(1)).alias("n"))
    per_col = counts.groupBy("c").agg(
        F.sum("n").alias("n_rows"),
        F.sum(F.when(F.col("v").isNull(), F.col("n")).otherwise(0)).alias(
            "n_null"
        ),
        F.sum(F.when(F.col("v").isNotNull(), 1).otherwise(0)).alias(
            "n_distinct"
        ),
        F.sum(
            F.when(F.col("v").isNotNull(), F.col("n").cast("double")).otherwise(
                0.0
            )
        ).alias("n_obs"),
        F.sum(
            F.when(
                F.col("v").isNotNull(),
                F.col("n").cast("double") * F.log2(F.col("n").cast("double")),
            ).otherwise(0.0)
        ).alias("clogc"),
        F.max(
            F.when(
                F.col("v").isNotNull(),
                F.struct(
                    F.col("n").alias("n"),
                    # struct max = (count, then value string) — count
                    # ties break toward the LARGEST value, a stated
                    # deterministic order any engine can mirror
                    F.col("v").alias("v"),
                ),
            )
        ).alias("top"),
    )
    ent = F.when(
        F.col("n_obs") > 0,
        F.log2("n_obs") - F.col("clogc") / F.col("n_obs"),
    )
    dr = F.when(
        F.col("n_obs") > 0, F.col("n_distinct") / F.col("n_obs")
    )
    top_share = F.when(
        F.col("n_obs") > 0, F.col("top.n") / F.col("n_obs")
    )
    role = (
        F.when(dr.isNull(), F.lit("dominated"))
        .when(dr >= id_ratio, F.lit("identifier"))
        .when(top_share > top_share_cut, F.lit("dominated"))
        .when(dr >= quasi_ratio, F.lit("quasi_id"))
        .otherwise(F.lit("categorical"))
    )
    return per_col.select(
        F.col("c").alias("column"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.round(F.col("n_null") / F.col("n_rows"), 6).alias("null_rate"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.round(dr, 6).alias("distinct_ratio"),
        F.round(ent, 6).alias("entropy_bits"),
        F.col("top.v").alias("top_value"),
        F.round(top_share, 6).alias("top_share"),
        role.alias("role"),
    )
