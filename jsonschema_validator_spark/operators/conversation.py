"""Conversation-structure checks over transcript-shaped tables.

The north-rule input is a multi-turn transcript table
(conv_id, turn_idx, role, text, tool, ts). Beyond per-row keyword
checks and per-key uniqueness/ordering (operators/uniqueness.py,
operators/ordering.py), a validation engine needs STRUCTURAL checks on
the sequence of turns inside each conversation:

- `transition_violations`: which consecutive (prev_role -> role) steps
  break an allowed-transition contract (e.g. a `tool` turn must follow
  an `assistant` turn; `system` only at turn 0). One shuffle on the
  conversation key; the window carries only (group, order, role) — the
  text payload never enters the exchange.
- `conversation_stats`: per-conversation rollup (turn count, distinct
  roles, duration, largest inter-turn gap, per-role counts) as a pure
  partial+final aggregation — map-side combine keeps a Zipf-hot
  conversation from melting a reducer, per the skew finding in
  BENCH/BASELINE.md (plain agg is skew-immune; windows are what melt).

Scale: both operators shuffle once by the group key. At 10^12 turns the
window in `transition_violations` sorts per-conversation slices; whale
conversations are bounded (input contract: <= ~10^6 turns per conv, cf.
specs.transcripts_spec maximum), so no single task receives unbounded
data. For per-row attribution at adversarial skew, the agg+join pattern
of operators/uniqueness.duplicate_rows_join applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

# transition contract for the transcripts fixture (specs.ROLES):
# system may only open; user starts or follows assistant/tool;
# assistant follows user/tool/system; tool follows assistant.
DEFAULT_ALLOWED = [
    (None, "system"), (None, "user"),
    ("system", "user"), ("system", "assistant"),
    ("user", "assistant"),
    ("assistant", "user"), ("assistant", "tool"), ("assistant", "assistant"),
    ("tool", "assistant"), ("tool", "tool"),
]


def _edge(prev: Column, cur: Column) -> Column:
    # encode an edge as one comparable string; chr(1) can't occur in roles
    return F.concat_ws("\x01", F.coalesce(prev, F.lit("\x02")), cur)


def transition_violations(
    df: DataFrame,
    allowed: list[tuple[str | None, str]] | None = None,
    group: str = "conv_id",
    order: str = "turn_idx",
    role: str = "role",
) -> DataFrame:
    """Rows whose (previous role -> role) step is not in ``allowed``
    (None = conversation start). Returns (group, order, prev_role,
    role) for each violating turn.

    The projection BEFORE the window prunes every payload column out of
    the shuffle — only three small columns cross the exchange."""
    allowed = DEFAULT_ALLOWED if allowed is None else allowed
    edges = [((p if p is not None else "\x02") + "\x01" + c) for p, c in allowed]
    w = Window.partitionBy(group).orderBy(order)
    slim = df.select(group, order, role)
    prev = F.lag(role).over(w)
    return (
        slim.withColumn("__prev", prev)
        .where(~_edge(F.col("__prev"), F.col(role)).isin(edges))
        .select(
            F.col(group),
            F.col(order),
            F.col("__prev").alias("prev_role"),
            F.col(role),
        )
    )


def conversation_stats(
    df: DataFrame,
    group: str = "conv_id",
    order: str = "turn_idx",
    role: str = "role",
    ts: str = "ts",
    roles: list[str] | None = None,
) -> DataFrame:
    """Per-conversation rollup: turn count, distinct roles, span,
    largest inter-turn gap, and per-role turn counts.

    Everything is a single groupBy with algebraic/mergeable aggregates
    (map-side partial agg => skew-immune). The max inter-turn gap uses
    sorted collect-free arithmetic: max(ts) - min(ts) bounds the span;
    the true max gap needs adjacency, so it is computed from a window —
    but on a pre-projected (group, ts) frame, keeping the shuffle
    payload at 16 bytes/row."""
    roles = ["system", "user", "assistant", "tool"] if roles is None else roles
    # exact integer microseconds (parquet TIMESTAMP_NTZ casts through
    # timestamp — same idiom as operators/sessions.py); divide once at
    # the end so both engines round identically
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    w = Window.partitionBy(group).orderBy(us)
    gaps = (
        df.select(group, us.alias("__us"))
        .withColumn("__gap", F.col("__us") - F.lag("__us").over(Window.partitionBy(group).orderBy("__us")))
        .groupBy(group)
        .agg((F.max("__gap") / 1_000_000.0).alias("max_gap_secs"))
    )
    aggs = [
        F.count(F.lit(1)).alias("n_turns"),
        # NOT countDistinct: distinct-agg expands to a second full-row
        # shuffle on (group, role). collect_set's partial buffer is
        # bounded by role cardinality (a handful), merges map-side, and
        # keeps the rollup at ONE exchange.
        F.size(F.collect_set(role)).cast("long").alias("n_roles"),
        F.min(order).alias("first_turn"),
        F.max(order).alias("last_turn"),
        ((F.max(us) - F.min(us)) / 1_000_000.0).alias("duration_secs"),
    ]
    aggs += [
        F.sum(F.when(F.col(role) == r, 1).otherwise(0)).alias(f"n_{r}") for r in roles
    ]
    base = df.groupBy(group).agg(*aggs)
    # one exchange per side, both hash-partitioned by `group` => the
    # join co-locates without a third shuffle
    return base.join(gaps, group, "left")


def conversation_fingerprint(
    df: DataFrame,
    content: Column,
    group: str = "conv_id",
    order: str = "turn_idx",
    algebraic: bool = False,
) -> DataFrame:
    """Order-stable per-conversation content fingerprint — the
    conversation-granularity analog of the per-document fingerprint
    (operators/textstats.py): two transcripts are duplicates iff every
    turn's content matches AT ITS POSITION. This is the north-rule
    row invariant ("per-turn text equality under stable turn ordering")
    turned into a single comparable value per conversation.

    Parity mode (default): each turn is pre-hashed to md5(order ':'
    content) BEFORE the group — the shuffle carries 32 bytes/turn, not
    the text payload — then the per-turn hashes are concatenated in
    `order` order and hashed again. Exactly reproducible in ANSI SQL
    (md5(string_agg(md5(..), '|' ORDER BY order))), which is what the
    DuckDB oracle pins. The collect_list buffer is 32B x turns; bounded
    by the input contract's per-conversation turn cap.

    Algebraic mode (``algebraic=True``): fingerprint := sum of
    xxhash64(order, content) — position-sensitive because the turn
    index is hashed in, yet commutative, so it is a pure algebraic
    aggregate with map-side partial combine: no per-group buffer at
    all, whale conversations cost O(1) reducer memory. This is the
    10^12-turn default; it is Spark-specific (xxhash64), so the pytest
    suite pins that both modes induce the SAME duplicate-group
    partition, and the cross-engine oracle runs against parity mode.

    Returns (group, fingerprint string, n_turns).
    """
    turn = F.md5(F.concat(F.col(order).cast("string"), F.lit(":"), content))
    if algebraic:
        # decimal accumulator: sum over decimal(20,0) widens to
        # decimal(30,0) — no ANSI long overflow even at 10^9 turns/conv
        fp = F.sum(
            F.xxhash64(F.col(order).cast("string"), content).cast("decimal(20,0)")
        ).cast("string")
        return df.groupBy(group).agg(
            fp.alias("fingerprint"), F.count(F.lit(1)).alias("n_turns")
        )
    arr = F.array_sort(
        F.collect_list(F.struct(F.col(order).alias("o"), turn.alias("h")))
    )
    fp = F.md5(F.concat_ws("|", F.transform(arr, lambda x: x["h"])))
    return df.groupBy(group).agg(
        fp.alias("fingerprint"), F.count(F.lit(1)).alias("n_turns")
    )


def duplicate_conversations(fp: DataFrame, group: str = "conv_id") -> DataFrame:
    """Keep/drop decision over a fingerprint frame: for each
    conversation, how many share its fingerprint and whether this one
    is the canonical survivor (lowest group key wins — deterministic,
    partitioning-independent).

    agg + equi-join on the fingerprint, NOT a window over it: the same
    skew argument as uniqueness.duplicate_rows_join — a degenerate
    fingerprint shared by millions of conversations melts a window's
    single per-key sort task, while the agg combines map-side and AQE
    splits a skewed join key."""
    g = fp.groupBy("fingerprint").agg(
        F.min(group).alias("__keep_id"), F.count(F.lit(1)).alias("n_convs")
    )
    return (
        fp.join(g, "fingerprint")
        .select(
            F.col(group),
            "fingerprint",
            "n_convs",
            (F.col(group) == F.col("__keep_id")).alias("keep"),
        )
    )


def conversation_documents(
    df: DataFrame,
    group: str = "conv_id",
    order: str = "turn_idx",
    role: str = "role",
) -> DataFrame:
    """Assemble each conversation into ONE JSON document — the ordered
    array of its role strings — so the keyword engine validates
    conversation-level STRUCTURE with ordinary schema keywords instead
    of bespoke operators: ``prefixItems`` pins the opening turn,
    ``items``/``enum`` the role alphabet, ``minItems``/``maxItems`` the
    length contract, ``contains`` the "at least one assistant turn"
    kind of rule (draft 2020-12 array vocabulary).

    Returns (group, n_turns, doc) with ``doc`` a JSON array string —
    feed it straight to ``Schema.with_valid(out, "doc")``.

    Scale shape: one shuffle on the conversation key (partial
    collect_list is map-side combined); ordering happens INSIDE each
    row via sort_array over (order, role) structs — no window, no
    per-conversation sort task. Only (group, order, role) enter the
    exchange; text/payload columns are pruned out. Per-conversation
    size is bounded by the input contract (<= ~10^6 turns), the same
    bound every grouped operator here relies on.
    """
    pair = F.struct(F.col(order).alias("o"), F.col(role).alias("r"))
    return (
        df.groupBy(F.col(group).alias(group))
        .agg(F.sort_array(F.collect_list(pair)).alias("pairs"))
        .select(
            group,
            F.size("pairs").alias("n_turns"),
            F.to_json(F.transform("pairs", lambda p: p["r"])).alias("doc"),
        )
    )


def context_truncation(
    df: DataFrame,
    budget_tokens: int,
    group: str = "conv_id",
    order: str = "turn_idx",
    tokens: str = "n_tokens",
) -> DataFrame:
    """Per-conversation context-window fit report: walking the turns in
    order and accumulating token counts, how many turns fit before the
    running total exceeds ``budget_tokens``? The planning input for
    every fine-tuning job: frac_fit near 1 means the context budget is
    generous; a long tail of truncated conversations means the
    chunking/packing operators (operators/packing.py) must run first.

    One window (cumulative sum over the order column) on a
    PRE-PROJECTED (group, order, tokens) frame — the shuffle carries
    ~20 bytes/row, never the text — then one partial+final rollup.
    A turn "fits" while cumsum <= budget, so turns after the first
    overflow never count (even if small enough on their own): the
    prefix-fit semantic matches how a trainer actually truncates.
    NULL token counts count as 0 (nothing to add). Output per
    conversation: n_turns, sum_tokens, n_fit, truncated.
    """
    t = F.coalesce(F.col(tokens), F.lit(0))
    w = (
        Window.partitionBy(group)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pre = df.select(group, order, t.alias("__t")).withColumn(
        "__cum", F.sum("__t").over(w)
    )
    return (
        pre.groupBy(group)
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum("__t").alias("sum_tokens"),
            F.sum((F.col("__cum") <= budget_tokens).cast("long")).alias("n_fit"),
        )
        .withColumn("truncated", F.col("n_fit") < F.col("n_turns"))
    )


def render_training_text(
    df: DataFrame,
    group: str = "conv_id",
    order: str = "turn_idx",
    role: str = "role",
    text: str = "text",
    train_roles: tuple[str, ...] = ("assistant",),
    prefix: str = "<|",
    infix: str = "|>",
    suffix: str = "<|end|>",
) -> DataFrame:
    """Chat-template rendering offsets + loss mask: each turn renders as
    ``prefix + role + infix + text + suffix``; this computes, per turn,
    the [start_off, end_off) character span that turn occupies in the
    assembled conversation string and whether the trainer computes loss
    on it (``trainable`` = role in train_roles — the standard
    "train on assistant turns only" masking). NULL text renders as the
    empty string (the turn still exists and still occupies its
    delimiters).

    The offsets are what a tokenize-then-mask pipeline needs to carry
    masks through tokenization without re-parsing the template, and
    they are pure prefix sums, so the whole operator is ONE cumulative
    window over a PRE-PROJECTED (group, order, role, rendered_len)
    frame — the shuffle carries ~24 bytes/row, never the text.
    ``assemble_rendered`` (below) produces the matching string; the
    invariant substring(assembled, start_off+1, len) == rendered turn
    is pinned in pytest.
    """
    # NULL role renders as '' (same as NULL text): one NULL must not
    # poison the prefix sums of every later turn in the conversation
    rlen = (
        F.lit(len(prefix) + len(infix) + len(suffix))
        + F.length(F.coalesce(F.col(role), F.lit("")))
        + F.length(F.coalesce(F.col(text), F.lit("")))
    )
    w = (
        Window.partitionBy(group)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(group, order, role, rlen.alias("__len"))
        .withColumn("end_off", F.sum("__len").over(w))
        .select(
            group,
            order,
            role,
            (F.col("end_off") - F.col("__len")).alias("start_off"),
            "end_off",
            # NULL role -> isin yields NULL; a turn of unknown role is
            # NOT trainable, never indeterminate
            F.coalesce(F.col(role).isin(*train_roles), F.lit(False)).alias(
                "trainable"
            ),
        )
    )


def assemble_rendered(
    df: DataFrame,
    group: str = "conv_id",
    order: str = "turn_idx",
    role: str = "role",
    text: str = "text",
    prefix: str = "<|",
    infix: str = "|>",
    suffix: str = "<|end|>",
) -> DataFrame:
    """The assembled training string per conversation matching
    render_training_text's offsets: sort_array over collected
    (order, rendered) structs — ordering happens INSIDE each row, no
    window — then one concat. One shuffle (the assembly groupBy).
    Returns (group, text). The payload does cross this exchange (it
    must: the output IS the payload); callers that only need offsets
    use render_training_text and never ship the text."""
    rendered = F.concat(
        F.lit(prefix),
        F.coalesce(F.col(role), F.lit("")),  # must match render_training_text
        F.lit(infix),
        F.coalesce(F.col(text), F.lit("")),
        F.lit(suffix),
    )
    return (
        df.select(group, F.struct(F.col(order).alias("o"), rendered.alias("r")).alias("__s"))
        .groupBy(group)
        .agg(
            F.concat_ws(
                "", F.transform(F.sort_array(F.collect_list("__s")), lambda s: s["r"])
            ).alias("text")
        )
    )


def repeated_turn_runs(
    df: DataFrame,
    group: str = "conv_id",
    order: str = "turn_idx",
    text: str = "text",
    min_run: int = 3,
) -> DataFrame:
    """Agent-loop screen: maximal runs of CONSECUTIVE identical turn
    content within a conversation, length >= min_run — the signature of
    a stuck tool-retry / degenerate generation loop, which per-corpus
    dedup can't see (the turns are inside one conversation) and global
    frequency screens can't either (the looped text may be unique to
    that conversation).

    Standard gaps-and-islands: lag() marks run starts, a cumulative sum
    numbers the islands, one groupBy measures them. Both windows and
    the shuffle operate on a pre-projected (group, order, text-HASH)
    frame — 16 bytes of xxhash64 stand in for the payload, so a
    conversation full of 8 KB looped turns still shuffles ~24 B/row.
    NULL text hashes to a sentinel (two consecutive NULL turns are a
    run: a looping agent that emits empty turns is still looping).

    Returns (group, run_start = first order value of the run, run_len,
    text_hash) — one row per flagged run.
    """
    h = F.coalesce(
        F.xxhash64(F.col(text)), F.lit(-6148914691236517206)
    )  # sentinel for NULL
    w = Window.partitionBy(group).orderBy(order)
    pre = df.select(group, order, h.alias("__h"))
    runs = (
        pre.withColumn(
            "__new",
            # first row: lag is NULL -> compare against h XOR 1, which
            # always differs (no overflow, ANSI-safe) -> new run
            (
                F.col("__h")
                != F.coalesce(
                    F.lag("__h").over(w), F.col("__h").bitwiseXOR(F.lit(1))
                )
            ).cast("long"),
        )
        .withColumn(
            "__run",
            F.sum("__new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy(group, "__run")
        .agg(
            F.min(order).alias("run_start"),
            F.count(F.lit(1)).alias("run_len"),
            F.min("__h").alias("text_hash"),
        )
        .filter(F.col("run_len") >= min_run)
        .drop("__run")
    )
    return runs


def near_retry_screen(
    df: DataFrame,
    group: str = "conv_id",
    order: str = "turn_idx",
    text: str = "text",
    max_ratio: float = 0.25,
) -> DataFrame:
    """NEAR-identical adjacent turns: the retry-with-a-tiny-edit
    signature (regenerations, tool retries with a new request id,
    self-corrections that changed one token) that the EXACT loop screen
    (repeated_turn_runs) cannot see. A pair flags when
    levenshtein(prev, cur) / max(len) <= max_ratio.

    Plan shape: one lag() window per conversation. Unlike the exact
    screen, the payload genuinely must ride this shuffle (an edit
    distance needs both strings) — the mitigations are (a) an EXACT
    equality short-circuit evaluated first, so identical repeats cost a
    string compare, never the O(n*m) DP, and (b) the JVM builtin
    ``levenshtein`` with its threshold argument: passing the row's own
    flag cutoff lets the implementation abandon the DP as soon as the
    distance provably exceeds it — banded O(n*cutoff) instead of
    O(n*m) on the (typical) wildly-different pairs. At 100 TB, cap
    turn length upstream (context_truncation) before this screen.

    Engine-parity note: Spark's levenshtein counts CODEPOINTS, DuckDB's
    counts BYTES — identical on ASCII, divergent on multibyte text, so
    the SQL-oracled contract plants ASCII and production multilingual
    use should normalize first (cleaning.normalize_unicode).

    Output per adjacent pair with a non-null previous turn:
    (group, order, dist, ratio, is_retry); exact repeats have
    dist 0 / ratio 0. Distances above the banded threshold report the
    cutoff ceiling (they are not retries by definition; the exact value
    is irrelevant) — the oracle replays the same clamp.
    """
    w = Window.partitionBy(group).orderBy(order)
    pairs = (
        df.select(group, order, F.col(text).alias("__cur"))
        .withColumn("__prev", F.lag("__cur").over(w))
        .filter(F.col("__prev").isNotNull())
    )
    prev, cur = F.col("__prev"), F.col("__cur")
    max_len = F.greatest(F.length(prev), F.length(cur), F.lit(1))
    # banded DP: the threshold form returns -1 when the distance
    # provably exceeds the cutoff; map it to cutoff+1 (a clamp — the
    # pair is not a retry, its exact distance is irrelevant). The
    # per-row Column threshold needs the SQL form: the Python wrapper
    # accepts only an int literal.
    cutoff = F.floor(max_len * F.lit(float(max_ratio))).cast("int")
    pairs = pairs.withColumn("__cutoff", cutoff)
    banded = F.expr("levenshtein(__prev, __cur, __cutoff)")
    cutoff = F.col("__cutoff")
    dist = (
        F.when(prev == cur, F.lit(0).cast("long"))
        .when(banded < 0, (cutoff + 1).cast("long"))
        .otherwise(banded.cast("long"))
    )
    return pairs.select(
        group,
        order,
        dist.alias("dist"),
        F.round(dist / max_len, 6).alias("ratio"),
        (dist / max_len <= max_ratio).alias("is_retry"),
    )


def last_k_turns(
    df: DataFrame,
    k: int,
    group: str = "conv_id",
    order: str = "turn_idx",
) -> DataFrame:
    """Eval-context extraction: the last k turns of every conversation,
    by POSITION (not order arithmetic — order values may be sparse, so
    max(order) - k is wrong when ids have gaps). The ranking window runs
    on a pre-projected (group, order) frame — two ~16-byte columns
    through the exchange — and the surviving (group, order) keys
    equi-join the payload back, so full turn text never enters the
    window shuffle. Adds ``turn_rank`` (1 = latest turn).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = Window.partitionBy(group).orderBy(F.desc(order))
    keys = (
        df.select(group, order)
        .withColumn("turn_rank", F.row_number().over(w))
        .filter(F.col("turn_rank") <= k)
    )
    return df.join(keys, [group, order])


def transition_matrix(
    df: DataFrame,
    group: str = "conv_id",
    order: str = "turn_idx",
    role: str = "role",
) -> DataFrame:
    """Empirical role-transition profile: for every observed
    (role -> next_role) edge, its count and the conditional rate
    P(next_role | role). The observability complement of
    transition_violations — you design the allowed-edge contract FROM
    this matrix, and a sudden rate shift (assistant -> tool collapsing)
    is a pipeline regression even when every individual edge stays
    legal.

    One lead() window over a pre-projected (group, order, role) frame;
    the rate normalization runs entirely on the O(roles^2) aggregated
    relation. Conversation-final turns (no next turn) are excluded; NULL
    role participates as a real category in BOTH positions — "has a next
    turn" is detected on lead(order) (the order column is non-null), so
    an edge INTO an unknown-role turn is a (role, NULL) row, never
    conflated with conversation end.
    """
    w = Window.partitionBy(group).orderBy(order)
    pairs = (
        df.select(group, order, F.col(role).alias("role"))
        .withColumn("next_role", F.lead("role").over(w))
        .withColumn("__has_next", F.lead(order).over(w).isNotNull())
        .filter(F.col("__has_next"))
    )
    counts = pairs.groupBy("role", "next_role").agg(F.count(F.lit(1)).alias("n"))
    tot = Window.partitionBy("role")
    return counts.select(
        "role",
        "next_role",
        "n",
        F.round(F.col("n") / F.sum("n").over(tot), 6).alias("rate"),
    )


def turn_gap_stats(
    df: DataFrame,
    group: str = "conv_id",
    order: str = "turn_idx",
    role: str = "role",
    ts: str = "ts",
) -> DataFrame:
    """Inter-turn latency by (prev_role -> role) edge: count, mean and
    max gap in seconds — assistant response latency, tool execution
    time, and user think time fall out of one report, and a latency
    regression on one edge is invisible to volume/transition screens.

    One lag() window over a pre-projected (group, order, role,
    timestamp) frame (~32 B/row); exact integer microsecond arithmetic
    (unix_micros), aggregated per edge. Gaps involving a NULL timestamp
    are excluded; negative gaps (out-of-order clocks) are kept — they
    are exactly what an ordering screen wants surfaced, and the
    ordering operator (operators/ordering.py) pins where they are.
    """
    w = Window.partitionBy(group).orderBy(order)
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    pre = df.select(group, order, F.col(role).alias("role"), us.alias("__us"))
    gaps = (
        pre.withColumn("prev_role", F.lag("role").over(w))
        .withColumn("__prev_us", F.lag("__us").over(w))
        .filter(F.col("__prev_us").isNotNull() & F.col("__us").isNotNull())
        .select("prev_role", "role", (F.col("__us") - F.col("__prev_us")).alias("__gap_us"))
    )
    # aggregate EXACT integer microseconds (long sums are order-exact,
    # unlike double avg whose summation order is partition-dependent);
    # the single float division at the end rounds identically in any
    # IEEE engine — which is what makes the report SQL-oracle-able
    return gaps.groupBy("prev_role", "role").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum("__gap_us") / (F.count(F.lit(1)) * F.lit(1_000_000.0)), 6
        ).alias("mean_gap_s"),
        (F.max("__gap_us") / F.lit(1_000_000.0)).alias("max_gap_s"),
    )


def curation_summary(
    df: DataFrame,
    invalid_turn: Column,
    content: Column,
    group: str = "conv_id",
    order: str = "turn_idx",
    role: str = "role",
) -> DataFrame:
    """ONE-PASS per-conversation curation signals — the scale form of
    the validate -> loop-screen -> fingerprint composition. Composing
    the stage operators as dataframe-level anti/semi joins re-expands
    every upstream branch per stage (measured on the contract pipeline:
    90 parquet scans / 93 exchanges in the stage-wise plan); at 10^12
    turns that plan is unrunnable. This operator computes, in a SINGLE
    groupBy over a single scan:

    - ``any_invalid`` — bool_or of the caller's per-turn validity
      predicate (the enum/parse stage; plug the keyword engine's
      predicate in for full-schema validation),
    - ``max_run`` — the longest run of consecutive identical roles,
      computed IN-ROW from the order-sorted collected array via one
      F.aggregate fold (no window, no second shuffle; same semantics
      as repeated_turn_runs, pinned by pytest),
    - ``fingerprint`` — byte-identical to conversation_fingerprint's
      parity mode (md5 over order-sorted per-turn md5s),
    - ``n_turns`` / ``sum_order`` — the rollup stats.

    The shuffle carries (order, 32B turn hash, 8B role hash, flag) per
    turn — payload pruned; the collected buffer is bounded by the input
    contract's per-conversation turn cap. Downstream keep/drop and
    split logic then runs on this O(conversations) relation without
    ever touching the turn rows again.
    """
    turn = F.md5(F.concat(F.col(order).cast("string"), F.lit(":"), content))
    rh = F.coalesce(F.xxhash64(F.col(role)), F.lit(-6148914691236517206))
    arr = F.array_sort(
        F.collect_list(
            F.struct(F.col(order).alias("o"), turn.alias("h"), rh.alias("r"))
        )
    )
    acc0 = F.struct(
        F.lit(None).cast("long").alias("prev"),
        F.lit(0).cast("long").alias("cur"),
        F.lit(0).cast("long").alias("mx"),
    )

    def step(acc, x):
        cur = F.when(acc["prev"].eqNullSafe(x), acc["cur"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            cur.alias("cur"),
            F.greatest(acc["mx"], cur).alias("mx"),
        )

    return df.groupBy(group).agg(
        F.max(invalid_turn.cast("boolean")).alias("any_invalid"),
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.col(order)).alias("sum_order"),
        arr.alias("__arr"),
    ).select(
        group,
        "any_invalid",
        "n_turns",
        "sum_order",
        F.aggregate(
            F.transform("__arr", lambda x: x["r"]), acc0, step, lambda a: a["mx"]
        ).alias("max_run"),
        F.md5(
            F.concat_ws("|", F.transform("__arr", lambda x: x["h"]))
        ).alias("fingerprint"),
    )


def sequence_string(
    df: DataFrame,
    group: str,
    order: str,
    token: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-group ordered token-initial string: one groupBy collects
    (order, initial) structs, sort_array orders them WITHIN the
    aggregated value (no window, no skew-prone sort of the raw table),
    array_join flattens to the sequence string. Output is one row per
    group with seq length = group size — bounded by the longest
    conversation, the same per-group envelope every conversation
    operator here assumes. The sequence string is the input to
    whole-history GRAMMAR validation (regex over role/event initials),
    which subsumes adjacent-pair transition screens: a transition
    matrix sees one edge at a time; a grammar sees the whole sentence."""
    key = F.struct(F.col(order).alias("o"), *( [F.col(tiebreak).alias("t")] if tiebreak else [] ))
    return (
        df.groupBy(group)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(key.alias("k"), F.substring(F.col(token), 1, 1).alias("c"))
                        )
                    ),
                    lambda s: s["c"],
                ),
                "",
            ).alias("seq"),
            F.count(F.lit(1)).alias("n_turns"),
        )
    )


def grammar_report(
    df: DataFrame,
    group: str,
    order: str,
    token: str,
    patterns: dict[str, str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Whole-sequence grammar screen: every named regex in `patterns`
    becomes a boolean over the per-group sequence string, rolled up as
    (pattern combination) -> n_groups, avg length. One groupBy for the
    sequences + one for the rollup."""
    seqs = sequence_string(df, group, order, token, tiebreak=tiebreak)
    flags = [F.col("seq").rlike(p).alias(name) for name, p in patterns.items()]
    return (
        seqs.select(*flags, "n_turns")
        .groupBy(*[name for name in patterns])
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.round(F.avg("n_turns"), 4).alias("avg_len"),
        )
        .orderBy(*[name for name in patterns])
    )


def markov_surprisal(
    df: DataFrame,
    group: str = "conv_id",
    order: str = "turn_idx",
    role: str = "role",
) -> DataFrame:
    """Per-conversation anomaly score under the corpus's own first-order
    transition model: mean and max surprisal -log2 P(next_role | role),
    where P is the global MLE transition matrix. The probabilistic
    complement of grammar_report — a conversation can satisfy every
    regex yet be wildly atypical (e.g. all error->error loops), and mean
    surprisal surfaces exactly that; max surprisal pins the single most
    improbable edge.

    Every observed pair has P > 0 by construction (the model is fit on
    the same relation it scores), so no smoothing is needed and the
    score is exact. NULL roles coalesce to the '(null)' sentinel BEFORE
    both modeling and scoring, so unknown-role turns are scored as a
    real category, never silently dropped by the equi-join.

    Scale: one lead() window over the pre-projected (group, order, role)
    frame produces the pair relation ONCE; the model is derived from its
    O(roles^2) aggregate (prefix totals from the aggregate, never a
    second corpus pass) and joins back BROADCAST; the final per-group
    collapse is map-side partial. Conversations with a single turn have
    no transitions and are absent, matching the explode-based operator
    convention.
    """
    w = Window.partitionBy(group).orderBy("__o")
    sent = F.coalesce(F.col(role).cast("string"), F.lit("(null)"))
    pairs = (
        df.select(group, F.col(order).alias("__o"), sent.alias("__r"))
        .withColumn("__next", F.lead("__r").over(w))
        .withColumn("__has_next", F.lead("__o").over(w).isNotNull())
        .filter(F.col("__has_next"))
        .select(group, "__r", "__next")
    )
    counts = pairs.groupBy("__r", "__next").agg(F.count(F.lit(1)).alias("__n"))
    pref = counts.groupBy("__r").agg(F.sum("__n").alias("__ntot"))
    model = counts.join(pref, "__r").select(
        "__r",
        "__next",
        (F.col("__n").cast("double") / F.col("__ntot")).alias("__p"),
    )
    return (
        pairs.join(F.broadcast(model), ["__r", "__next"])
        .groupBy(group)
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.round(-F.avg(F.log2("__p")), 6).alias("mean_surprisal"),
            F.round(F.max(-F.log2("__p")), 6).alias("max_surprisal"),
        )
    )


def turn_latency_sla(
    df: DataFrame,
    group: str,
    order: str,
    role: str,
    ts: str,
    sla_s: float = 60.0,
) -> DataFrame:
    """Per-(prev_role, role) response-latency SLA report — the
    percentile sibling of turn_gap_stats' mean/max: a mean hides the
    p95 an SLA is written against, and the breach fraction is the
    contract number. Gaps in exact integer microseconds from the
    group-keyed lag window (fine key, no skew), then per-edge exact
    interpolated p50/p95 and the share of gaps above ``sla_s``.
    Returns (prev_role, role, n, p50_s, p95_s, breach_rate,
    sla_breached) ordered by edge; sla_breached fires when the p95
    itself exceeds the SLA (the contract is usually written on p95,
    not on the breach count).
    """
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    w = Window.partitionBy(group).orderBy(order)
    gaps = (
        df.select(
            F.col(role).alias("role"),
            F.lag(F.col(role)).over(w).alias("prev_role"),
            (us - F.lag(us).over(w)).alias("__gap_us"),
        )
        .filter(
            F.col("__gap_us").isNotNull() & F.col("prev_role").isNotNull()
        )
        .select(
            "prev_role", "role", (F.col("__gap_us") / 1000000.0).alias("__g")
        )
    )
    agg = gaps.groupBy("prev_role", "role").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile(__g, 0.5)").alias("__p50"),
        F.expr("percentile(__g, 0.95)").alias("__p95"),
        F.avg((F.col("__g") > sla_s).cast("double")).alias("__br"),
    )
    return agg.select(
        "prev_role",
        "role",
        "n",
        F.round("__p50", 6).alias("p50_s"),
        F.round("__p95", 6).alias("p95_s"),
        F.round("__br", 6).alias("breach_rate"),
        (F.col("__p95") > sla_s).alias("sla_breached"),
    ).orderBy("prev_role", "role")


def entropy_rate(
    df: DataFrame,
    group: str = "conv_id",
    order: str = "turn_idx",
    role: str = "role",
) -> DataFrame:
    """Entropy rate of the role process — the single number behind the
    transition matrix: H(next | current) = -sum_i p(i) sum_j p(j|i)
    log2 p(j|i) weighted by the empirical current-state distribution,
    beside the zeroth-order H(role) for comparison. predictability =
    1 - H_rate / H0 is the "how much does knowing the current role
    tell you" score — a collapse toward 0 means role structure
    dissolved (a pipeline regression even when every edge stays
    legal), a jump toward 1 means conversations became rigid
    templates.

    Same single lead() window as transition_matrix; everything after
    runs on the O(roles^2) aggregate. NULL roles participate as a real
    category in both positions (an edge INTO an unknown-role turn is
    (role, NULL), never conflated with conversation end). Returns one
    row: (n_transitions, n_roles, h0_bits, h_rate_bits,
    predictability); a single-role corpus yields 0 for both entropies
    and NULL predictability (0/0 is not a score).
    """
    w = Window.partitionBy(group).orderBy(order)
    pairs = (
        df.select(group, order, F.col(role).alias("role"))
        .withColumn("next_role", F.lead("role").over(w))
        .withColumn("__has_next", F.lead(order).over(w).isNotNull())
        .filter(F.col("__has_next"))
    )
    counts = pairs.groupBy("role", "next_role").agg(
        F.count(F.lit(1)).alias("n")
    )
    per_src = counts.groupBy("role").agg(F.sum("n").alias("n_src"))
    # null-safe join-back: NULL is a real source role and a plain
    # equi-join would silently drop every edge LEAVING an unknown-role
    # turn from the entropy sum
    j = counts.join(
        F.broadcast(per_src.withColumnRenamed("role", "__src")),
        F.col("role").eqNullSafe(F.col("__src")),
    )
    contrib = F.col("n").cast("double") * -F.log2(
        F.col("n") / F.col("n_src")
    )
    tot = j.agg(
        F.sum("n").alias("n_transitions"),
        F.sum(contrib).alias("__hsum"),
    )
    src_h = (
        per_src.crossJoin(F.broadcast(tot.select("n_transitions")))
        .select(
            (
                (F.col("n_src") / F.col("n_transitions"))
                * -F.log2(F.col("n_src") / F.col("n_transitions"))
            ).alias("__h0c")
        )
        .agg(
            F.sum("__h0c").alias("__h0"),
            F.count(F.lit(1)).alias("n_roles"),
        )
    )
    out = tot.crossJoin(F.broadcast(src_h))
    h_rate = F.col("__hsum") / F.col("n_transitions")
    h0 = F.col("__h0")
    return out.select(
        "n_transitions",
        "n_roles",
        F.round(h0, 6).alias("h0_bits"),
        F.round(h_rate, 6).alias("h_rate_bits"),
        F.when(h0 > 0, F.round(1.0 - h_rate / h0, 6) + 0.0).alias(
            "predictability"
        ),
    )


def conditional_mutual_information(
    df: DataFrame,
    group: str,
    order: str,
    role: str,
    cond: str,
) -> DataFrame:
    """Conditional mutual information I(next_role ; Z | role) in bits
    — does a per-turn covariate Z (tool used, payload-size bucket,
    latency band) carry information about WHAT HAPPENS NEXT beyond
    what the current role already tells you? This is the next
    diagnostic after entropy_rate: entropy_rate measures how
    predictable the role process is from the role alone; this measures
    how much MORE predictable a covariate makes it. I = 0 iff Z is
    conditionally independent of the next role given the current role
    (the first-order-Markov-sufficiency check); I close to
    H(next|role) means the covariate essentially determines the next
    turn.

        I = H(next | role) - H(next | role, Z)

    both terms from one (role, z, next_role) count relation:
    H(next|A) = [ sum_A n_A log2 n_A - sum_{A,next} n log2 n ] / N
    (exact regrouping of -sum p log p, one aggregation each).

    Scale shape: one lead() window keyed by the conversation (the same
    shuffle every transition screen pays), ONE shuffle to the
    O(roles x z x roles) count relation, then two tiny rollups.
    NULL role / NULL Z / NULL next-role coalesce to the '(null)'
    sentinel BEFORE the window, so unknown-covariate turns participate
    as a real category instead of being dropped (the transition_matrix
    lesson). Conversation-final turns (no next) are excluded — they
    have no next role to inform.

    Returns one row: (n_transitions, h_next_given_role_bits,
    h_next_given_role_z_bits, cmi_bits, influence_ratio) where
    influence_ratio = I / H(next|role) in [0, 1] (NULL when
    H(next|role) = 0).
    """
    sent = F.lit("(null)")
    base = df.select(
        F.col(group).alias("__g"),
        F.col(order).alias("__o"),
        F.coalesce(F.col(role).cast("string"), sent).alias("__r"),
        F.coalesce(F.col(cond).cast("string"), sent).alias("__z"),
    )
    w = Window.partitionBy("__g").orderBy("__o")
    trans = base.select(
        "__r",
        "__z",
        F.lead("__r").over(w).alias("__next"),
        F.lead("__o").over(w).alias("__has_next"),
    ).filter(F.col("__has_next").isNotNull())
    counts = trans.groupBy("__r", "__z", "__next").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    # H(next | role): regroup over (role) and (role, next)
    by_rn = counts.groupBy("__r", "__next").agg(F.sum("n").alias("n"))
    by_r = by_rn.groupBy("__r").agg(
        F.sum("n").alias("na"), F.sum(F.col("n") * F.log2("n")).alias("cl")
    )
    h1 = by_r.agg(
        F.sum("na").alias("N"),
        (
            (F.sum(F.col("na") * F.log2("na")) - F.sum("cl"))
        ).alias("hn"),
    )
    # H(next | role, z): regroup over (role, z) and (role, z, next)
    by_rz = counts.groupBy("__r", "__z").agg(
        F.sum("n").alias("na"), F.sum(F.col("n") * F.log2("n")).alias("cl")
    )
    h2 = by_rz.agg(
        (
            (F.sum(F.col("na") * F.log2("na")) - F.sum("cl"))
        ).alias("hnz")
    )
    out = h1.crossJoin(F.broadcast(h2))
    h_r = F.col("hn") / F.col("N")
    h_rz = F.col("hnz") / F.col("N")
    cmi = h_r - h_rz
    return out.select(
        F.col("N").cast("long").alias("n_transitions"),
        F.round(h_r, 6).alias("h_next_given_role_bits"),
        F.round(h_rz, 6).alias("h_next_given_role_z_bits"),
        F.round(cmi, 6).alias("cmi_bits"),
        F.when(h_r > 0, F.round(cmi / h_r, 6) + 0.0).alias(
            "influence_ratio"
        ),
    )
