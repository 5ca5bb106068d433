"""Single-shuffle funnel analysis — ordered-step conversion
("signup -> view -> click -> purchase") per subject: how many
subjects reached step k by performing the k steps IN ORDER, each
STRICTLY after the previous one (and optionally within a window of
step 1). The fold-based sibling of operators/sessions.funnel, which
is the skew-robust default (k tiny-relation joins, nothing collected
per group). Choose THIS variant when k is large (k joins = k
shuffles; the fold is always exactly one) or when you need what the
join form can't express: strictly-after steps (>= there lets one
timestamp satisfy several steps), repeated step names, and the
entry-anchored window (there the window chains off each previous
step).

Reference parity note: outside the reference validator's scope
(macisamuele/jsonschema-validator validates keywords); this is the
analytics tier of SURVEY.md §2.

Scale: ONE shuffle. Events are pre-filtered to funnel steps and
pre-projected to slim (subject, ts, step) rows, collected sorted per
subject, and greedy-matched by a JVM ``aggregate`` fold over a
k-slot state array — no per-row Python. The skew study's warning
about per-group collects applies: the collected array is bounded by
the subject's FUNNEL-STEP event count (already far below its raw
event count), and at 10^12-turn scale a whale subject needs upstream
pre-dedup to one event per (subject, step, coarse time bucket) —
sessions.funnel needs no such guard, which is why it stays the
default. The final rollup
is one global aggregation of k conditional sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_fold(
    df: DataFrame,
    steps: list[str],
    subject: str = "user_id",
    step: str = "event_type",
    ts: str = "ts",
    within_seconds: float | None = None,
) -> DataFrame:
    """Ordered-funnel conversion counts for ``steps``.

    Greedy earliest-completion semantics (the standard funnel
    contract): t_1 is the subject's earliest step-1 event; t_k is the
    earliest step-k event STRICTLY after t_{k-1} — ties at the same
    timestamp do not advance the funnel. With ``within_seconds``,
    every t_k (k > 1) must also satisfy t_k <= t_1 + within — the
    conversion window is anchored at funnel entry, so a subject can
    convert only through a chain that completes inside the window of
    its earliest step-1 event (greedy t_1; later entries are not
    retried, which keeps the semantics one-pass and deterministic —
    documented divergence from backtracking "any entry" funnels).

    Repeated step names in ``steps`` are allowed ("view -> view" =
    two distinct views); empty/duplicate-free validation is on the
    caller. Rows with NULL subject, ts, or step are excluded. Returns
    one row per funnel position: (step_idx 1-based, step, n_reached,
    conversion vs step 1 rounded to 6, mean_hours_to_step among
    reachers rounded to 6 — exactly 0.0 at step 1 by definition, NULL
    when nobody reached the step).
    """
    if not steps:
        raise ValueError("steps must be a non-empty ordered list")
    k = len(steps)
    names = F.array(*[F.lit(s) for s in steps])
    ev = (
        df.filter(
            F.col(subject).isNotNull()
            & F.col(ts).isNotNull()
            & F.col(step).isin(steps)
        )
        .select(
            F.col(subject).alias("__u"),
            # exact integer microseconds (sessions.py convention);
            # unix_micros rejects TIMESTAMP_NTZ, hence the cast
            F.unix_micros(F.col(ts).cast("timestamp")).alias("__ts"),
            F.col(step).alias("__s"),
        )
    )
    # one shuffle: per-subject sorted (ts, step-name) structs
    per_subj = ev.groupBy("__u").agg(
        F.sort_array(F.collect_list(F.struct("__ts", "__s"))).alias("__evs")
    )

    init = F.array([F.lit(None).cast("long") for _ in range(k)])

    def _advance(state, e):
        # 0-based slot i fills when: its step name matches, it is
        # empty, the previous slot is filled with a strictly earlier
        # time (slot 0 has no previous), and — with a window — the
        # event lies within ``within`` of the slot-0 entry.  At most
        # one slot is ever eligible per event, even with repeated step
        # names: a later duplicate slot requires its predecessor chain
        # filled, which forces the earlier duplicate slot filled too.
        # Sorted input makes the first fill the earliest valid one.
        def _slot_ok(v, i):
            prev_ok = F.when(i == 0, F.lit(True)).otherwise(
                F.element_at(state, i.cast("int")).isNotNull()
                & (e["__ts"] > F.element_at(state, i.cast("int")))
            )
            win_ok = (
                F.lit(True)
                if within_seconds is None
                else F.when(i == 0, F.lit(True)).otherwise(
                    F.element_at(state, 1).isNotNull()
                    & (
                        e["__ts"]
                        <= F.element_at(state, 1)
                        + F.lit(int(within_seconds * 1_000_000))
                    )
                )
            )
            return (
                (F.element_at(names, (i + 1).cast("int")) == e["__s"])
                & v.isNull()
                & prev_ok
                & win_ok
            )

        return F.transform(
            state,
            lambda v, i: F.when(_slot_ok(v, i), e["__ts"]).otherwise(v),
        )

    matched = per_subj.select(
        "__u", F.aggregate("__evs", init, _advance).alias("__t")
    )
    agg = matched.agg(
        *[
            F.sum(F.element_at("__t", j).isNotNull().cast("long")).alias(f"__n{j}")
            for j in range(1, k + 1)
        ],
        *[
            F.avg(
                (F.element_at("__t", j) - F.element_at("__t", 1))
                / 3_600_000_000.0
            ).alias(f"__h{j}")
            for j in range(2, k + 1)
        ],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(j).alias("step_idx"),
                F.lit(steps[j - 1]).alias("step"),
                F.col(f"__n{j}").alias("n_reached"),
                F.round(F.try_divide(F.col(f"__n{j}"), F.col("__n1")), 6).alias(
                    "conversion"
                ),
                (
                    F.when(F.col("__n1") > 0, F.lit(0.0))
                    if j == 1
                    else F.round(F.col(f"__h{j}"), 6)
                ).alias("mean_hours_to_step"),
            )
            for j in range(1, k + 1)
        ]
    )
    return (
        agg.select(F.explode(rows).alias("r"))
        .select("r.*")
        .orderBy("step_idx")
    )
