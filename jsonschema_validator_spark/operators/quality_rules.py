"""Gopher/MassiveText quality-rule filtering (Rae et al. 2021,
"Scaling Language Models: ... Gopher", Appendix A — public thresholds)
as ONE pass of pure Column algebra: every rule is a cheap
length/split/filter expression over the text column, evaluated together
inside whole-stage codegen, so N rules cost one scan and zero shuffles
(the rollup's single groupBy is the only exchange). No per-row Python
(input_hint contract).

Rules implemented (doc passes iff ALL hold):
  words        50 <= word count <= 100_000
  mwl          3 <= mean word length <= 10
  symbol       ('#' + '...') occurrences / words <= 0.1
  bullet       <= 90% of lines start with a bullet
  ellipsis     <= 30% of lines end with '...'
  alpha        >= 80% of words contain an alphabetic character
  stopword     >= 2 distinct members of the required-stopword set
  dupline      duplicate-line fraction <= 0.30 (MassiveText repetition
               screen, line granularity)

The finer-grained n-gram repetition screens live in
operators/textstats.ngram_repetition; this module is the document-level
rule battery a curation pipeline runs FIRST (cheapest, highest-volume
kill). Reference analogy: none (validator); SURVEY §2.5 pipeline
envelope.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Gopher Appendix A required stopwords (public)
REQUIRED_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

_BULLETS = ("- ", "* ", "• ")


def _occurrences(text: Column, needle: str) -> Column:
    return (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit("")))) / len(needle)


def gopher_flags(text: Column) -> Column:
    """Struct of per-rule booleans (True = rule SATISFIED) plus the
    conjunction `pass` — one expression tree, no shuffle."""
    toks = F.split(text, " ")
    n_words = F.size(toks)
    mwl = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)) / F.greatest(
        n_words, F.lit(1)
    )
    symbols = _occurrences(text, "#") + _occurrences(text, "...")
    lines = F.split(text, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    bullet_frac = (
        F.size(
            F.filter(
                lines,
                lambda ln: F.lit(False)
                | ln.startswith(_BULLETS[0])
                | ln.startswith(_BULLETS[1])
                | ln.startswith(_BULLETS[2]),
            )
        )
        / n_lines
    )
    ellipsis_frac = F.size(F.filter(lines, lambda ln: ln.endswith("..."))) / n_lines
    alpha_frac = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))) / F.greatest(
        n_words, F.lit(1)
    )
    stop_hits = F.size(
        F.array_intersect(
            F.split(F.lower(text), " "), F.array(*[F.lit(s) for s in REQUIRED_STOPWORDS])
        )
    )
    dupline_frac = (F.size(lines) - F.size(F.array_distinct(lines))) / n_lines
    rules = {
        "r_words": (n_words >= 50) & (n_words <= 100_000),
        "r_mwl": (mwl >= 3) & (mwl <= 10),
        "r_symbol": (symbols / F.greatest(n_words, F.lit(1))) <= 0.1,
        "r_bullet": bullet_frac <= 0.9,
        "r_ellipsis": ellipsis_frac <= 0.3,
        "r_alpha": alpha_frac >= 0.8,
        "r_stopword": stop_hits >= 2,
        "r_dupline": dupline_frac <= 0.3,
    }
    all_pass = None
    for c in rules.values():
        all_pass = c if all_pass is None else (all_pass & c)
    return F.struct(
        *[c.alias(k) for k, c in rules.items()], all_pass.alias("pass")
    )


def gopher_report(df: DataFrame, text_col: str, by: str) -> DataFrame:
    """Per-`by` rollup: n_docs, n_pass, and a failure count per rule —
    all conditional sums over the ONE flag struct (single scan, single
    exchange)."""
    flags = gopher_flags(F.col(text_col))
    with_flags = df.select(F.col(by), flags.alias("fl"))
    rule_keys = [f for f in with_flags.schema["fl"].dataType.names if f != "pass"]
    return (
        with_flags.groupBy(by)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("fl.pass").cast("long")).alias("n_pass"),
            *[
                F.sum((~F.col(f"fl.{k}")).cast("long")).alias(f"n_fail_{k[2:]}")
                for k in rule_keys
            ],
        )
        .orderBy(by)
    )


def sla_breach_backtest(
    df: DataFrame,
    group: str,
    ts: str,
    breach,
    p0: float,
    chi2_crit_1: float = 3.841,
) -> DataFrame:
    """Kupiec + Christoffersen backtest of a daily breach budget — the
    risk-management pair (Kupiec 1995 proportion-of-failures,
    Christoffersen 1998 independence), re-aimed at data SLAs: a
    contract that says "the daily violation threshold may be breached
    on p0 of days" fails in two DIFFERENT ways, and pass_rate screens
    see neither precisely. Kupiec's likelihood ratio tests the breach
    FREQUENCY:

        LR_pof = -2 ln[ (1-p0)^(n-x) p0^x ] + 2 ln[ (1-ph)^(n-x) ph^x ]

    (ph = x/n; each ~ chi2(1) under its null). Christoffersen tests
    breach CLUSTERING via the first-order Markov chain of the daily
    breach sequence:

        LR_ind = -2 ln[ (1-ph)^(n00+n10) ph^(n01+n11) ]
                 + 2 ln[ (1-p01)^n00 p01^n01 (1-p11)^n10 p11^n11 ]

    (p01 = n01/(n00+n01), p11 = n11/(n10+n11); ph here is the
    transition-pooled breach rate) — a budget met on average but
    breached in week-long runs passes Kupiec and fails here, and
    clustered breaches are what actually page people. 0 ln 0 terms
    are 0 by convention; LR_ind is NULL when the sequence never
    leaves one state (no transitions of one kind to test — stated).

    ``breach`` is a per-ROW 0/1 Column; a day counts as a breach day
    when its mean breach rate exceeds ``p0`` — and under a calibrated
    p0-quantile budget, breach DAYS themselves occur with probability
    p0, which is the classic VaR setup where p0 plays both roles
    (stated; pass a different day-level rule by pre-aggregating and
    feeding the daily flag as the per-row column). One shuffle to the
    daily relation; one lag window for the transition counts.

    Returns per group: (group, n_days, n_breach_days, breach_share,
    lr_pof, pof_reject, n01, n11, lr_ind, ind_reject) with rejects at
    the pinned chi2(1) critical.
    """
    from pyspark.sql import Window as W

    daily = (
        df.select(
            F.col(group).alias("g"),
            F.date_format(F.date_trunc("day", F.col(ts)), "yyyy-MM-dd").alias(
                "day"
            ),
            breach.cast("double").alias("b"),
        )
        .groupBy("g", "day")
        .agg((F.avg("b") > p0).cast("int").alias("e"))
    )
    w = W.partitionBy("g").orderBy("day")
    seq = daily.select(
        "g", "e", F.lag("e").over(w).alias("pe")
    )

    def _xlog(x, p):
        # x * ln(p) with 0 ln 0 = 0
        return F.when(x > 0, x * F.log(p)).otherwise(0.0)

    agg = seq.groupBy("g").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("e").cast("double").alias("x"),
        F.sum(((F.col("pe") == 0) & (F.col("e") == 0)).cast("int"))
        .cast("double")
        .alias("n00"),
        F.sum(((F.col("pe") == 0) & (F.col("e") == 1)).cast("int"))
        .cast("double")
        .alias("n01"),
        F.sum(((F.col("pe") == 1) & (F.col("e") == 0)).cast("int"))
        .cast("double")
        .alias("n10"),
        F.sum(((F.col("pe") == 1) & (F.col("e") == 1)).cast("int"))
        .cast("double")
        .alias("n11"),
    )
    n, x = F.col("n"), F.col("x")
    ph = x / n
    lr_pof = (
        -2.0
        * (_xlog(n - x, F.lit(1.0 - p0)) + _xlog(x, F.lit(p0)))
        + 2.0 * (_xlog(n - x, 1.0 - ph) + _xlog(x, ph))
    )
    n00, n01 = F.col("n00"), F.col("n01")
    n10, n11 = F.col("n10"), F.col("n11")
    nt = n00 + n01 + n10 + n11
    pht = (n01 + n11) / nt
    p01 = n01 / (n00 + n01)
    p11 = n11 / (n10 + n11)
    have_both = ((n00 + n01) > 0) & ((n10 + n11) > 0) & (nt > 0)
    lr_ind = F.when(
        have_both,
        -2.0 * (_xlog(n00 + n10, 1.0 - pht) + _xlog(n01 + n11, pht))
        + 2.0
        * (
            _xlog(n00, 1.0 - p01)
            + _xlog(n01, p01)
            + _xlog(n10, 1.0 - p11)
            + _xlog(n11, p11)
        ),
    )
    return agg.select(
        F.col("g").alias(group),
        n.cast("long").alias("n_days"),
        x.cast("long").alias("n_breach_days"),
        F.round(ph, 6).alias("breach_share"),
        F.round(lr_pof, 6).alias("lr_pof"),
        (lr_pof > chi2_crit_1).alias("pof_reject"),
        n01.cast("long").alias("n01"),
        n11.cast("long").alias("n11"),
        F.round(lr_ind, 6).alias("lr_ind"),
        F.when(lr_ind.isNotNull(), lr_ind > chi2_crit_1).alias(
            "ind_reject"
        ),
    )
