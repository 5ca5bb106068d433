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
