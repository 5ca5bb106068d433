"""Lexical search scoring — BM25 over a tokenized document corpus for
a fixed query-term list: the retrieval baseline every RAG / training-
data relevance pipeline measures embedding retrievers against (the
lexical side of the hybrid fusion in operators/similarity.rrf_fuse).

Reference parity note: outside the reference validator's scope
(macisamuele/jsonschema-validator validates keywords); this is the
analytics tier of SURVEY.md §2.

Scale: tokenization is zero-shuffle Column algebra; the explode is
filtered to QUERY TERMS ONLY before any aggregation, so the shuffled
relation is O(docs x |query|), never O(docs x doc-length). Corpus
constants (N, avgdl) and the per-term df relation are O(1)/O(|query|)
and broadcast-join back — the big side never moves twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 score of every matching document for ``query_terms``.

    Tokens are ``[a-z]+`` runs of the lowercased text — the same
    deterministic tokenizer contract as textstats (documented so the
    SQL oracle replays it verbatim). Document length dl counts ALL
    tokens; only query-term postings are exploded/shuffled. idf uses
    the standard Robertson-Sparck-Jones form ln(1 + (N - df + .5) /
    (df + .5)), which is positive even for terms in most documents.
    Documents matching no query term are absent (score 0 rows at
    corpus scale would be the whole corpus). NULL text never matches.

    Returns (id_col, n_terms, score), score rounded to 6 — rank with
    an explicit (score DESC, id) sort so ties break deterministically.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted({t.lower() for t in query_terms})
    toks = F.regexp_extract_all(F.lower(F.coalesce(F.col(text), F.lit(""))), F.lit("[a-z]+"), 0)
    base = df.select(F.col(id_col).alias("__id"), toks.alias("__toks")).withColumn(
        "__dl", F.size("__toks")
    )
    corpus = base.agg(
        F.count(F.lit(1)).alias("__n"), F.avg("__dl").alias("__avgdl")
    )
    postings = (
        base.select("__id", "__dl", F.explode("__toks").alias("__t"))
        .filter(F.col("__t").isin(terms))
        .groupBy("__id", "__dl", "__t")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    dfreq = postings.groupBy("__t").agg(F.countDistinct("__id").alias("__df"))
    scored = (
        postings.join(F.broadcast(dfreq), "__t")
        .join(F.broadcast(corpus), F.lit(True))
        .withColumn(
            "__idf",
            F.log(
                F.lit(1.0)
                + (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
            ),
        )
        .withColumn(
            "__s",
            F.col("__idf")
            * (F.col("__tf") * (k1 + 1.0))
            / (
                F.col("__tf")
                + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl"))
            ),
        )
    )
    return (
        scored.groupBy(F.col("__id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.round(F.sum("__s"), 6).alias("score"),
        )
    )
