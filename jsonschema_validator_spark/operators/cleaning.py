"""Corpus-frequency text cleaning: boilerplate-line removal.

Web-scale training corpora carry per-site boilerplate (cookie banners,
nav menus, "all rights reserved" footers) repeated across thousands of
pages; C4/RefinedWeb-style pipelines drop any LINE that recurs in many
distinct documents. This is line-level dedup ACROSS the corpus —
distinct from within-document repetition (textstats.ngram_repetition)
and whole-document dedup (operators/dedup).

Scale shape (100 TB):
- Frequency pass: lines are keyed by a 64-bit hash, so shuffle 1
  carries (hash, doc_id) pairs — never line text — with map-side
  partial distinct collapsing each document's repeats.
- The boilerplate relation (lines in >= min_docs distinct docs) is at
  most corpus_lines / min_docs rows — small by construction — and
  joins back to the exploded lines as a broadcast LEFT ANTI join (AQE
  picks broadcast from its actual size; no driver collect).
- Reassembly is one groupBy(doc_id) carrying surviving line text — the
  unavoidable doc-keyed exchange; ordering is restored inside each row
  via sort_array over (pos, line) structs, not a window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def line_frequency(
    df: DataFrame, id_col: str, text_col: str, sep: str = "\n"
) -> DataFrame:
    """(line_hash, n_docs): distinct-document frequency of every line.
    The shuffle carries 16 bytes per (line, doc) pair, not the text."""
    lines = df.select(
        F.col(id_col).alias("__doc"),
        F.explode(F.split(F.col(text_col), sep)).alias("line"),
    )
    return lines.groupBy(F.xxhash64("line").alias("line_hash")).agg(
        F.count_distinct("__doc").alias("n_docs")
    )


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_docs: int = 3,
    sep: str = "\n",
) -> DataFrame:
    """Drop every line that occurs in >= ``min_docs`` DISTINCT documents
    and reassemble each document's remaining lines in original order.

    Output: all input columns except ``text_col``, plus ``clean_text``
    (surviving lines joined by ``sep``; empty string when every line
    was boilerplate), ``n_lines`` and ``n_removed``. Hash-keyed
    equality: two distinct lines colliding in xxhash64 would be
    conflated (~2^-64 per pair — the standard trade documented across
    the dedup operators). NULL text passes through with clean_text NULL
    and zero counts (nothing to scrub — rows never drop).
    """
    reserved = {"__pos", "__line", "__lh", "n_docs", "line_hash"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"input contains reserved cleaning columns: {sorted(reserved)}"
        )
    boiler = line_frequency(df, id_col, text_col, sep).filter(
        F.col("n_docs") >= min_docs
    )
    exploded = df.select(
        *df.columns,
        F.posexplode(F.split(F.col(text_col), sep)).alias("__pos", "__line"),
    ).withColumn("__lh", F.xxhash64("__line"))
    kept = exploded.join(
        boiler, exploded["__lh"] == boiler["line_hash"], "left_anti"
    )
    carry = [c for c in df.columns if c not in (id_col, text_col)]
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("__pos", "__line"))),
                lambda s: s["__line"],
            ),
            sep,
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    # left join from the input: a document whose every line was
    # boilerplate (or whose text is NULL) must still appear
    base = df.select(
        id_col,
        *carry,
        F.when(
            F.col(text_col).isNotNull(), F.size(F.split(F.col(text_col), sep))
        ).alias("__total"),
    )
    return base.join(rebuilt, id_col, "left").select(
        id_col,
        *carry,
        F.when(
            F.col("__total").isNotNull(), F.coalesce("clean_text", F.lit(""))
        ).alias("clean_text"),
        F.coalesce("__n_kept", F.lit(0)).alias("n_kept"),
        (F.coalesce("__total", F.lit(0)) - F.coalesce("__n_kept", F.lit(0))).alias(
            "n_removed"
        ),
    )


def normalize_unicode(
    df: DataFrame,
    text_col: str,
    out_col: str = "norm_text",
    strip_controls: bool = True,
    collapse_whitespace: bool = False,
) -> DataFrame:
    """Unicode NFC normalization + control-character hygiene — the
    canonicalization pass every multilingual curation pipeline runs
    before hashing, dedup, or tokenization (the same logical content
    arrives from the web in composed AND decomposed forms, so every
    downstream equality — exact dedup keys, winnowing fingerprints, BPE
    merges — silently fractures without it).

    NFC runs as an Arrow-batched pandas UDF over ``unicodedata`` — a
    genuine Python-boundary case (Spark has no codepoint-normalization
    builtin) and exactly the seam the multimodal decoders use: batches
    stream through the worker, never a per-row Python call. Control
    stripping (C0/C1 minus tab/newline) and optional whitespace
    collapse are plain JVM regexp stages around it. DuckDB's
    ``nfc_normalize`` + ``regexp_replace`` replay the whole pipeline,
    so the operator is SQL-oracle-able end-to-end.

    Output: input columns + ``out_col`` + ``changed`` (normalization
    altered the string — the corpus-health metric worth tracking over
    time; a sudden jump means an upstream producer changed encoder).
    NULL text stays NULL with changed = false.
    """
    import pandas as pd

    def _nfc_fn(s):
        import unicodedata

        return s.map(
            lambda t: unicodedata.normalize("NFC", t) if t is not None else None
        )

    # real (non-stringified) annotations: `from __future__ import
    # annotations` turns inline hints into strings pyspark can't resolve
    _nfc_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _nfc = F.pandas_udf(_nfc_fn, "string")

    out = F.col(text_col)
    if strip_controls:
        out = F.regexp_replace(out, r"[\x00-\x08\x0b-\x1f\x7f-\x9f]", "")
    out = _nfc(out)
    if collapse_whitespace:
        out = F.regexp_replace(F.trim(out), r"[ \t]+", " ")
    return df.withColumn(out_col, out).withColumn(
        "changed",
        F.coalesce(F.col(out_col) != F.col(text_col), F.lit(False)),
    )


def impute(
    df: DataFrame,
    value_col: str,
    group_col: str,
    strategy: str = "median",
) -> DataFrame:
    """Group-conditional imputation of a numeric column with a full
    audit trail: NULLs fill with the group's exact median ('median'),
    mean ('mean'), or most frequent value ('mode', ties to the
    smallest) — group-conditional because a global fill value drags
    every imputed row toward the dominant group's distribution, which
    is precisely the bias a downstream drift screen then false-alarms
    on.

    Adds ``<value_col>__filled`` (original where present, fill value
    where NULL) and ``<value_col>__imputed`` (audit flag — imputation
    without a flag silently manufactures data; every downstream
    consumer can exclude or weight the repaired rows). Groups whose
    values are ALL NULL have no statistic: filled stays NULL and the
    flag stays false — refusing to invent a number, the honest repair.
    Fill statistics compute per group in one aggregation (mode via the
    (count, value) struct-max on the distinct-value relation) and
    broadcast back; the data side never shuffles.
    """
    v = F.col(value_col).cast("double")
    if strategy == "median":
        stat = F.percentile(v, F.lit(0.5))
        fills = df.groupBy(F.col(group_col).alias("__g")).agg(
            stat.alias("__fill")
        )
    elif strategy == "mean":
        fills = df.groupBy(F.col(group_col).alias("__g")).agg(
            F.avg(v).alias("__fill")
        )
    elif strategy == "mode":
        counts = (
            df.filter(v.isNotNull())
            .groupBy(F.col(group_col).alias("__g"), v.alias("__v"))
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        fills = counts.groupBy("__g").agg(
            F.max(
                F.struct(
                    F.col("__c").alias("c"), (-F.col("__v")).alias("nv")
                )
            ).alias("__t")
        ).select("__g", (-F.col("__t.nv")).alias("__fill"))
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
    joined = df.join(
        F.broadcast(fills),
        F.col(group_col).eqNullSafe(F.col("__g")),
        "left",
    )
    imputed = v.isNull() & F.col("__fill").isNotNull()
    return (
        joined.withColumn(
            f"{value_col}__filled", F.coalesce(v, F.col("__fill"))
        )
        .withColumn(f"{value_col}__imputed", imputed)
        .drop("__g", "__fill")
    )


def mojibake_screen(
    df: DataFrame,
    text_col: str,
    group: str | None = None,
) -> DataFrame:
    """Encoding-damage census — the screen normalize_unicode cannot
    replace: normalization REPAIRS representable text, this DETECTS
    the irreparable kinds that only re-ingestion fixes. Three
    signatures, each a pure regexp/contains count (JVM-side, no UDF):

    - replacement chars (U+FFFD): a decoder already gave up upstream;
    - C1 control chars (U+0080-U+009F): the classic windows-1252-
      read-as-latin-1 tell;
    - UTF-8-read-as-latin-1 digraphs: U+00C2/C3/C5 followed by a
      char in the re-decoded continuation range U+00A0-U+00BF or a
      CP1252 remap (curly quotes, ellipsis, euro) — the "A-tilde + symbol" class
      of double-decoded text).

    One aggregation; per-group signature counts plus the damaged
    share. Returns (group?, n_docs, fffd_docs, c1_docs,
    double_decode_docs, damaged_docs, damaged_rate); NULL texts are
    excluded.
    """
    t = F.col(text_col)
    gcols = [group] if group else []
    fffd = t.contains("�")
    c1 = t.rlike("[\\x80-\\x9f]")
    dbl = t.rlike(
        "[\\u00c2\\u00c3\\u00c5]"
        "[\\u00a0-\\u00bf\\u2018\\u2019\\u201c\\u201d\\u2026\\u20ac]"
    )
    damaged = fffd | c1 | dbl
    agg = df.filter(t.isNotNull()).groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(fffd.cast("long")).alias("fffd_docs"),
        F.sum(c1.cast("long")).alias("c1_docs"),
        F.sum(dbl.cast("long")).alias("double_decode_docs"),
        F.sum(damaged.cast("long")).alias("damaged_docs"),
    )
    return agg.select(
        *gcols,
        "n_docs",
        "fffd_docs",
        "c1_docs",
        "double_decode_docs",
        "damaged_docs",
        F.round(
            F.col("damaged_docs") / F.col("n_docs").cast("double"), 6
        ).alias("damaged_rate"),
    )
