"""Sequence packing — fill fixed token-budget training sequences with
documents (greedy first-fit in deterministic order), the standard step
between curation and tokenized-batch writing in an LLM data pipeline.

Scale shape: packing is sequential WITHIN a bin stream (a true
recurrence — bin boundaries depend on every prior document) but
trivially parallel ACROSS shards, so the operator shards by hash first
(one shuffle), then runs the greedy scan per shard inside an
Arrow-batched ``applyInPandas``. The per-shard scan is a plain integer
recurrence over the token-count array (it cannot be vectorized, but it
touches two ints per document — the Arrow transfer, not this loop, is
the boundary cost). Shard count is the parallelism knob: 10^5 shards
at 100 TB keeps every shard's group small and the state O(1).

Semantics (pinned by the DuckDB recursive-CTE oracle
``packing_documents`` and the pytest reference):
- documents are processed in ascending ``order_col`` within a shard;
- a document goes into the current bin unless adding it would exceed
  ``budget`` AND the bin is non-empty; then it opens the next bin;
- an oversize document (> budget tokens) occupies a bin alone."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    order_col: str,
    n_shards: int = 64,
    shard_col: str | None = None,
    strategy: str = "arrival",
) -> DataFrame:
    """Returns the input columns + ``shard`` + ``bin_idx`` (0-based per
    shard). Deterministic: shard = xxhash64(order_col) % n_shards (or a
    caller-supplied ``shard_col`` — e.g. an engine-portable arithmetic
    shard when an external system must reproduce the layout).

    ``strategy`` picks the per-shard packing discipline — all three are
    deterministic and partition-independent; they trade waste against
    replay simplicity:

    - ``"arrival"``: next-fit in ascending order_col (stream-friendly:
      preserves curriculum/temporal order inside bins; layout depends
      on upstream arrival order).
    - ``"size_desc"``: next-fit after sorting (tokens DESC, order_col)
      — a CANONICAL layout: a pure function of the token multiset (+
      tiebreak key), reproducible no matter how upstream stages permute
      the corpus. NOT a waste guarantee — next-fit-decreasing can
      strand MORE than arrival on adversarial mixes (measured: twenty
      300s sorted adjacent each strand 200 where alternating 300/180
      arrival pairs to 480; on the contract corpus the two tie
      exactly). Still a linear scan, so the SQL oracle replays it with
      the same recursive CTE as arrival under a different ORDER BY.
    - ``"first_fit_desc"``: classic FFD (sorted desc, each doc into the
      FIRST open bin with room; 11/9 OPT + 6/9 guarantee) — the real
      waste reduction, but first-fit's bin scan has no SQL replay, so
      its contract is invariant-based (per-bin sum <= budget, same doc
      multiset, never more bins than either next-fit) rather than
      hash-exact.
    """
    import pandas as pd

    if strategy not in ("arrival", "size_desc", "first_fit_desc"):
        raise ValueError(f"unknown packing strategy {strategy!r}")

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    out_schema += ", shard int, bin_idx bigint"

    budget_ = int(budget)

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        if strategy == "arrival":
            pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        else:
            pdf = pdf.sort_values(
                [token_col, order_col], ascending=[False, True], kind="mergesort"
            ).reset_index(drop=True)
        toks = pdf[token_col].to_numpy()
        bins = []
        if strategy == "first_fit_desc":
            space: list[int] = []  # remaining room per open bin
            for t in toks:
                t = int(t)
                for i, room in enumerate(space):
                    if t <= room:
                        space[i] = room - t
                        bins.append(i)
                        break
                else:
                    space.append(max(budget_ - t, 0))  # oversize: alone
                    bins.append(len(space) - 1)
        else:
            bin_idx, running = 0, 0
            for t in toks:
                t = int(t)
                if running > 0 and running + t > budget_:
                    bin_idx += 1
                    running = 0
                running += t
                bins.append(bin_idx)
        pdf["bin_idx"] = bins
        return pdf

    if shard_col is not None:
        sharded = df.withColumn("shard", F.col(shard_col).cast("int"))
    else:
        sharded = df.withColumn(
            "shard", F.pmod(F.xxhash64(F.col(order_col)), F.lit(n_shards)).cast("int")
        )
    return sharded.groupBy("shard").applyInPandas(_pack, out_schema)


def packing_stats(packed: DataFrame, token_col: str) -> DataFrame:
    """Per-bin rollup: (shard, bin_idx, n_docs, sum_tokens)."""
    return packed.groupBy("shard", "bin_idx").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).alias("sum_tokens"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Split each document into fixed-size token windows with overlap —
    the context-length chunking step upstream of packing/tokenization
    (stride = chunk_tokens - overlap; the last window may be short; a
    document shorter than one chunk yields exactly one chunk).

    Returns (id_col, chunk_idx, n_chunk_tokens, chunk) — one output row
    per window, chunk re-joined on single spaces. NULL-text documents
    yield no chunks (they are filtered, not emitted as phantom empty
    windows); empty-string text yields one empty chunk, mirroring
    split semantics.

    Scale shape: pure Column algebra, ZERO shuffles — tokens are
    projected to a materialized column FIRST so the transform lambda
    captures an attribute reference, then each window is one
    F.slice; posexplode fans out. (Capturing the raw split() expression
    in the lambda would re-tokenize per window — the O(w^2/stride)
    HOF-closure trap measured at 188s->4.1s on the curation pipeline.)
    Output rows are ~chunk/stride times the input rows; row width is
    bounded by chunk_tokens, so downstream partition sizing is
    predictable.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap=}")
    stride = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(F.col("__toks"))
    # ceil((n - overlap) / stride), floored at 1: number of windows whose
    # START is inside the document (last window may run past the end)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int"), F.lit(1)
    )
    windows = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(F.col("__toks"), i * stride + 1, chunk_tokens),
    )
    return (
        df.filter(F.col(text_col).isNotNull())
        .withColumn("__toks", toks)
        .select(F.col(id_col), F.posexplode(windows).alias("chunk_idx", "__w"))
        .select(
            id_col,
            "chunk_idx",
            F.size("__w").alias("n_chunk_tokens"),
            F.concat_ws(" ", "__w").alias("chunk"),
        )
    )


def padding_waste(
    df: DataFrame,
    token_col: str,
    bucket_edges: list[int],
    group_col: str | None = None,
) -> DataFrame:
    """Length-bucketing efficiency report: how much batch compute a
    trainer would burn on pad tokens if sequences are bucketed by length
    and padded to the bucket cap (the standard bucketed-batching layout;
    reference analog: the length-constraint keywords min/maxLength are
    the VALIDATION of sequence length — this is the COST of its
    distribution).

    Semantics: each sequence lands in the bucket with the smallest cap
    >= its length; sequences longer than the largest cap are truncated
    to it (overflow bucket = last cap, truncated tokens reported, never
    silently dropped). Per (group?, bucket_cap):

      n_seqs, sum_tokens (post-truncation), padded_tokens
      (= cap*n - sum), truncated_tokens, waste_frac
      (= padded / (cap*n) — the fraction of the bucket's batch
      compute spent on padding).

    Scale shape: the O(k) cap chain is a literal CASE fold on the scan
    (no join, no per-row search), then ONE partial+final aggregation on
    O(groups x k) keys — skew-immune per the round-3 skew study. Exact,
    so the report is SQL-oracle-able verbatim.
    """
    edges = sorted(set(int(e) for e in bucket_edges))
    if not edges or edges[0] <= 0:
        raise ValueError(f"bucket_edges must be positive ints, got {bucket_edges!r}")
    n = F.col(token_col).cast("long")
    cap: Column = F.lit(edges[-1])
    # innermost = largest; outermost when checks the smallest cap first
    for e in reversed(edges):
        cap = F.when(n <= e, F.lit(e)).otherwise(cap)
    keys = [group_col] if group_col else []
    kept = F.least(n, F.lit(edges[-1]))
    return (
        df.filter(n.isNotNull())
        .select(
            *keys,
            cap.alias("bucket_cap"),
            kept.alias("__kept"),
            F.greatest(n - edges[-1], F.lit(0)).alias("__trunc"),
        )
        .groupBy(*keys, "bucket_cap")
        .agg(
            F.count(F.lit(1)).alias("n_seqs"),
            F.sum("__kept").alias("sum_tokens"),
            (F.col("bucket_cap") * F.count(F.lit(1)) - F.sum("__kept")).alias(
                "padded_tokens"
            ),
            F.sum("__trunc").alias("truncated_tokens"),
            F.round(
                (F.col("bucket_cap") * F.count(F.lit(1)) - F.sum("__kept"))
                / (F.col("bucket_cap") * F.count(F.lit(1))),
                6,
            ).alias("waste_frac"),
        )
    )
