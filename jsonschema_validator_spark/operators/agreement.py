"""Inter-annotator agreement — the label-QA gate in front of any
supervised / preference training set: raw percent agreement rewards
raters who both spam the majority class, Cohen's kappa corrects for
exactly that chance agreement, so a kappa floor is the contract you put
on a labeling vendor.

Reference parity note: the reference validator (macisamuele/
jsonschema-validator) has no agreement operators — this belongs to the
training-data-pipeline surface the engine adds on top of keyword
validation (same tier as dedup/sampling/quality in SURVEY.md §2).

Scale: ONE shuffle — ``groupBy(group, a, b).count()`` — reduces the raw
table to the O(groups x k^2) confusion relation; percent agreement,
per-rater marginals, and the chance-agreement dot product are all
derived from that aggregate (never a second corpus pass), so the
operator's cost is one map-side-combinable count at any input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cohen_kappa(
    df: DataFrame,
    rater_a: str,
    rater_b: str,
    group: str | None = None,
) -> DataFrame:
    """Per-group Cohen's kappa between two categorical label columns.

    Returns (group?, n, po, pe, kappa) where po is observed agreement,
    pe the chance agreement implied by the two raters' marginals, and
    kappa = (po - pe) / (1 - pe). Rows where EITHER label is NULL are
    excluded (an unlabeled item is not a rating, and counting it as a
    sentinel category would manufacture agreement); degenerate groups
    where pe = 1 (both raters constant) yield NULL kappa via
    try_divide rather than a division error.
    """
    gcols = [group] if group else []
    labeled = df.filter(
        F.col(rater_a).isNotNull() & F.col(rater_b).isNotNull()
    )
    cm = labeled.groupBy(
        *gcols,
        F.col(rater_a).cast("string").alias("__a"),
        F.col(rater_b).cast("string").alias("__b"),
    ).agg(F.count(F.lit(1)).alias("__n"))

    # everything below runs on the O(groups x k^2) confusion relation
    totals = cm.groupBy(*gcols).agg(
        F.sum("__n").alias("n"),
        F.sum(F.when(F.col("__a") == F.col("__b"), F.col("__n")).otherwise(0)).alias(
            "__agree"
        ),
    )
    marg_a = cm.groupBy(*gcols, F.col("__a").alias("__c")).agg(
        F.sum("__n").alias("__na")
    )
    marg_b = cm.groupBy(*gcols, F.col("__b").alias("__c")).agg(
        F.sum("__n").alias("__nb")
    )
    chance = (
        marg_a.join(marg_b, [*gcols, "__c"])
        .groupBy(*gcols)
        .agg(F.sum(F.col("__na").cast("double") * F.col("__nb")).alias("__dot"))
    )
    joined = totals.join(chance, gcols) if gcols else totals.crossJoin(chance)
    po = F.col("__agree").cast("double") / F.col("n")
    pe = F.col("__dot") / (F.col("n").cast("double") * F.col("n"))
    return joined.select(
        *gcols,
        "n",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round(F.try_divide(po - pe, F.lit(1.0) - pe), 6).alias("kappa"),
    )


def fleiss_kappa(
    df: DataFrame,
    item: str,
    label: str,
    n_raters: int,
    group: str | None = None,
) -> DataFrame:
    """Per-group Fleiss' kappa over one-row-per-RATING input
    (item, label) — the m-rater generalization of Cohen's kappa for
    labeling pools where each item is rated by ``n_raters`` annotators
    (not necessarily the same ones, which is exactly Fleiss' setting).

    Items whose rating count differs from ``n_raters`` are EXCLUDED and
    counted in n_excluded — Fleiss' P_i is undefined off the fixed-n
    design, and silently mixing counts would skew chance agreement.
    NULL labels are dropped first (an abstention is not a rating), so
    an item with an abstaining rater lands in n_excluded. Degenerate
    groups (all raters unanimous on one category everywhere -> pe = 1)
    yield NULL kappa via try_divide.

    Scale: ONE shuffle to the (group, item, label) count relation;
    P_i, the category marginals p_j, and kappa are all rollups of that
    aggregate. Returns (group?, n_items, n_excluded, pbar, pe, kappa).
    """
    gcols = [group] if group else []
    rated = df.filter(F.col(label).isNotNull())
    c = rated.groupBy(
        *gcols, F.col(item).alias("__i"), F.col(label).cast("string").alias("__l")
    ).agg(F.count(F.lit(1)).alias("__n"))
    per_item = c.groupBy(*gcols, "__i").agg(
        F.sum("__n").alias("__ni"),
        F.sum(F.col("__n") * F.col("__n")).alias("__sq"),
    )
    n = float(n_raters)
    kept = per_item.filter(F.col("__ni") == n_raters).withColumn(
        "__pi", (F.col("__sq") - n) / (n * (n - 1.0))
    )
    pbar = kept.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n_items"), F.avg("__pi").alias("__pbar")
    )
    excluded = per_item.filter(F.col("__ni") != n_raters).groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n_excluded")
    )
    # category marginals over KEPT items only (the design Fleiss assumes)
    kept_counts = c.join(
        kept.select(*gcols, "__i"), [*gcols, "__i"]
    )
    pj = kept_counts.groupBy(*gcols, "__l").agg(F.sum("__n").alias("__cj"))
    pe = pj.groupBy(*gcols).agg(
        F.sum(F.col("__cj") * F.col("__cj")).alias("__sqj"),
        F.sum("__cj").alias("__tot"),
    )
    if gcols:
        joined = pbar.join(pe, gcols).join(excluded, gcols, "left")
    else:
        joined = pbar.crossJoin(pe).join(excluded, F.lit(True), "left")
    pe_col = F.col("__sqj") / (F.col("__tot").cast("double") * F.col("__tot"))
    return joined.select(
        *gcols,
        "n_items",
        F.coalesce(F.col("n_excluded"), F.lit(0)).alias("n_excluded"),
        F.round("__pbar", 6).alias("pbar"),
        F.round(pe_col, 6).alias("pe"),
        F.round(
            F.try_divide(F.col("__pbar") - pe_col, F.lit(1.0) - pe_col), 6
        ).alias("kappa"),
    )


def krippendorff_alpha(
    df: DataFrame,
    item_col: str,
    label_col: str,
    group: str | None = None,
) -> DataFrame:
    """Krippendorff's alpha (nominal) — the agreement coefficient that
    HANDLES missing ratings instead of excluding them: cohen_kappa
    needs exactly two fixed raters, fleiss_kappa a fixed n per item
    (abstentions fall off the design); Krippendorff's
    coincidence-matrix form accepts any number of ratings per item
    and simply drops items with fewer than two (counted, not hidden).

    Nominal-data algebra over per-(item,label) counts n_uc with item
    totals m_u (items with m_u >= 2 only):

        observed  A_o = sum_u sum_c n_uc (n_uc - 1) / (m_u - 1) / n
        expected  A_e = sum_c n_c (n_c - 1) / (n (n - 1))
        alpha = (A_o - A_e) / (1 - A_e)

    with n_c the pooled label marginal and n = sum_u m_u. Two
    aggregations: ratings -> (item,label) counts -> scalars; both key
    on (group, item) so hot groups distribute. NULL labels are
    abstentions (excluded, counted in n_abstain). Returns one row per
    group: (group?, n_items, n_pairable, n_ratings, n_abstain,
    a_o, a_e, alpha), floats rounded to 6; alpha NULL when A_e = 1
    (single label corpus) or no pairable items.
    """
    gcols = [group] if group else []
    rated = df.select(
        *gcols,
        F.col(item_col).alias("item"),
        F.col(label_col).alias("label"),
    )
    n_abstain = rated.filter(F.col("label").isNull())
    counts = (
        rated.filter(F.col("label").isNotNull())
        .groupBy(*gcols, "item", "label")
        .agg(F.count(F.lit(1)).alias("n_uc"))
    )
    witem = (
        counts.groupBy(*gcols, "item")
        .agg(F.sum("n_uc").alias("m_u"))
    )
    j = counts.join(witem, [*gcols, "item"])
    pairable = j.filter(F.col("m_u") >= 2)
    per_label = pairable.groupBy(*gcols, "label").agg(
        F.sum("n_uc").alias("n_c"),
        F.sum(
            F.col("n_uc").cast("double")
            * (F.col("n_uc") - 1)
            / (F.col("m_u") - 1)
        ).alias("o_cc"),
    )
    stats = per_label.groupBy(*gcols).agg(
        F.sum("n_c").alias("n"),
        F.sum("o_cc").alias("__diag"),
        F.sum(F.col("n_c").cast("double") * (F.col("n_c") - 1)).alias("__e"),
    )
    item_stats = witem.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum((F.col("m_u") >= 2).cast("long")).alias("n_pairable"),
    )
    ab = (
        n_abstain.groupBy(*gcols).agg(F.count(F.lit(1)).alias("n_abstain"))
        if group
        else n_abstain.agg(F.count(F.lit(1)).alias("n_abstain"))
    )
    how = "left"
    merged = item_stats.join(stats, gcols, how) if group else item_stats.crossJoin(stats)
    merged = merged.join(ab, gcols, how) if group else merged.crossJoin(ab)
    n = F.col("n").cast("double")
    a_o = F.col("__diag") / n
    a_e = F.col("__e") / (n * (n - 1))
    ok = (F.col("n") >= 2) & (a_e < 1.0)
    return merged.select(
        *gcols,
        "n_items",
        "n_pairable",
        F.coalesce(F.col("n"), F.lit(0)).alias("n_ratings"),
        F.coalesce(F.col("n_abstain"), F.lit(0)).alias("n_abstain"),
        F.when(ok, F.round(a_o, 6)).alias("a_o"),
        F.when(ok, F.round(a_e, 6)).alias("a_e"),
        F.when(ok, F.round((a_o - a_e) / (1.0 - a_e), 6) + 0.0).alias(
            "alpha"
        ),
    )


def cochran_q(
    df: DataFrame,
    item: str,
    treatment: str,
    ok_col: str,
) -> DataFrame:
    """Cochran's Q over matched BINARY verdicts — the k-treatment
    generalization of McNemar: the same items judged by k engine
    versions (or k raters), testing "do all k share one pass rate" on
    the matched design, which a k-way two-proportion sweep would get
    wrong by ignoring that the verdicts share items.

    Only COMPLETE blocks count (items judged by all k treatments;
    incomplete ones are reported, not silently mixed in — Cochran's Q
    is undefined for ragged designs). With R_i the item row-sums and
    C_j the treatment column-sums over complete blocks:

        Q = (k-1) * (k * sum C_j^2 - N^2) / (k*N - sum R_i^2),  df = k-1

    and the verdict uses the Wilson-Hilferty cube-root normal
    approximation z = ((Q/df)^(1/3) - (1 - 2/(9 df))) / sqrt(2/(9 df)),
    one-sided at 5%. All-pass/all-fail items contribute nothing to
    either side; when EVERY complete item is degenerate the denominator
    is 0 and the statistic is NULL.

    Scale: one groupBy(item) to the block relation, one groupBy
    (treatment) over complete blocks (both map-side-combinable), and an
    item-keyed equi-join that reuses the first shuffle's partitioning —
    no pairs, no windows. Returns one row: (k, n_items, n_complete,
    n_ratings, q_stat, df, z, reject_5pct).
    """
    okc = F.col(ok_col).cast("int")
    labeled = df.filter(okc.isNotNull()).select(
        F.col(item).alias("__i"),
        F.col(treatment).alias("__t"),
        okc.alias("__x"),
    )
    k_rel = labeled.agg(F.count_distinct("__t").alias("k"))
    rows = labeled.groupBy("__i").agg(
        F.count(F.lit(1)).alias("__cnt"), F.sum("__x").alias("__r")
    )
    items = rows.crossJoin(F.broadcast(k_rel))
    item_stats = items.agg(
        F.first("k").alias("k"),
        F.count(F.lit(1)).alias("n_items"),
        F.sum((F.col("__cnt") == F.col("k")).cast("long")).alias("n_complete"),
        F.sum(F.when(F.col("__cnt") == F.col("k"), F.col("__r")).otherwise(0)).alias(
            "__n"
        ),
        F.sum(
            F.when(
                F.col("__cnt") == F.col("k"), F.col("__r") * F.col("__r")
            ).otherwise(0)
        ).alias("__rr"),
    )
    complete = labeled.join(
        items.filter(F.col("__cnt") == F.col("k")).select("__i"), "__i"
    )
    cols = complete.groupBy("__t").agg(F.sum("__x").alias("__c"))
    col_stats = cols.agg(
        F.sum(F.col("__c").cast("double") * F.col("__c")).alias("__cc")
    )
    m = item_stats.crossJoin(col_stats)
    kd = F.col("k").cast("double")
    n = F.col("__n").cast("double")
    denom = kd * n - F.col("__rr")
    q = (kd - 1.0) * (kd * F.col("__cc") - n * n) / denom
    dfree = kd - 1.0
    z = (
        F.pow(q / dfree, 1.0 / 3.0) - (1.0 - 2.0 / (9.0 * dfree))
    ) / F.sqrt(2.0 / (9.0 * dfree))
    ok = (F.col("k") >= 2) & (denom > 0)
    return m.select(
        "k",
        "n_items",
        "n_complete",
        F.col("__n").alias("n_pass"),
        F.when(ok, F.round(q, 6)).alias("q_stat"),
        (F.col("k") - 1).alias("df"),
        F.when(ok, F.round(z, 6) + 0.0).alias("z"),
        F.when(ok, z > 1.644854).alias("reject_5pct"),
    )


def icc_oneway(
    df: DataFrame,
    item: str,
    value_col: str,
) -> DataFrame:
    """One-way random-effects intraclass correlation ICC(1,1) — the
    CONTINUOUS-ratings agreement gate (kappa/alpha answer it for
    labels): what fraction of score variance is true between-item
    signal rather than rater noise, from the one-way ANOVA decomposition

        ICC = (MSB - MSW) / (MSB + (k0 - 1) * MSW)

    with the unbalanced-design average group size
    k0 = (N - sum n_i^2 / N) / (n_items - 1), so raters may abstain on
    some items without biasing the estimate. Negative ICC is reported
    as computed (it is evidence of within-item disagreement exceeding
    chance, not an error).

    Scale: one groupBy(item) to (n_i, sum, sumsq), one global fold —
    two map-side-combinable aggregations, no windows, no joins back to
    rows. Returns one row: (n_items, n_ratings, k0, msb, msw, icc1);
    designs with no replication (N == n_items) or a single item yield
    NULL.
    """
    v = F.col(value_col).cast("double")
    labeled = df.filter(v.isNotNull()).select(
        F.col(item).alias("__i"), v.alias("__v")
    )
    per = labeled.groupBy("__i").agg(
        F.count(F.lit(1)).alias("__ni"),
        F.sum("__v").alias("__s"),
        F.sum(F.col("__v") * F.col("__v")).alias("__q"),
    )
    g = per.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("__ni").alias("n_ratings"),
        F.sum(F.col("__ni").cast("double") * F.col("__ni")).alias("__nn"),
        F.sum("__s").alias("__sum"),
        F.sum("__q").alias("__qq"),
        F.sum(F.col("__s") * F.col("__s") / F.col("__ni")).alias("__sb"),
    )
    nd = F.col("n_items").cast("double")
    bign = F.col("n_ratings").cast("double")
    ssb = F.col("__sb") - F.col("__sum") * F.col("__sum") / bign
    ssw = F.col("__qq") - F.col("__sb")
    msb = ssb / (nd - 1.0)
    msw = ssw / (bign - nd)
    k0 = (bign - F.col("__nn") / bign) / (nd - 1.0)
    icc = (msb - msw) / (msb + (k0 - 1.0) * msw)
    ok = (F.col("n_items") >= 2) & (F.col("n_ratings") > F.col("n_items"))
    return g.select(
        "n_items",
        "n_ratings",
        F.when(ok, F.round(k0, 6)).alias("k0"),
        F.when(ok, F.round(msb, 6)).alias("msb"),
        F.when(ok, F.round(msw, 6)).alias("msw"),
        F.when(ok & (msb + (k0 - 1.0) * msw > 0), F.round(icc, 6) + 0.0).alias(
            "icc1"
        ),
    )
