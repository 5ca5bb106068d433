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


def weighted_kappa(
    df: DataFrame,
    rater_a: str,
    rater_b: str,
    levels: int,
    weights: str = "quadratic",
    group: str | None = None,
) -> DataFrame:
    """Weighted Cohen's kappa for ORDINAL labels (integer levels
    0..levels-1): plain kappa (cohen_kappa) scores a one-level
    disagreement exactly like a worst-case one, which is wrong for
    quality tiers / severity grades; the weighted form scores
    disagreement by distance,

        kappa_w = 1 - sum w_ij O_ij / sum w_ij E_ij
        w_ij = ((i - j)/(k - 1))^2  (quadratic; "linear" = |i-j|/(k-1))

    (E from the raters' marginals, the usual chance model; quadratic
    weights make kappa_w equal the ICC in large samples — the
    standard choice for graded labels). Rows with either label NULL
    or outside 0..levels-1 are EXCLUDED and counted (an out-of-range
    grade is a data bug, not a rating — surfaced, not folded in).

    One aggregation to the O(groups x k^2) confusion relation;
    marginals and the weighted sums are rollups of it. Degenerate
    chance agreement (sum w E = 0: both raters constant) yields NULL
    kappa. Returns (group?, n, n_excluded, po_weighted, pe_weighted,
    kappa_w).
    """
    if levels < 2:
        raise ValueError("levels must be >= 2")
    if weights not in ("quadratic", "linear"):
        raise ValueError("weights must be 'quadratic' or 'linear'")
    a = F.col(rater_a).cast("int")
    b = F.col(rater_b).cast("int")
    in_range = (
        a.isNotNull() & b.isNotNull()
        & a.between(0, levels - 1) & b.between(0, levels - 1)
    )
    gcols = [F.col(group).alias("g")] if group else []
    gb = ["g"] if group else []
    tagged = df.select(*gcols, a.alias("a"), b.alias("b"), in_range.alias("ok"))
    excl = tagged.groupBy(*gb).agg(
        F.sum((~F.col("ok")).cast("long")).alias("n_excluded")
    )
    cm = (
        tagged.filter("ok")
        .groupBy(*gb, "a", "b")
        .agg(F.count(F.lit(1)).cast("double").alias("o"))
    )
    ra = cm.groupBy(*gb, "a").agg(F.sum("o").alias("ra"))
    rb = cm.groupBy(*gb, "b").agg(F.sum("o").alias("rb"))
    n_rel = cm.groupBy(*gb).agg(F.sum("o").alias("n"))
    # dense i x j grid from the two marginals so E covers cells with
    # O = 0 (a sparse join would silently drop their expected mass)
    grid = ra.join(rb, gb) if group else ra.crossJoin(rb)
    grid = grid.join(n_rel, gb) if group else grid.crossJoin(n_rel)
    dist = F.abs(F.col("a") - F.col("b")).cast("double") / (levels - 1.0)
    w = dist * dist if weights == "quadratic" else dist
    e = F.col("ra") * F.col("rb") / F.col("n")
    ge = grid.select(*gb, "a", "b", w.alias("w"), e.alias("e"))
    joined = ge.join(cm, [*gb, "a", "b"], "left").select(
        *gb, "w", "e", F.coalesce(F.col("o"), F.lit(0.0)).alias("o")
    )
    agg = joined.groupBy(*gb).agg(
        F.sum(F.col("w") * F.col("o")).alias("wo"),
        F.sum(F.col("w") * F.col("e")).alias("we"),
    )
    agg = agg.join(n_rel, gb) if group else agg.crossJoin(n_rel)
    # derive the output from the EXCL relation, not the grid rollup: a
    # group whose rows are all excluded has no confusion-matrix rows at
    # all, and joining from the grid side would drop it — together with
    # its n_excluded count — violating the excluded-and-counted
    # contract. excl retains every group; left-join the grid stats on.
    agg = (
        excl.join(agg, gb, "left")
        if group
        else excl.join(agg, F.lit(True), "left")
    )
    kappa = F.when(
        F.col("we") > 0, 1.0 - F.col("wo") / F.col("we")
    )
    out_g = [F.col("g").alias(group)] if group else []
    return agg.select(
        *out_g,
        F.coalesce(F.col("n").cast("long"), F.lit(0)).alias("n"),
        "n_excluded",
        F.round(1.0 - F.col("wo") / F.col("n"), 6).alias("po_weighted"),
        F.round(1.0 - F.col("we") / F.col("n"), 6).alias("pe_weighted"),
        F.round(kappa, 6).alias("kappa_w"),
    )


def bowker_symmetry(
    df: DataFrame,
    rater_a: str,
    rater_b: str,
    group: str | None = None,
) -> DataFrame:
    """Bowker's test of symmetry — the k x k generalization of McNemar
    (mcnemar_events is the 2x2 case): do the two raters (or the same
    pipeline before/after a change) disagree SYMMETRICALLY, or is
    there a systematic direction to the relabeling?

        chi2 = sum_{i<j} (n_ij - n_ji)^2 / (n_ij + n_ji)
        df   = #{i<j pairs with n_ij + n_ji > 0}

    A significant Bowker with an insignificant accuracy change is the
    signature of a category DRIFT (e.g. "medium" quietly becoming
    "low") that aggregate agreement metrics average away. Pairs with
    no discordant mass contribute nothing and don't consume df. The
    critical value is read from the pinned chi-square table (df 1..10)
    — a verdict for df > 10 is NULL and the caller compares chi2
    against their own constant (stated, same pinned-table contract as
    bartlett/acf).

    One aggregation to the O(groups x k^2) confusion relation; the
    pair fold is a self-join ON that reduced relation. Returns
    (group?, n, df, chi2, chi2_crit_95, reject).
    """
    _CHI2_95 = [3.841, 5.991, 7.815, 9.488, 11.070, 12.592, 14.067,
                15.507, 16.919, 18.307]
    gcols = [F.col(group).alias("g")] if group else []
    gb = ["g"] if group else []
    labeled = df.filter(
        F.col(rater_a).isNotNull() & F.col(rater_b).isNotNull()
    )
    cm = labeled.groupBy(
        *gcols,
        F.col(rater_a).cast("string").alias("a"),
        F.col(rater_b).cast("string").alias("b"),
    ).agg(F.count(F.lit(1)).cast("double").alias("n_ab"))
    upper = cm.filter(F.col("a") < F.col("b"))
    lower = cm.filter(F.col("a") > F.col("b")).select(
        *gb,
        F.col("b").alias("a"),
        F.col("a").alias("b"),
        F.col("n_ab").alias("n_ba"),
    )
    pairs = upper.join(lower, [*gb, "a", "b"], "full").select(
        *gb,
        F.coalesce(F.col("n_ab"), F.lit(0.0)).alias("x"),
        F.coalesce(F.col("n_ba"), F.lit(0.0)).alias("y"),
    )
    tot = cm.groupBy(*gb).agg(F.sum("n_ab").cast("long").alias("n"))
    agg = pairs.filter((F.col("x") + F.col("y")) > 0).groupBy(*gb).agg(
        F.count(F.lit(1)).cast("int").alias("df"),
        F.sum(
            (F.col("x") - F.col("y")) * (F.col("x") - F.col("y"))
            / (F.col("x") + F.col("y"))
        ).alias("chi2"),
    )
    agg = tot.join(agg, gb, "left") if group else tot.crossJoin(agg)
    crit_arr = F.array(*[F.lit(c) for c in _CHI2_95])
    crit = F.when(
        F.col("df").between(1, 10), F.element_at(crit_arr, F.col("df"))
    )
    out_g = [F.col("g").alias(group)] if group else []
    return agg.select(
        *out_g,
        "n",
        "df",
        F.round("chi2", 6).alias("chi2"),
        crit.alias("chi2_crit_95"),
        F.when(crit.isNotNull(), F.col("chi2") > crit).alias("reject"),
    )


def cronbach_alpha(
    df: DataFrame,
    items: list[str],
    group: str | None = None,
    min_n: int = 8,
) -> DataFrame:
    """Cronbach's alpha — internal consistency of K parallel scores
    (quality heuristics, rubric dimensions, judge prompts):

        alpha = K/(K-1) * (1 - sum var_item / var(rowsum))

    alpha near 1: the K scorers measure one underlying trait (and a
    cheaper subset may suffice); near 0 (or negative): they measure
    DIFFERENT things, and averaging them into one "quality score" is
    destroying information — the sanity check in front of every
    composite metric this engine's curation pipelines consume.

    Complete-case rows only (a row missing any item is excluded and
    counted — imputing would inflate consistency; stated). One
    aggregation computing each item's sums/squares AND the row-sum's,
    all map-side combinable; algebra on O(groups) rows. Degenerate
    var(rowsum) = 0 yields NULL alpha. Returns (group?, n,
    n_excluded, k, sum_item_var, total_var, alpha).
    """
    if len(items) < 2:
        raise ValueError("need at least two items")
    k = len(items)
    cols = [F.col(c).cast("double") for c in items]
    complete = cols[0].isNotNull()
    for c in cols[1:]:
        complete = complete & c.isNotNull()
    rowsum = cols[0]
    for c in cols[1:]:
        rowsum = rowsum + c
    gcols = [F.col(group).alias("g")] if group else []
    gb = ["g"] if group else []
    tagged = df.select(
        *gcols,
        complete.alias("ok"),
        *[c.alias(f"x{i}") for i, c in enumerate(cols)],
        rowsum.alias("rs"),
    )
    aggs = [
        F.sum(F.col("ok").cast("long")).alias("n"),
        F.sum((~F.col("ok")).cast("long")).alias("n_excluded"),
        F.sum(F.when(F.col("ok"), F.col("rs"))).alias("s_rs"),
        F.sum(F.when(F.col("ok"), F.col("rs") * F.col("rs"))).alias("ss_rs"),
    ]
    for i in range(k):
        x = F.col(f"x{i}")
        aggs.append(F.sum(F.when(F.col("ok"), x)).alias(f"s{i}"))
        aggs.append(F.sum(F.when(F.col("ok"), x * x)).alias(f"ss{i}"))
    agg = tagged.groupBy(*gb).agg(*aggs)
    n = F.col("n").cast("double")

    def _var(s, ss):
        return (F.col(ss) - F.col(s) * F.col(s) / n) / (n - 1)

    item_var = _var("s0", "ss0")
    for i in range(1, k):
        item_var = item_var + _var(f"s{i}", f"ss{i}")
    tot_var = _var("s_rs", "ss_rs")
    alpha = F.when(
        tot_var > 0, k / (k - 1.0) * (1.0 - item_var / tot_var)
    )
    out_g = [F.col("g").alias(group)] if group else []
    return agg.filter(F.col("n") >= min_n).select(
        *out_g,
        "n",
        "n_excluded",
        F.lit(k).alias("k"),
        F.round(item_var, 6).alias("sum_item_var"),
        F.round(tot_var, 6).alias("total_var"),
        F.round(alpha, 6).alias("alpha"),
    )
