"""Market-basket analytics: association rules and resource-allocation
link prediction over item co-occurrence — the classic "what sells
together / what SHOULD link but doesn't" pair of retail readouts, and
(in LLM-pipeline terms) the co-occurrence mining step behind
collocation discovery over any (container, item) relation.

Determinism ledger (exact-integer, the ``operators/pca.py``
discipline, so the DuckDB twins hash bit-for-bit):

* supports / co-counts / degrees — pure integer counting.
* confidence — ``co * 10^6 // item_count`` (integer ppm).
* lift — ``co * n_baskets * 10^6 // (count_a * count_b)`` (integer
  ppm; co*N <= N^2 ~ 2.25e10 at sf0.1, x1e6 stays far under int64).
* resource-allocation index (Zhou, Lu & Zhang 2009) — instead of
  Adamic-Adar's 1/ln(deg) (a float ln per term, engine-dependent at
  round boundaries), RA's 1/deg is RATIONAL: each common-neighbor term
  quantizes exactly as ``10^9 // deg(w)`` and the sum is
  order-independent.
* top-k outputs carry (score DESC, item_a, item_b) total tiebreaks.

Scale shape:

* Pair enumeration fans out C(k,2) per basket — LINEAR in baskets for
  bounded basket size; ``max_basket`` drops (and logs) degenerate
  baskets, the ``minhash_lsh_pairs`` max_bucket convention.
* Link prediction enumerates wedges from the common neighbor w, cost
  sum_w C(deg(w),2) — kept linear by building the graph on the sparse
  quantity>=40 co-purchase relation (the ``part_copurchase_triangles``
  convention: per-order fan-out ~1 so degrees stay O(1) as data
  scales) plus a ``max_degree`` hub-exclusion cap (RA terms from hubs
  are <= 10^9/deg each — negligible by construction, and dropping them
  is the standard RA/AA practice).
* Item-count joins are shuffle equi-joins on the item key; nothing is
  broadcast that grows with the catalog.

Reference parity note: no analytics in the reference bundle
(CreateHQL.scala); SURVEY.md §2 extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 10**6
RA_SCALE = 10**9


def _capped_items(
    items: DataFrame, basket_col: str, item_col: str, max_basket: int
) -> DataFrame:
    """Distinct (b, i) pairs from baskets of ≤ ``max_basket`` distinct
    items — the shared population for pair supports AND rule
    denominators (computing it once keeps association_rules to a single
    pass over the input)."""
    it = items.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).distinct()
    sized = it.groupBy("b").agg(F.count(F.lit(1)).alias("sz"))
    keep = sized.filter(F.col("sz") <= max_basket).select("b")
    return it.join(keep, "b")


def _pairs_from_items(it: DataFrame) -> DataFrame:
    other = it.select(F.col("b"), F.col("i").alias("j"))
    return (
        it.join(other, "b")
        .filter(F.col("i") < F.col("j"))
        .groupBy(F.col("i").alias("item_a"), F.col("j").alias("item_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("support_n"))
    )


def basket_pairs(
    items: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket: int = 100,
) -> DataFrame:
    """Distinct co-occurring item pairs per basket with co-counts.

    ``items`` is a (basket, item) relation; duplicates are collapsed
    first so a basket contributes each pair once. Baskets larger than
    ``max_basket`` items are excluded (C(k,2) fan-out guard — their
    count is observable via ``basket_sizes``)."""
    return _pairs_from_items(
        _capped_items(items, basket_col, item_col, max_basket)
    )


def association_rules(
    items: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    top_k: int = 20,
    max_basket: int = 100,
) -> DataFrame:
    """Top-k item pairs by co-occurrence with integer-ppm confidence
    (both directions) and lift. One distinct + one self-equi-join on
    the basket key + two item-count joins; all scores exact integers.

    Denominator population: item counts and ``n_baskets`` come from the
    same ``max_basket``-filtered basket set that the pair enumeration
    uses (ONE ``_capped_items`` frame, persisted across its three
    consumers), so confidence and lift stay internally consistent when
    the degenerate-basket guard fires (support over one population
    divided by counts over another would overstate confidence)."""
    # persist: three consumers (n_baskets action, item counts, pair
    # enumeration) read the same capped frame. The capped-items cache is
    # released before returning: the ≤top_k-row result is materialized
    # (persist + count) while the capped frame is still cached, so the
    # caller's later actions replay only the tiny cached result — no
    # executor storage is held for the full (basket, item) relation.
    it = _capped_items(items, basket_col, item_col, max_basket).persist()
    n_baskets = it.select("b").distinct().count()
    counts = it.groupBy("i").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    pairs = _pairs_from_items(it)
    ca = counts.select(F.col("i").alias("item_a"), F.col("cnt").alias("cnt_a"))
    cb = counts.select(F.col("i").alias("item_b"), F.col("cnt").alias("cnt_b"))
    rules = (
        pairs.filter(F.col("support_n") >= min_support)
        .join(ca, "item_a")
        .join(cb, "item_b")
        .select(
            "item_a",
            "item_b",
            "support_n",
            # `div`, never `/`: Spark's `/` is IEEE double division, and
            # co*N*10^6 exceeds 2^53 long before the counts overflow — the
            # long->double cast would desync from the oracle's integer `//`.
            F.expr(f"support_n * {PPM} div cnt_a").alias("conf_ab_ppm"),
            F.expr(f"support_n * {PPM} div cnt_b").alias("conf_ba_ppm"),
            F.expr(
                f"support_n * {n_baskets}L * {PPM} div (cnt_a * cnt_b)"
            ).alias("lift_ppm"),
        )
        .orderBy(F.desc("support_n"), F.desc("lift_ppm"), "item_a", "item_b")
        .limit(top_k)
    ).persist()
    try:
        rules.count()
    except Exception:
        # failed materialization: nothing useful is cached — drop BOTH
        # persists (ADVICE r7: leaving `rules` registered on the error
        # path leaked a persist that no caller could ever release)
        rules.unpersist()
        raise
    finally:
        # release the big capped-items cache even if materializing the
        # tiny result fails mid-action (executor loss/OOM) — the whole
        # point of this lifecycle is not holding the full relation
        it.unpersist()
    # cache ownership: the returned frame IS persisted (≤ top_k rows —
    # the cache is what detaches it from the released capped-items
    # frame); the caller owns it and may .unpersist() when done, though
    # at ≤ top_k rows the storage cost is negligible
    return rules


def ra_link_prediction(
    edges: DataFrame,
    max_degree: int = 10_000,
    top_k: int = 20,
) -> DataFrame:
    """Resource-allocation link prediction: for node pairs with >= 1
    common neighbor and NO existing edge, RA(u,v) =
    sum_{w in N(u) ∩ N(v)} 10^9 // deg(w) (exact integer terms).

    ``edges`` holds undirected (src, dst) with src < dst. Wedges are
    enumerated from the shared neighbor w; nodes with deg(w) >
    ``max_degree`` are excluded as wedge centers (hub cap — their RA
    contribution is <= 10^9/deg each)."""
    e = edges.select("src", "dst").distinct()
    adj = e.select(F.col("src").alias("w"), F.col("dst").alias("n")).unionAll(
        e.select(F.col("dst").alias("w"), F.col("src").alias("n"))
    )
    deg = adj.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    centers = deg.filter(F.col("deg") <= max_degree).withColumn(
        "term", F.expr(f"{RA_SCALE} div deg")
    )
    a1 = adj.join(centers, "w").select("w", F.col("n").alias("u"), "term")
    a2 = adj.select("w", F.col("n").alias("v"))
    wedges = a1.join(a2, "w").filter(F.col("u") < F.col("v"))
    scored = wedges.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("long").alias("common_neighbors"),
        F.sum("term").cast("long").alias("ra_q"),
    )
    open_pairs = scored.join(
        e.withColumnRenamed("src", "u").withColumnRenamed("dst", "v"),
        ["u", "v"],
        "left_anti",
    )
    return (
        open_pairs.select(
            F.col("u").alias("item_a"),
            F.col("v").alias("item_b"),
            "common_neighbors",
            "ra_q",
        )
        .orderBy(F.desc("ra_q"), "item_a", "item_b")
        .limit(top_k)
    )
