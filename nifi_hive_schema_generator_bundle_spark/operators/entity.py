"""Entity resolution: blocked fuzzy matching folded into canonical IDs.

The record-linkage pipeline every catalog / author / merchant table
eventually needs: rows whose *names* differ by typos are the same
real-world entity and must share an ID before any per-entity aggregate
is meaningful. The standard shape (Fellegi-Sunter blocking + pairwise
compare + transitive closure) maps onto the engine's existing kernels:

1. **Block** on a cheap deterministic key (default: a token of the
   name) so the pairwise comparison never goes quadratic in the table —
   only within blocks, exactly like the MinHash band join bounds the
   document near-dup comparison (`dedup.py`).
2. **Compare** within blocks with the JVM ``levenshtein`` builtin —
   no Python in the pair loop; edges are pairs at distance ≤
   ``max_dist`` (distance 0 included: exact duplicates are trivially
   the same entity here, unlike the near-dup operators where exact
   dedup is a separate earlier pass).
3. **Resolve** transitively with min-label connected components
   (`dedup.connected_components` — per-round equi-joins, reliable
   ``checkpoint_dir`` on clusters): A~B and B~C place A,C in one
   entity even when lev(A,C) > ``max_dist``.
4. **Canonicalize**: entity_id = min row id in the cluster; the
   canonical name is that row's name (deterministic, no voting).

The comparison runs over one **representative per distinct name**
(min id), never raw rows: k rows sharing a name would otherwise form a
k²/2 clique of distance-0 pairs inside their block — the exact-name
collapse removes that blowup entirely and rows rejoin their
representative by name (an equi-join) at the end. Scale: the only
quadratic work is per-block over *distinct* names; block-size skew is
the knob (pick a finer block key if one block holds the table).
Everything else is equi-join + CC, both already scale-hardened. 100 TB
shape: distinct names ≪ rows, edges ≪ distinct names for any sane
threshold, CC rounds bounded by cluster diameter (typo clusters are
shallow).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["blocked_edit_pairs", "resolve_entities", "golden_record"]


def blocked_edit_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    *,
    block_key: Column | None = None,
    max_dist: int = 2,
) -> DataFrame:
    """(id_a, id_b, dist) pairs with ``levenshtein(name) <= max_dist``,
    compared only within equal ``block_key`` groups (default: the
    name's second whitespace token — adjective-noun product names
    share the noun). ``id_a < id_b``; distance 0 (identical names)
    is included — for entity resolution an exact duplicate is still
    the same entity. Rows with a NULL block key never pair."""
    if block_key is None:
        block_key = F.split(F.col(name_col), " ").getItem(1)
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(name_col).alias("__name_a"),
        block_key.alias("__blk"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(name_col).alias("__name_b"),
        block_key.alias("__blk_b"),
    )
    return (
        a.join(b, (a.__blk == b.__blk_b) & (a.id_a < b.id_b))
        .withColumn("dist", F.levenshtein("__name_a", "__name_b"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "dist")
    )


def resolve_entities(
    df: DataFrame,
    id_col: str,
    name_col: str,
    *,
    block_key: Column | None = None,
    max_dist: int = 2,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """One row per input row: (``id_col``, entity_id, canonical_name).

    entity_id is the minimum ``id_col`` of the row's transitive fuzzy-
    match cluster (rows sharing a name share its min-id representative;
    singleton names map to themselves); canonical_name is the name
    carried by the entity_id row. NULL-name rows never match anything:
    entity_id = own id, canonical_name = NULL. ``checkpoint_dir`` is
    passed through to connected components for reliable lineage
    truncation on long chains (clusters from typo edges are shallow,
    so the default local truncation is fine single-node)."""
    from .dedup import connected_components

    base = df.select(F.col(id_col), F.col(name_col))
    # exact-name collapse: one representative (min id) per distinct
    # name — map-side combinable, removes the distance-0 clique blowup
    reps = (
        base.filter(F.col(name_col).isNotNull())
        .groupBy(name_col)
        .agg(F.min(id_col).alias("__rep_id"))
        # reps feeds three consumers (pair join, entity mapping, canon
        # names); materialize the distinct-name table once instead of
        # re-scanning the input per branch — it's dedup-sized, and the
        # CC loop below forces actions anyway
        .localCheckpoint(eager=True)
    )
    pairs = blocked_edit_pairs(
        reps.select(F.col("__rep_id").alias(id_col), name_col),
        id_col,
        name_col,
        block_key=block_key,
        max_dist=max_dist,
    ).select("id_a", "id_b")
    comp = connected_components(pairs, checkpoint_dir=checkpoint_dir)
    rep_entity = reps.join(
        comp.select(F.col("id").alias("__rep_id"), "component"),
        "__rep_id",
        "left",
    ).select(
        name_col,
        F.coalesce("component", F.col("__rep_id")).alias("__entity_id"),
    )
    # canonical name = the entity representative's own name; the canon
    # side is (n_entities ≤ n_distinct_names) rows and AQE broadcasts
    # it when small
    canon = reps.select(
        F.col("__rep_id").alias("__canon_id"),
        F.col(name_col).alias("canonical_name"),
    )
    labeled = base.join(rep_entity, name_col, "left").withColumn(
        "entity_id", F.coalesce("__entity_id", F.col(id_col))
    )
    return labeled.join(
        canon, labeled.entity_id == canon.__canon_id, "left"
    ).select(id_col, "entity_id", "canonical_name")


def golden_record(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Survivorship: one golden row per ``key_col`` where each field in
    ``value_cols`` independently takes its MOST RECENT NON-NULL value
    by ``order_col`` — the master-data-management merge rule applied
    after entity resolution assigns shared keys (a newer row with a
    NULL phone must not erase the older known phone).

    One aggregation: per field, ``max_by(value, struct(order, value
    IS NOT NULL ordered first))`` — expressed as max of a (is_null-
    last, order, value) struct so NULLs lose to ANY non-null
    regardless of recency, and ties on ``order_col`` break
    deterministically by value. Also returns ``n_versions`` and
    ``last_seen`` (max order) per key. Map-side combinable, single
    shuffle on the key, no window."""
    aggs = [
        F.count(F.lit(1)).alias("n_versions"),
        F.max(order_col).alias("last_seen"),
    ]
    for c in value_cols:
        picked = F.max(
            F.when(
                F.col(c).isNotNull(),
                F.struct(
                    F.lit(1).alias("has"),
                    F.col(order_col).alias("o"),
                    F.col(c).alias("v"),
                ),
            )
        )
        aggs.append(picked.getField("v").alias(c))
    return df.groupBy(key_col).agg(*aggs)
