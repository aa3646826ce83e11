"""Unit tests: PageRank on known graph shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nifi_hive_schema_generator_bundle_spark.operators.graph import pagerank


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_star_center_dominates(spark):
    # leaves all point at the hub
    edges = spark.createDataFrame(
        [(f"leaf{i}", "hub") for i in range(5)], "src string, dst string"
    )
    r = _ranks(pagerank(edges, iters=10))
    assert r["hub"] == max(r.values())
    leaf_ranks = [v for k, v in r.items() if k != "hub"]
    assert max(leaf_ranks) - min(leaf_ranks) < 1e-12  # symmetric leaves tie


def test_ranks_form_probability_vector(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")],
        "src string, dst string",
    )
    r = _ranks(pagerank(edges, iters=15))
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-9)
    assert all(v > 0 for v in r.values())


def test_dangling_mass_redistributes(spark):
    # d has no out-edges: without the dangling fix total mass leaks
    edges = spark.createDataFrame(
        [("a", "d"), ("b", "d"), ("c", "d")], "src string, dst string"
    )
    r = _ranks(pagerank(edges, iters=10))
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-9)
    assert r["d"] == max(r.values())


def test_zero_iters_is_uniform(spark):
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    r = _ranks(pagerank(edges, iters=0))
    assert r == {"a": 0.5, "b": 0.5}


def test_validates_params(spark):
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        pagerank(edges, iters=-1)
    with pytest.raises(ValueError):
        pagerank(edges, damping=1.5)
    with pytest.raises(ValueError):
        pagerank(edges, tol=-0.1)


def test_checkpoint_dir_matches_local_and_gcs_rounds(spark, tmp_path):
    """Reliable-dir checkpointing gives identical ranks AND deletes every
    round subdirectory except the last once the run completes."""
    import os

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "a")],
        "src string, dst string",
    )
    ckpt = str(tmp_path / "pr_ckpt")
    local = _ranks(pagerank(edges, iters=6))
    reliable_df = pagerank(edges, iters=6, checkpoint_dir=ckpt)
    reliable = _ranks(reliable_df)
    assert reliable == pytest.approx(local, abs=1e-12)
    # 7 materializations (init + 6 rounds) → only round6 remains on disk
    rounds = sorted(os.listdir(ckpt))
    assert rounds == ["round6"], rounds
    # the returned frame stays readable after the earlier rounds' cleanup
    assert reliable_df.count() == 4


def test_tol_early_stop_on_converged_graph(spark):
    """A symmetric 2-cycle converges immediately (uniform is the fixed
    point): with tol set, iteration stops after the first round even when
    iters is large — detected via the round-count the checkpoint dirs
    record — and the ranks still match the fixed-iters run."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    r = _ranks(pagerank(edges, iters=50, tol=1e-9))
    assert r == pytest.approx({"a": 0.5, "b": 0.5}, abs=1e-12)


def test_tol_early_stop_round_count(spark, tmp_path):
    import os

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    ckpt = str(tmp_path / "pr_tol")
    pagerank(edges, iters=50, tol=1e-9, checkpoint_dir=ckpt)
    # init (round0) + one update round (round1): uniform is already the
    # fixed point, so the L1 delta of round1 is 0 < tol and the loop exits
    remaining = sorted(os.listdir(ckpt))
    assert remaining == ["round1"], remaining


def test_pagerank_unpersists_cached_inputs(spark, tmp_path):
    """The loop-invariant edge/node/degree caches are dropped before
    return. Uses the reliable-checkpoint path: localCheckpoint blocks
    (the other path) legitimately stay in the block manager for the
    returned frame's lineage, which would mask a cache leak here."""
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    pagerank(
        edges, iters=3, checkpoint_dir=str(tmp_path / "pr_unp")
    ).count()
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after <= before, f"cached RDDs leaked: {before} -> {after}"


def test_label_propagation_two_cliques(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.graph import (
        label_propagation,
    )

    # two disjoint triangles: each clique converges onto its min id.
    # (A bridge edge would leak the smaller label across — the
    # deterministic min-tiebreak variant trades that bias for
    # reproducibility, which is what the oracle twin needs.)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)],
        "src long, dst long",
    )
    out = {r["id"]: r["label"] for r in label_propagation(edges, iterations=4).collect()}
    assert out[1] == out[2] == out[3] == 1
    assert out[10] == out[11] == out[12] == 10


def test_label_propagation_deterministic_across_layouts(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.graph import (
        label_propagation,
    )

    edges = spark.createDataFrame(
        [(i, (i * 7) % 20) for i in range(20) if i != (i * 7) % 20],
        "src long, dst long",
    )
    a = sorted(map(tuple, label_propagation(edges, iterations=3).collect()))
    b = sorted(
        map(tuple, label_propagation(edges.repartition(7), iterations=3).collect())
    )
    assert a == b


class TestLinkGraphEdges:
    def test_hosts_extracted_and_cleaned(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.graph import (
            link_graph_edges,
        )

        rows = [
            # userinfo + port + case noise on both sides
            (
                "HTTPS://user@WWW.A.com:443/x",
                ["http://b.com/1", "http://B.com/2", "https://c.org"],
            ),
            # self-loop outlink dropped, garbage outlink dropped
            ("http://b.com/", ["http://b.com/other", "javascript:void(0)"]),
            # unparseable page URL: all its edges dropped
            ("not a url", ["http://d.net"]),
        ]
        df = spark.createDataFrame(rows, "url string, links array<string>")
        got = {(r.src, r.dst) for r in link_graph_edges(df).collect()}
        assert got == {("www.a.com", "b.com"), ("www.a.com", "c.org")}

    def test_distinct_and_plan(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.graph import (
            link_graph_edges,
        )

        df = spark.createDataFrame(
            [("http://a.com", ["http://b.com"])] * 5,
            "url string, links array<string>",
        )
        out = link_graph_edges(df)
        assert out.count() == 1
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "BatchEval" not in plan


class TestKCore:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "src int, dst int")

    def test_cycle_survives_pendant_chain_peels(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.graph import k_core

        # triangle 1-2-3 with a pendant chain 3-4-5: the chain peels
        # over TWO rounds (5 first, then 4), the triangle stays at deg 2
        e = self._edges(
            spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
        )
        got = {
            r["node"]: r["deg"] for r in k_core(e, k=2).collect()
        }
        assert got == {1: 2, 2: 2, 3: 2}

    def test_star_two_core_is_empty(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.graph import k_core

        # hub of degree 5 dies in the 2-core once its leaves peel —
        # the raw-degree-vs-core distinction the docstring claims
        e = self._edges(spark, [(0, i) for i in range(1, 6)])
        assert k_core(e, k=2).count() == 0

    def test_k4_three_core_complete(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.graph import k_core

        e = self._edges(
            spark,
            [(a, b) for a in range(4) for b in range(4) if a < b],
        )
        got = {r["node"]: r["deg"] for r in k_core(e, k=3).collect()}
        assert got == {0: 3, 1: 3, 2: 3, 3: 3}

    def test_direction_multiplicity_selfloops_ignored(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.graph import k_core

        e = self._edges(
            spark,
            [(1, 2), (2, 1), (2, 3), (2, 3), (1, 3), (7, 7)],
        )
        got = {r["node"]: r["deg"] for r in k_core(e, k=2).collect()}
        assert got == {1: 2, 2: 2, 3: 2}

    def test_max_rounds_cuts_deep_peel(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.graph import k_core

        # path 0-1-2-...-6 peels one endpoint pair per round; a
        # 1-round cut leaves the inner path (superset of the empty core)
        e = self._edges(spark, [(i, i + 1) for i in range(6)])
        assert k_core(e, k=2, max_rounds=1).count() == 5
        assert k_core(e, k=2).count() == 0

    def test_validates_k(self, spark):
        import pytest as _pytest
        from nifi_hive_schema_generator_bundle_spark.operators.graph import k_core

        with _pytest.raises(ValueError):
            k_core(self._edges(spark, [(1, 2)]), k=0)


class TestFlattenHierarchy:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "child long, parent long")

    def test_forest_roots_and_depths(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.graph import (
            flatten_hierarchy,
        )

        # two trees: 1<-2<-3, 1<-4 and 10<-11
        e = self._edges(spark, [(2, 1), (3, 2), (4, 1), (11, 10)])
        got = {
            r["node"]: (r["root"], r["depth"], r["settled"])
            for r in flatten_hierarchy(e).collect()
        }
        assert got == {
            2: (1, 1, True),
            3: (1, 2, True),
            4: (1, 1, True),
            11: (10, 1, True),
        }

    def test_pointer_jumping_is_logarithmic(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.graph import (
            flatten_hierarchy,
        )

        # chain 1->2->...->9 (depth 8): 3 doubling rounds reach 2^3 = 8,
        # 2 rounds only reach 4 — pins the log-round contract
        e = self._edges(spark, [(i, i + 1) for i in range(1, 9)])
        full = {
            r["node"]: (r["root"], r["depth"], r["settled"])
            for r in flatten_hierarchy(e, max_rounds=3).collect()
        }
        assert full[1] == (9, 8, True)
        assert all(v[0] == 9 and v[2] for v in full.values())
        cut = {
            r["node"]: r["settled"]
            for r in flatten_hierarchy(e, max_rounds=2).collect()
        }
        assert cut[1] is False  # depth-8 pointer stuck at distance 4
        assert cut[8] is True   # depth-1 node settled in round 1

    def test_cycle_flagged_unsettled(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.graph import (
            flatten_hierarchy,
        )

        e = self._edges(spark, [(1, 2), (2, 1), (5, 1)])
        got = {
            r["node"]: r["settled"]
            for r in flatten_hierarchy(e, max_rounds=4).collect()
        }
        assert got == {1: False, 2: False, 5: False}

    def test_multi_parent_raises(self, spark):
        import pytest as _pytest
        from nifi_hive_schema_generator_bundle_spark.operators.graph import (
            flatten_hierarchy,
        )

        e = self._edges(spark, [(1, 2), (1, 3)])
        with _pytest.raises(ValueError, match="multiple parents"):
            flatten_hierarchy(e)


# ---------------------------------------------------------------------------
# shortest_paths
# ---------------------------------------------------------------------------


def _sp(spark, edges, seeds, **kw):
    from nifi_hive_schema_generator_bundle_spark.operators.graph import (
        shortest_paths,
    )

    e = spark.createDataFrame(edges, ["src", "dst", "w"])
    s = spark.createDataFrame([(x,) for x in seeds], ["node"])
    out = shortest_paths(e, s, **kw)
    return {r.node: r.dist for r in out.collect()}


def test_shortest_paths_hop_distances(spark):
    # path 1-2-3-4-5 plus a shortcut 1-4
    edges = [(1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0), (4, 5, 1.0), (1, 4, 1.0)]
    got = _sp(spark, edges, [1], max_hops=10)
    assert got == {1: 0.0, 2: 1.0, 3: 2.0, 4: 1.0, 5: 2.0}


def test_shortest_paths_weighted_prefers_cheap_detour(spark):
    # direct edge costs 5, two-hop detour costs 2
    edges = [(1, 3, 5.0), (1, 2, 1.0), (2, 3, 1.0)]
    got = _sp(spark, edges, [1], weight="w", max_hops=10)
    assert got[3] == 2.0
    # with max_hops=1 only the direct edge is allowed
    got1 = _sp(spark, edges, [1], weight="w", max_hops=1)
    assert got1[3] == 5.0


def test_shortest_paths_multi_source_and_unreachable(spark):
    edges = [(1, 2, 1.0), (3, 4, 1.0), (10, 11, 1.0)]
    got = _sp(spark, edges, [1, 3], max_hops=5)
    assert got == {1: 0.0, 2: 1.0, 3: 0.0, 4: 1.0}
    assert 10 not in got and 11 not in got  # unreachable island absent


def test_shortest_paths_directed_one_way(spark):
    edges = [(1, 2, 1.0), (2, 3, 1.0)]
    got = _sp(spark, edges, [3], directed=True, max_hops=5)
    assert got == {3: 0.0}  # nothing flows against edge direction
    got_u = _sp(spark, edges, [3], directed=False, max_hops=5)
    assert got_u == {3: 0.0, 2: 1.0, 1: 2.0}


def test_shortest_paths_negative_weight_raises(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-negative"):
        _sp(spark, [(1, 2, -1.0)], [1], weight="w")


def test_shortest_paths_max_hops_zero_is_seeds_only(spark):
    got = _sp(spark, [(1, 2, 1.0)], [1], max_hops=0)
    assert got == {1: 0.0}


# ---------------------------------------------------------------------------
# clustering_coefficient
# ---------------------------------------------------------------------------


def test_clustering_coefficient_planted(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.graph import (
        clustering_coefficient,
    )

    # K3 triangle {1,2,3} + pendant 4 on node 1 + star center 5 with
    # leaves 6,7 (no edges between leaves)
    edges = [(1, 2), (2, 3), (1, 3), (1, 4), (5, 6), (5, 7)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r.node: (r.deg, r.n_triangles, r.coefficient)
        for r in clustering_coefficient(df).collect()
    }
    assert got[2] == (2, 1, 1.0)  # pure triangle member
    assert got[3] == (2, 1, 1.0)
    # node 1: deg 3, 1 triangle -> 2*1/(3*2) = 1/3
    assert got[1] == (3, 1, 0.333333)
    assert got[4] == (1, 0, None)  # leaf: undefined, not 0
    assert got[5] == (2, 0, 0.0)  # star center: defined and 0
