"""Link-graph operator invariants (operators/graph.py): degree census
full-outer semantics, PageRank's closed-form fixed points (uniform ring),
rank ordering under concentrated in-links, and the bit-determinism
contract (integer fixed-point ⇒ identical under repartition). Value-level
cross-engine identity is pinned by the unrolled-CTE DuckDB twin
(link_pagerank in plans/entry_queries.py)."""

from __future__ import annotations

import pytest


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_degree_census_full_outer(spark):
    from xdan_dqa_spark.operators.graph import degree_census

    e = _edges(spark, [(1, 2), (1, 3), (2, 3), (4, 1)])
    got = {r["node"]: (r["out_degree"], r["in_degree"])
           for r in degree_census(e).collect()}
    assert got[1] == (2, 1)
    assert got[2] == (1, 1)
    assert got[3] == (0, 2)   # appears only as target
    assert got[4] == (1, 0)   # appears only as source


def test_pagerank_uniform_on_ring(spark):
    """A directed ring is perfectly symmetric: every node's rank must be
    exactly 1/N at every iteration (the uniform fixed point survives the
    fixed-point quantization because 1e12/5 is exact)."""
    from xdan_dqa_spark.operators.graph import pagerank

    n = 5
    e = _edges(spark, [(i, (i + 1) % n) for i in range(n)])
    ranks = {r["node"]: r["rank"] for r in pagerank(e, n_iter=4).collect()}
    assert all(v == pytest.approx(1 / n, abs=1e-9) for v in ranks.values())


def test_pagerank_concentrates_on_hub_and_is_partition_invariant(spark):
    """Everyone links the hub: the hub must outrank every leaf, leaves
    stay at the (1-d)/N floor; and the INTEGER fixed-point arithmetic
    makes the result bit-identical under any repartitioning (the
    determinism contract float PageRank cannot give)."""
    from xdan_dqa_spark.operators.graph import pagerank

    e = _edges(spark, [(i, 0) for i in range(1, 9)])
    r1 = {r["node"]: r["rank"] for r in pagerank(e, n_iter=3).collect()}
    assert all(r1[0] > r1[i] for i in range(1, 9))
    # leaves receive nothing: rank = (1-d)/N exactly (N=9)
    assert r1[1] == pytest.approx(0.15 / 9, abs=1e-9)
    r2 = {r["node"]: r["rank"]
          for r in pagerank(e.repartition(13), n_iter=3).collect()}
    assert r1 == r2   # bit-identical, not approx


def test_pagerank_mass_bounds_with_dangling_leak(spark):
    """Total rank mass stays within ((1-d), 1]: dangling nodes leak
    (documented), so mass can fall below 1 but never below the teleport
    floor, and never exceeds 1 + rounding noise."""
    from xdan_dqa_spark.operators.graph import pagerank

    e = _edges(spark, [(1, 2), (2, 3), (3, 4)])  # 4 is dangling
    total = sum(r["rank"] for r in pagerank(e, n_iter=3).collect())
    assert 0.15 < total <= 1.0 + 1e-9


def test_pagerank_rejects_bad_params(spark):
    from xdan_dqa_spark.operators.graph import pagerank

    e = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError):
        pagerank(e, n_iter=0)
    with pytest.raises(ValueError):
        pagerank(e, damping_num=20, damping_den=20)


def test_triangle_census_counts_k4(spark):
    """K4 has exactly 4 triangles; duplicate, reverse, and self-loop
    edges must collapse before counting (a multigraph would
    multiply-count)."""
    from xdan_dqa_spark.operators.graph import triangle_census

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    noisy = k4 + [(b, a) for a, b in k4] + [(2, 2), (0, 1), (1, 0)]
    row = triangle_census(_edges(spark, noisy)).collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == (4, 6, 4)


def test_triangle_census_star_is_triangle_free(spark):
    from xdan_dqa_spark.operators.graph import triangle_census

    e = _edges(spark, [(0, i) for i in range(1, 9)])
    row = triangle_census(e).collect()[0]
    assert row["n_triangles"] == 0
    assert row["n_nodes"] == 9 and row["n_edges"] == 8


def test_triangle_census_shared_edge_two_triangles(spark):
    """Two triangles glued on edge (0,1): counts each exactly once
    regardless of which endpoint the degree orientation picks first."""
    from xdan_dqa_spark.operators.graph import triangle_census

    e = _edges(spark, [(0, 1), (0, 2), (1, 2), (0, 3), (1, 3)])
    assert triangle_census(e).collect()[0]["n_triangles"] == 2


def test_resolve_redirects_chain_and_fanin(spark):
    """Chain 5->4->3->1 plus a side branch 2->1: every src resolves to
    the terminal 1 (which has no out-edge)."""
    from xdan_dqa_spark.operators.graph import resolve_redirects

    e = _edges(spark, [(5, 4), (4, 3), (3, 1), (2, 1)])
    got = {r["node"]: (r["terminal"], r["resolved"])
           for r in resolve_redirects(e).collect()}
    assert got == {5: (1, True), 4: (1, True), 3: (1, True), 2: (1, True)}


def test_resolve_redirects_flags_loops_instead_of_hanging(spark):
    """A 301 loop (7->8->7) can never terminate: both nodes must come
    back resolved=False with the pointer still on a redirecting node."""
    from xdan_dqa_spark.operators.graph import resolve_redirects

    e = _edges(spark, [(7, 8), (8, 7), (1, 2)])
    got = {r["node"]: r["resolved"] for r in resolve_redirects(e, max_rounds=4).collect()}
    assert got[1] is True
    assert got[7] is False and got[8] is False


def test_resolve_redirects_long_chain_doubles_past_rounds(spark):
    """A 40-hop chain resolves in 8 doubling rounds (2^8 >> 40) — the
    log-round contract that makes this usable on deep redirect chains."""
    from xdan_dqa_spark.operators.graph import resolve_redirects

    e = _edges(spark, [(i, i - 1) for i in range(1, 41)])
    got = {r["node"]: (r["terminal"], r["resolved"])
           for r in resolve_redirects(e).collect()}
    assert all(got[i] == (0, True) for i in range(1, 41))
