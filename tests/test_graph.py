"""Graph operators: connected components semantics on known graphs, the
k-hop contract when k < diameter, fixed-point PageRank mass/ordering
properties, and the bit-exactness-under-repartitioning claim the fixed-point
design exists for."""

import pytest
from pyspark.sql import functions as F

from transmogrify_webcrawler_spark.operators.graph import (
    PAGERANK_SCALE, connected_components, pagerank_fixed,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_cc_known_components(spark):
    # {1,2,3}, {10,11}, {20,21,22,23} — three components, ids as labels
    e = _edges(spark, [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22),
                       (22, 23)])
    out = {r["component"]: (r["n_nodes"], r["min_node"])
           for r in connected_components(e, iterations=6).collect()}
    assert out == {1: (3, 1), 10: (2, 10), 20: (4, 20)}


def test_cc_khop_contract_below_diameter(spark):
    # path 0-1-...-9 (diameter 9). With k=3 each node's label is the min id
    # within 3 hops: nodes 0..3 reach 0; node v>3 gets v-3. Components are
    # therefore the defined k-hop semantics, not true CC — and exactly what
    # the unrolled SQL oracle computes.
    e = _edges(spark, [(i, i + 1) for i in range(9)])
    labels = {}
    for r in connected_components(e, iterations=3).collect():
        labels[r["component"]] = r["n_nodes"]
    assert labels == {0: 4, 1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1}
    # with k >= diameter it collapses to one component
    full = connected_components(e, iterations=9).collect()
    assert len(full) == 1 and full[0]["component"] == 0 \
        and full[0]["n_nodes"] == 10


def test_pagerank_star_ordering_and_mass(spark):
    # star: leaves 1..8 -> hub 0; hub dangles (mass dropped by contract)
    e = _edges(spark, [(i, 0) for i in range(1, 9)])
    ranks = {r["node"]: r["rank_fp"]
             for r in pagerank_fixed(e, iterations=3).collect()}
    assert set(ranks) == set(range(9))
    leaf = {ranks[i] for i in range(1, 9)}
    assert len(leaf) == 1  # symmetry: all leaves identical
    assert ranks[0] > max(leaf)  # hub dominates
    assert 0 < sum(ranks.values()) <= PAGERANK_SCALE  # mass never created


def test_pagerank_bit_exact_under_repartitioning(spark):
    # The design claim: integer arithmetic makes the result independent of
    # partitioning/summation order. Same graph, adversarially different
    # shuffle widths -> identical rank_fp bits.
    pairs = [(i, (i * 7 + 3) % 50) for i in range(200)] + \
            [(i % 50, (i * 13 + 1) % 97) for i in range(200)]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted(map(tuple, pagerank_fixed(
            _edges(spark, pairs), iterations=4).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = sorted(map(tuple, pagerank_fixed(
            _edges(spark, pairs).repartition(17), iterations=4).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b


def test_pagerank_n_nodes_hint_matches_counted(spark):
    e = _edges(spark, [(1, 2), (2, 3), (3, 1), (4, 1)])
    counted = sorted(map(tuple, pagerank_fixed(e, iterations=2).collect()))
    hinted = sorted(map(tuple, pagerank_fixed(
        e, iterations=2, n_nodes=4).collect()))
    assert counted == hinted


def test_cc_multigraph_and_direction_insensitive(spark):
    # duplicate + reversed edges must not change the result
    base = [(1, 2), (2, 3)]
    noisy = base + [(2, 1), (1, 2), (3, 2)]
    a = sorted(map(tuple,
                   connected_components(_edges(spark, base), 4).collect()))
    b = sorted(map(tuple,
                   connected_components(_edges(spark, noisy), 4).collect()))
    assert a == b == [(1, 3, 1)]


def test_hits_star_graph(spark):
    # hub 1 points at authorities 10,11,12; node 2 points only at 10.
    from transmogrify_webcrawler_spark.operators.graph import (
        HITS_SCALE, hits_fixed)
    edges = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 10)], "src long, dst long")
    out = {r["node"]: (r["hub_fp"], r["auth_fp"])
           for r in hits_fixed(edges, iterations=2).collect()}
    # node 1 is the best hub, node 10 the best authority (max-normalized)
    assert out[1][0] == HITS_SCALE
    assert out[10][1] == HITS_SCALE
    assert out[2][0] < out[1][0]
    assert out[11][1] < out[10][1]
    # pure authorities have zero hub score; pure hubs zero authority
    assert out[10][0] == 0 and out[1][1] == 0


def test_hits_partition_invariance(spark):
    from transmogrify_webcrawler_spark.operators.graph import hits_fixed
    edges = spark.range(500).select(
        (F.col("id") % 37).alias("src"), (F.col("id") % 53 + 100).alias("dst"))
    a = sorted(map(tuple, hits_fixed(edges.coalesce(1)).collect()))
    b = sorted(map(tuple, hits_fixed(edges.repartition(16)).collect()))
    assert a == b
