"""Large-star/small-star connected components (operators/dedup.py
star_contraction_labels): label correctness against a driver-side
union-find oracle on random graphs, and the logarithmic round count
that motivated replacing min-label propagation (VERDICT r3 item 8)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _sym_df(spark, edges):
    rows = [(a, b) for a, b in edges] + [(b, a) for a, b in edges]
    return spark.createDataFrame(rows, "src long, dst long")


def _oracle_labels(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = component minimum
    return {n: find(n) for n in parent}


def _spark_labels(spark, edges, **kw):
    from pdf_extract_spark.operators.dedup import star_contraction_labels

    out = star_contraction_labels(_sym_df(spark, edges), **kw).collect()
    assert len({r["doc_id"] for r in out}) == len(out), "duplicate doc_id rows"
    return {r["doc_id"]: r["label"] for r in out}


def test_star_random_graphs_match_union_find(spark):
    rnd = random.Random(0x57A2)
    for trial in range(6):
        n = rnd.randrange(10, 120)
        m = rnd.randrange(5, 2 * n)
        edges = {
            (rnd.randrange(n), rnd.randrange(n)) for _ in range(m)
        }
        edges = {(a, b) for a, b in edges if a != b}
        if not edges:
            continue
        assert _spark_labels(spark, edges) == _oracle_labels(edges), (
            trial, sorted(edges))


def test_star_clique_and_two_node(spark):
    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    assert _spark_labels(spark, clique) == {i: 0 for i in range(5)}
    assert _spark_labels(spark, [(7, 3)]) == {3: 3, 7: 3}


def test_star_chain_converges_logarithmically(spark):
    """A 64-node path needed 64+ rounds under min-label propagation
    (the old cap left a finer partition); star contraction must land
    it in ≤ 10 rounds with the correct single component."""
    chain = [(i, i + 1) for i in range(63)]
    rounds: list[int] = []
    labels = _spark_labels(spark, chain, rounds_out=rounds)
    assert labels == {i: 0 for i in range(64)}
    assert rounds[0] <= 10, rounds


def test_cluster_labels_unchanged_on_corpus(spark):
    """The swap must not move the oracle surface: cluster sizes over
    the sf0.001 documents table equal the recursive-CTE DuckDB answer
    shape (full value parity is the driver's CORRECTNESS gate; here we
    pin determinism across two runs)."""
    from pdf_extract_spark.operators.dedup import duplicate_clusters

    sf = "/root/testdata/sf0.001"
    a = sorted(map(tuple, duplicate_clusters(spark, sf).collect()))
    b = sorted(map(tuple, duplicate_clusters(spark, sf).collect()))
    assert a == b
    assert all(r[1] >= 2 for r in a)
