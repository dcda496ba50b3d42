"""Connected-components cluster formation over near-dup pair edges:
transitivity (chains), cycles, disjoint components, and the
keep-one-per-cluster policy."""

from __future__ import annotations

from pdf_ocr_comparison_tool_spark.operators import dedup


def _cc(spark, edges):
    pairs = spark.createDataFrame(edges, ["a", "b"])
    rows = dedup.connected_components(pairs).collect()
    return {r["doc_id"]: (r["cluster_id"], r["keep"]) for r in rows}


def test_chain_is_transitive(spark):
    # a-b, b-c, c-d: one component even though (a,d) was never a pair
    got = _cc(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert got == {
        "a": ("a", True),
        "b": ("a", False),
        "c": ("a", False),
        "d": ("a", False),
    }


def test_cycle_converges(spark):
    got = _cc(spark, [("x", "y"), ("y", "z"), ("x", "z")])
    assert {k: v[0] for k, v in got.items()} == {"x": "x", "y": "x", "z": "x"}


def test_disjoint_components(spark):
    got = _cc(spark, [("a", "b"), ("m", "n"), ("n", "o")])
    assert got["a"] == ("a", True) and got["b"] == ("a", False)
    assert got["m"] == ("m", True)
    assert got["n"] == ("m", False) and got["o"] == ("m", False)


def test_long_chain_beyond_one_round(spark):
    # a 12-node path needs several propagation rounds to converge
    nodes = [f"n{i:02d}" for i in range(12)]
    got = _cc(spark, list(zip(nodes, nodes[1:])))
    assert all(cl == "n00" for cl, _ in got.values())
    assert sum(1 for _, keep in got.values() if keep) == 1


def test_exactly_one_keep_per_cluster(spark):
    got = _cc(spark, [("d3", "d1"), ("d2", "d3"), ("q9", "q8")])
    clusters = {}
    for doc, (cl, keep) in got.items():
        clusters.setdefault(cl, []).append((doc, keep))
    for cl, members in clusters.items():
        keeps = [d for d, k in members if k]
        assert keeps == [cl] == [min(d for d, _ in members)]
