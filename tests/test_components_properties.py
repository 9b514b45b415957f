"""Property tests for min_label_components (operators/dedup.py).

The propagation loop serves three registered ops (text near-dup
clusters, embedding threshold components, cluster survivors); a
convergence or labeling bug would corrupt all of them. Reference:
a plain-Python union-find over the same edges.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dataengineeringutils_spark.operators.dedup import min_label_components

# node range bounds the worst-case diameter (a 12-node path) safely
# below MAX_CC_ITERS=15 propagation rounds
NODE = st.integers(min_value=0, max_value=11)
edges_strategy = st.lists(
    st.tuples(NODE, NODE).filter(lambda e: e[0] != e[1]),
    min_size=0,
    max_size=15,
)
extra_nodes = st.lists(NODE, min_size=0, max_size=6)


def _union_find(edges, nodes):
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for n in nodes:
        parent.setdefault(n, n)
    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # label = min node id in component
    labels: dict[int, int] = {}
    for n in parent:
        root = find(n)
        labels[n] = min(labels.get(root, root), root)
    # second pass: min id per root (roots are already minimal under
    # min-merge union, but make it explicit)
    by_root: dict[int, int] = {}
    for n in parent:
        r = find(n)
        by_root[r] = min(by_root.get(r, n), n)
    return {n: by_root[find(n)] for n in parent}


@given(edges=edges_strategy, singles=extra_nodes)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_min_label_components_matches_union_find(spark, edges, singles):
    pairs = spark.createDataFrame(
        edges or [], schema="a bigint, b bigint"
    )
    nodes = spark.createDataFrame(
        [(n,) for n in singles] or [], schema="node bigint"
    )
    got = {
        (r["node"], r["label"])
        for r in min_label_components(pairs, "a", "b", nodes=nodes).collect()
    }
    want = set(_union_find(edges, singles).items())
    assert got == want


def test_components_chain_requires_multiple_rounds(spark):
    """A path graph 5-4-3-2-1-0 has diameter > 1: labels must propagate
    transitively (every node ends at 0), catching a one-round-only bug."""
    edges = [(i, i + 1) for i in range(5)]
    pairs = spark.createDataFrame(edges, schema="a bigint, b bigint")
    got = {
        (r["node"], r["label"])
        for r in min_label_components(pairs, "a", "b").collect()
    }
    assert got == {(i, 0) for i in range(6)}
