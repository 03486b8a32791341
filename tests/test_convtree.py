"""Branched-conversation path extraction (operators/convtree.py):
hand-built trees with known paths, logarithmic-round convergence on a deep
chain, dangling-parent tolerance, and the cycle guard."""

from __future__ import annotations

import pytest

from document_extraction_spark.operators.convtree import conv_root_paths

SCHEMA = "conv_id long, node_id long, parent_id long"


def _paths(df):
    return {(r.conv_id, r.leaf_id): (r.depth, r.path) for r in df.collect()}


def test_branching_tree_paths(spark):
    #      1
    #     / \
    #    2   3
    #    |   |\
    #    4   5 6
    rows = [(0, 1, None), (0, 2, 1), (0, 3, 1),
            (0, 4, 2), (0, 5, 3), (0, 6, 3)]
    got = _paths(conv_root_paths(spark.createDataFrame(rows, SCHEMA)))
    assert got == {
        (0, 4): (3, "1>2>4"),
        (0, 5): (3, "1>3>5"),
        (0, 6): (3, "1>3>6"),
    }


def test_two_convs_do_not_mix(spark):
    # same node ids in two conversations: the conv key must isolate them
    rows = [(0, 1, None), (0, 2, 1),
            (1, 1, None), (1, 2, 1), (1, 3, 2)]
    got = _paths(conv_root_paths(spark.createDataFrame(rows, SCHEMA)))
    assert got == {(0, 2): (2, "1>2"), (1, 3): (3, "1>2>3")}


def test_deep_chain_converges_logarithmically(spark):
    # 300-deep chain: naive recursion would need 300 rounds; pointer
    # doubling resolves within MAX_ROUNDS (2^40 ceiling) — and fast.
    rows = [(0, i, i - 1 if i > 0 else None) for i in range(300)]
    got = _paths(conv_root_paths(spark.createDataFrame(rows, SCHEMA)))
    assert got == {(0, 299): (300, ">".join(str(i) for i in range(300)))}


def test_dangling_parent_acts_as_root(spark):
    rows = [(0, 5, 99), (0, 6, 5)]  # 99 does not exist
    got = _paths(conv_root_paths(spark.createDataFrame(rows, SCHEMA)))
    assert got == {(0, 6): (2, "5>6")}


def test_cycle_raises(spark):
    rows = [(0, 1, 2), (0, 2, 1), (0, 3, 2)]
    with pytest.raises(RuntimeError, match="converge"):
        conv_root_paths(spark.createDataFrame(rows, SCHEMA), max_rounds=5)


def test_random_trees_match_python_reference(spark):
    """Property: on arbitrary deterministic trees, the distributed pointer-
    doubling result equals a plain recursive walk computed driver-side."""
    import random

    rng = random.Random(13)
    rows = []
    for conv in range(6):
        n = rng.randint(1, 40)
        for i in range(n):
            nid = conv * 1000 + i
            parent = None if i == 0 else conv * 1000 + rng.randrange(i)
            rows.append((conv, nid, parent))
    got = _paths(conv_root_paths(spark.createDataFrame(rows, SCHEMA)))

    by_conv = {}
    parents = {}
    children = set()
    for conv, nid, parent in rows:
        by_conv.setdefault(conv, []).append(nid)
        parents[(conv, nid)] = parent
        if parent is not None:
            children.add((conv, parent))
    want = {}
    for conv, nid, parent in rows:
        if (conv, nid) in children:
            continue  # not a leaf
        chain = [nid]
        cur = parent
        while cur is not None:
            chain.append(cur)
            cur = parents[(conv, cur)]
        chain.reverse()
        want[(conv, nid)] = (len(chain), ">".join(map(str, chain)))
    assert got == want
