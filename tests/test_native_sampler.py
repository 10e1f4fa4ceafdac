"""Native (C++) neighbor sampler vs the numpy reference implementation."""

import collections

import numpy as np
import pytest

from stemgnn_tpu.data.native_sampler import (build_native, native_available,
                                             sample_subgraph_native)
from stemgnn_tpu.data.sampler import CSCGraph, NeighborBatchIterator

pytestmark = pytest.mark.skipif(not (build_native() and native_available()),
                                reason="no C++ toolchain")


def _graph(rng, n=2000, e=20000):
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    return ei, CSCGraph.from_edge_index(ei, n)


def test_native_edges_are_real_and_distinct(rng):
    ei, csc = _graph(rng)
    seeds = rng.choice(2000, 64, replace=False)
    nodes, es, ed, eid = sample_subgraph_native(csc, seeds, [5, 5], 7)
    np.testing.assert_array_equal(nodes[:64], seeds)
    for k in range(len(es)):
        assert ei[0][eid[k]] == nodes[es[k]]
        assert ei[1][eid[k]] == nodes[ed[k]]
    # no duplicate (dst, edge) pairs — sampling without replacement
    cnt = collections.Counter(zip(ed.tolist(), eid.tolist()))
    assert max(cnt.values()) == 1


def test_native_fanout_cap(rng):
    # star: node 0 with 40 in-edges
    ei = np.stack([np.arange(1, 41), np.zeros(40, dtype=np.int64)])
    csc = CSCGraph.from_edge_index(ei, 41)
    nodes, es, ed, eid = sample_subgraph_native(csc, np.array([0]), [10], 3)
    assert len(es) == 10
    assert len(set(eid.tolist())) == 10
    nodes, es, ed, eid = sample_subgraph_native(csc, np.array([0]), [-1], 3)
    assert len(es) == 40


def test_native_determinism(rng):
    _, csc = _graph(rng)
    seeds = rng.choice(2000, 32, replace=False)
    a = sample_subgraph_native(csc, seeds, [4, 4], 99)
    b = sample_subgraph_native(csc, seeds, [4, 4], 99)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_iterator_uses_native(rng):
    ei, csc = _graph(rng, n=500, e=3000)
    feats = rng.standard_normal((500, 8)).astype(np.float32)
    it = NeighborBatchIterator(csc, feats, None, np.arange(500), None,
                               seeds=np.arange(500), batch_size=32,
                               fanouts=[4, 4], rng=np.random.default_rng(0),
                               drop_last=True)
    assert it._native
    count = 0
    for g, n_seeds, nodes in it:
        assert n_seeds == 32
        np.testing.assert_array_equal(np.asarray(g.node_feat[:32]),
                                      feats[nodes[:32]])
        count += 1
    assert count == 500 // 32
