"""Property tests: invariances the distributed design relies on, plus
edge-case robustness."""

import logging

import numpy as np
import pytest

from tests.test_pe_infer import _make_batch, _random_refs, _sample_reads
from vstrains_tpu.core.fastq import ReadPairBatch
from vstrains_tpu.ops.pe_infer import build_kmer_table, infer_pe_links

_LOG = logging.getLogger("props")


def test_pe_matrices_invariant_under_read_permutation():
    """Integer accumulation is order-free: any read shuffling (hence any
    host striping / mesh sharding) yields identical matrices."""
    rng = np.random.RandomState(41)
    k = 11
    refs = _random_refs(rng, 4, [70, 90, 110, 130])
    fwd, rve = _sample_reads(rng, refs, 80, 35, k)
    ids = [str(i) for i in range(4)]
    base = infer_pe_links(ids, refs, _make_batch(fwd, rve, k + 1), k,
                          batch_size=16)
    perm = rng.permutation(len(fwd))
    fwd_p = [fwd[i] for i in perm]
    rve_p = [rve[i] for i in perm]
    perm_res = infer_pe_links(ids, refs, _make_batch(fwd_p, rve_p, k + 1),
                              k, batch_size=64)
    np.testing.assert_array_equal(base.node_mat, perm_res.node_mat)
    np.testing.assert_array_equal(base.short_mat, perm_res.short_mat)


def test_pe_empty_reads():
    refs = ["ACGTACGTACGTACGT"]
    batch = _make_batch([], [], 12)
    res = infer_pe_links(["x"], refs, batch, 11)
    assert res.node_mat.sum() == 0 and res.used_reads == 0


def test_pe_no_table_entries():
    """Nodes shorter than the window produce an empty table."""
    refs = ["ACGT"]
    fwd = ["ACGTACGTACGTACGT"]
    res = infer_pe_links(["x"], refs, _make_batch(fwd, fwd, 12), 11)
    assert res.node_mat.sum() == 0


def test_kmer_table_skips_lowercase_windows():
    """Lowercased (self-loop) node sequences contribute no table entries
    (their windows can never match uppercase reads)."""
    t_upper = build_kmer_table(["ACGTACGTACGT"], 6)
    t_lower = build_kmer_table(["acgtacgtacgt"], 6)
    assert t_upper.num_entries > 0
    assert t_lower.num_entries == 0


def test_cov_split_secondary_phase():
    """With no PE links at all, the secondary phase resolves a clean 2-2
    branch by mutual-best coverage matching (Decomposition:61-88)."""
    from vstrains_tpu.algos.decomposition import balance_split
    from vstrains_tpu.core.graph import new_view
    from vstrains_tpu.ops.graph_ops import assign_edge_flow

    v = new_view()
    a = v.add_vertex("a", 100.0, "AAAATT")
    b = v.add_vertex("b", 20.0, "GGGGTT")
    x = v.add_vertex("x", 120.0, "TTCCCC")
    c = v.add_vertex("c", 100.0, "CCAAAA")
    d = v.add_vertex("d", 20.0, "CCGGGG")
    v.add_edge(a, x, 2)
    v.add_edge(b, x, 2)
    v.add_edge(x, c, 2)
    v.add_edge(x, d, 2)
    assign_edge_flow(v)
    pe_info = {}
    for u in list(v.nodes):
        for w in list(v.nodes):
            pe_info[(min(u, w), max(u, w))] = 0
    # primary phase: no links -> no split
    n = balance_split(v, {}, pe_info, threshold=1000.0, is_prim=True,
                      logger=_LOG)
    assert n == 0
    # secondary phase: coverage similarity pairs a-c and b-d
    n = balance_split(v, {}, pe_info, threshold=1000.0, is_prim=False,
                      logger=_LOG)
    assert n == 1
    assert ("a", "x*0") in v.edges and ("x*0", "c") in v.edges
    assert ("b", "x*1") in v.edges and ("x*1", "d") in v.edges


def test_cov_split_ambiguous_skips():
    """Near-equal coverages fail the 2|delta| ambiguity test and block the
    coverage split."""
    from vstrains_tpu.algos.decomposition import balance_split
    from vstrains_tpu.core.graph import new_view
    from vstrains_tpu.ops.graph_ops import assign_edge_flow

    v = new_view()
    a = v.add_vertex("a", 50.0, "AAAATT")
    b = v.add_vertex("b", 50.0, "GGGGTT")
    x = v.add_vertex("x", 100.0, "TTCCCC")
    c = v.add_vertex("c", 50.0, "CCAAAA")
    d = v.add_vertex("d", 50.0, "CCGGGG")
    for (s, t) in [(a, x), (b, x), (x, c), (x, d)]:
        v.add_edge(s, t, 2)
    assign_edge_flow(v)
    pe_info = {}
    for u in list(v.nodes):
        for w in list(v.nodes):
            pe_info[(min(u, w), max(u, w))] = 0
    n = balance_split(v, {}, pe_info, threshold=1000.0, is_prim=False,
                      logger=_LOG)
    assert n == 0
    assert "x" in v.nodes
