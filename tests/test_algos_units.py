"""Unit tests for graph algorithm components on hand-built graphs."""

import logging

import numpy as np
import pytest

from vstrains_tpu.algos.branches import (get_non_trivial_branches,
                                         increment_nt_branch_coverage,
                                         is_non_trivial)
from vstrains_tpu.algos.compact import (simp_path_compactification,
                                        simple_paths_to_dict)
from vstrains_tpu.algos.contig_ops import (check_contig_intersection,
                                           contig_dict_remapping,
                                           contig_dup_removed_s,
                                           contig_map_node, contig_resolve,
                                           strain_repeat_resol,
                                           trim_contig_dict)
from vstrains_tpu.algos.decomposition import (balance_split, edge_cleaning,
                                              global_trivial_split,
                                              trivial_split)
from vstrains_tpu.core.gfa import store_reinit_graph
from vstrains_tpu.core.graph import new_view
from vstrains_tpu.ops.graph_ops import assign_edge_flow

_LOG = logging.getLogger("units")


def _chain_view(ids_seqs, edges, dps=None):
    v = new_view()
    for i, (vid, seq) in enumerate(ids_seqs):
        dp = dps[i] if dps else 50.0
        v.add_vertex(vid, dp, seq)
    for (u, w, ov) in edges:
        v.add_edge(v.nodes[u], v.nodes[w], ov)
    return v


def test_non_trivial_branch_detection():
    # 2-in 2-out center node
    v = _chain_view(
        [("a", "AAAA"), ("b", "CCCC"), ("x", "GGGG"), ("c", "TTTT"),
         ("d", "ACAC")],
        [("a", "x", 2), ("b", "x", 2), ("x", "c", 2), ("x", "d", 2)])
    assert is_non_trivial(v.nodes["x"])
    assert not is_non_trivial(v.nodes["a"])
    assert list(get_non_trivial_branches(v).keys()) == ["x"]


def test_simple_path_compactification_merges_chain():
    v = _chain_view(
        [("a", "AAAATT"), ("b", "TTCCCC"), ("c", "CCGGGG")],
        [("a", "b", 2), ("b", "c", 2)])
    pe_info = {}
    for u in list(v.nodes):
        for w in list(v.nodes):
            pe_info[(min(u, w), max(u, w))] = 1
    simp_path_compactification(v, None, pe_info, _LOG)
    assert list(v.nodes.keys()) == ["a&b&c"]
    merged = v.nodes["a&b&c"]
    assert merged.seq == "AAAATTCCCCGGGG"  # overlap-2 trimmed concat
    # aggregated self link info exists for the merged id
    assert ("a&b&c", "a&b&c") in pe_info


def test_balance_split_two_by_two():
    # a,b -> x -> c,d with PE links a-c and b-d
    v = _chain_view(
        [("a", "AAAATT"), ("b", "GGGGTT"), ("x", "TTCCCC"),
         ("c", "CCAAAA"), ("d", "CCGGGG")],
        [("a", "x", 2), ("b", "x", 2), ("x", "c", 2), ("x", "d", 2)],
        dps=[60.0, 40.0, 100.0, 60.0, 40.0])
    assign_edge_flow(v)
    pe_info = {}
    for u in list(v.nodes):
        for w in list(v.nodes):
            pe_info[(min(u, w), max(u, w))] = 0
    pe_info[(min("a", "c"), max("a", "c"))] = 10
    pe_info[(min("b", "d"), max("b", "d"))] = 8
    contig_dict = {}
    n = balance_split(v, contig_dict, pe_info, threshold=100.0,
                      is_prim=True, logger=_LOG)
    assert n == 1
    assert "x" not in v.nodes
    assert "x*0" in v.nodes and "x*1" in v.nodes
    assert ("a", "x*0") in v.edges and ("x*0", "c") in v.edges
    assert ("b", "x*1") in v.edges and ("x*1", "d") in v.edges


def test_balance_split_contig_support_wins():
    v = _chain_view(
        [("a", "AAAATT"), ("b", "GGGGTT"), ("x", "TTCCCC"),
         ("c", "CCAAAA"), ("d", "CCGGGG")],
        [("a", "x", 2), ("b", "x", 2), ("x", "c", 2), ("x", "d", 2)],
        dps=[60.0, 40.0, 100.0, 60.0, 40.0])
    assign_edge_flow(v)
    pe_info = {}
    for u in list(v.nodes):
        for w in list(v.nodes):
            pe_info[(min(u, w), max(u, w))] = 0
    pe_info[(min("b", "d"), max("b", "d"))] = 3
    contig_dict = {"1": [["a", "x", "c"], 10, 60.0]}
    n = balance_split(v, contig_dict, pe_info, threshold=100.0,
                      is_prim=True, logger=_LOG)
    assert n == 1
    # contig a-x-c forces the a->c link; remaining b pairs with d via link
    assert contig_dict["1"][0] == ["a", "x*0", "c"]


def test_global_trivial_split_forks():
    # a -> x -> {c, d}: 1-in 2-out fork
    v = _chain_view(
        [("a", "AAAATT"), ("x", "TTCCCC"), ("c", "CCAAAA"),
         ("d", "CCGGGG")],
        [("a", "x", 2), ("x", "c", 2), ("x", "d", 2)])
    assign_edge_flow(v)
    count, id_mapping = global_trivial_split(v, _LOG)
    assert count == 1
    assert id_mapping["x"] == {"x*A", "x*B"}
    v2 = store_reinit_graph(v)
    assert set(v2.nodes.keys()) == {"a", "x*A", "x*B", "c", "d"}


def test_trivial_split_nt_adjacent():
    # u1,u2 -> m -> x (NT branch) ; m is n->1 neighbor of branch x
    v = _chain_view(
        [("u1", "AAAATT"), ("u2", "CCCCTT"), ("m", "TTGGGG"),
         ("w", "TTAAAA"), ("x", "GGCCCC"), ("o1", "CCAAAA"),
         ("o2", "CCTTTT")],
        [("u1", "m", 2), ("u2", "m", 2), ("m", "x", 2), ("w", "x", 2),
         ("x", "o1", 2), ("x", "o2", 2)])
    assign_edge_flow(v)
    pe_info = {}
    for u in list(v.nodes):
        for w2 in list(v.nodes):
            pe_info[(min(u, w2), max(u, w2))] = 0
    count, id_mapping = trivial_split(v, pe_info, _LOG)
    assert count == 1
    assert id_mapping["m"] == {"m*A", "m*B"}
    assert "m" not in v.nodes


def test_edge_cleaning_removes_unsupported_cross():
    # a -> {c, d}; b -> {c, d}: all 4 edges crossing, contig supports a->c
    v = _chain_view(
        [("a", "AAAATT"), ("b", "GGGGTT"), ("c", "TTAAAA"),
         ("d", "TTGGGG")],
        [("a", "c", 2), ("a", "d", 2), ("b", "c", 2), ("b", "d", 2)])
    pe_info = {}
    for u in list(v.nodes):
        for w in list(v.nodes):
            pe_info[(min(u, w), max(u, w))] = 0
    contig_dict = {"1": [["a", "c"], 10, 50.0]}
    edge_cleaning(v, contig_dict, pe_info, _LOG)
    assert ("a", "c") in v.edges
    # a->d and b->c intersect the assigned a->c; removed. b->d becomes the
    # only remaining edge for b and d in the fixed point -> assigned.
    assert ("a", "d") not in v.edges
    assert ("b", "c") not in v.edges
    assert ("b", "d") in v.edges


def test_contig_bookkeeping_roundtrip():
    contig_dict = {"1": [["a", "b", "a"], 10, 5.0],
                   "2": [["a", "b"], 8, 4.0],
                   "3": [["c"], 4, 2.0]}
    node_map, edge_map = contig_map_node(contig_dict)
    assert node_map["a"] == {"1", "2"}
    assert ("a", "b") in edge_map
    contig_dup_removed_s(contig_dict, _LOG)
    # contig 2's node set is a subset of 1's -> dropped
    assert set(contig_dict.keys()) == {"1", "3"}

    d = {"s": [["x*0", "a&b", "c"], 10, 5.0]}
    contig_resolve(d)
    assert d["s"][0] == ["x", "a", "b", "c"]


def test_check_contig_intersection_directions():
    assert check_contig_intersection(["a", "b"], ["c", "d"])[2] == "n"
    # forward end-to-end overlap
    par, path, status = check_contig_intersection(["a", "b", "c"],
                                                  ["b", "c", "d"])
    assert not par and status == "f"
    assert path == [None, "b", "c"]
    # containment -> parallel overlap
    par, _, status = check_contig_intersection(["a", "b"], ["a", "b", "c"])
    assert par and status == "o"


def test_contig_dict_remapping_through_split_tree():
    v = _chain_view(
        [("a", "AAAATT"), ("x*A", "TTCCCC"), ("x*B", "TTCCCC"),
         ("c", "CCAAAA"), ("d", "CCGGGG")],
        [("a", "x*A", 2), ("a", "x*B", 2), ("x*A", "c", 2),
         ("x*B", "d", 2)])
    contig_dict = {"1": [["a", "x", "c"], 10, 5.0]}
    id_mapping = {"a": set(), "x": {"x*A", "x*B"}, "c": set(), "d": set()}
    prev_ids = ["a", "x", "c", "d"]
    contig_dict_remapping(v, contig_dict, id_mapping, prev_ids, _LOG)
    assert contig_dict["1"][0] == ["a", "x*A", "c"]


def test_strain_repeat_resol_expands_repeats():
    v = _chain_view([("a", "AAAATT"), ("b", "TTCCCC")], [("a", "b", 2)])
    strain_dict = {"A1": [["a", "b"], 10, 5.0]}
    contig_info = {"c1": (None, {"a": 2, "b": 1})}
    copy_contig_dict = {"c1": [["a", "b"], 10, 5.0]}
    strain_repeat_resol(v, strain_dict, contig_info, copy_contig_dict,
                        _LOG)
    assert strain_dict["A1"][0] == ["a", "a", "b"]
