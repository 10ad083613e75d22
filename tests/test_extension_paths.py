"""Targeted tests for extension's partial-path re-insertion
(Extension:630-725) and canonization cascades."""

import logging

import pytest

from vstrains_tpu.algos.extension import path_extension
from vstrains_tpu.core.graph import new_view
from vstrains_tpu.core.canon import load_gfa_canonized
from vstrains_tpu.core.seq import revcomp_str
from vstrains_tpu.ops.graph_ops import assign_edge_flow

_LOG = logging.getLogger("extpaths")


def _mk(ids_dps_seqs, edges):
    v = new_view()
    for vid, dp, seq in ids_dps_seqs:
        v.add_vertex(vid, dp, seq)
    for u, w, ov in edges:
        v.add_edge(v.nodes[u], v.nodes[w], ov)
    assign_edge_flow(v)
    return v


def test_right_connected_path_reinserted_as_A_node():
    """A contig whose extension stops before an unresolvable 2-2 branch is
    re-inserted as a merged 'A<rid>' node wired to the boundary, and the
    second strain later extends through it."""
    # layout: s1 -> m -> x ; s2 -> m -> ... with x a 2-2 ambiguous branch:
    #   a,b -> x -> c,d  with identical coverages (no link info)
    v = _mk(
        [("a", 50.0, "AAAATTGG"), ("b", 50.0, "CCCCTTGG"),
         ("x", 100.0, "GGTTCCAA"), ("c", 50.0, "AAGGGGTT"),
         ("d", 50.0, "AATTTTCC")],
        [("a", "x", 2), ("b", "x", 2), ("x", "c", 2), ("x", "d", 2)])
    # contigs cover the left legs only; no links -> extension stops at x
    contig_dict = {"1": [["a"], 8, 50.0], "2": [["b"], 8, 50.0]}
    full_link = {}
    pe_info = {}
    for u in ["a", "b", "x", "c", "d"]:
        for w in ["a", "b", "x", "c", "d"]:
            pe_info[(min(u, w), max(u, w))] = 0
    strain_dict, usages, v2 = path_extension(
        v, contig_dict, full_link, pe_info, threshold=1.0, temp_dir=None,
        logger=_LOG)
    # both strains exist and each contains its own left leg
    all_nodes = [set(rec[0]) for rec in strain_dict.values()]
    assert any("a" in s for s in all_nodes)
    assert any("b" in s for s in all_nodes)


def test_canonization_minus_cascade(tmp_path):
    """x+ -> y- -> z+ chain: y is picked '-' and its edge to z rewired into
    the canonical frame."""
    seq_x, seq_y, seq_z = "AAAACC", "TTGGGG", "CCTTAA"
    p = tmp_path / "g.gfa"
    p.write_text(
        f"S\tx\t{seq_x}\tDP:f:90.0\n"
        f"S\ty\t{seq_y}\tDP:f:50.0\n"
        f"S\tz\t{seq_z}\tDP:f:40.0\n"
        "L\tx\t+\ty\t-\t2M\n"
        "L\ty\t-\tz\t+\t2M\n")
    view = load_gfa_canonized(str(p), _LOG)
    assert set(view.nodes.keys()) == {"x", "-y", "z"}
    assert view.nodes["-y"].seq == revcomp_str(seq_y)
    assert ("x", "-y") in view.edges
    assert ("-y", "z") in view.edges


def test_canonization_seed_minus_component(tmp_path):
    """A component reached only via '-' links still canonizes with every
    edge in one orientation frame."""
    p = tmp_path / "g.gfa"
    p.write_text(
        "S\ta\tAAAACC\tDP:f:90.0\n"
        "S\tb\tGGGGTT\tDP:f:50.0\n"
        "S\tc\tCCAATT\tDP:f:40.0\n"
        "L\ta\t-\tb\t+\t2M\n"
        "L\tb\t+\tc\t-\t2M\n")
    view = load_gfa_canonized(str(p), _LOG)
    # every surviving edge connects nodes of the view (single frame)
    for (u, w) in view.edges:
        assert u in view.nodes and w in view.nodes
    assert len(view.edges) == 2
