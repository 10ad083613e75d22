"""Canonization: bidirected GFA -> single-orientation digraph."""

import logging

import pytest

from vstrains_tpu.core.canon import load_gfa_canonized
from vstrains_tpu.core.seq import revcomp_str

_LOG = logging.getLogger("test")


def _write(tmp_path, lines):
    p = tmp_path / "g.gfa"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_all_plus_graph_identity(tmp_path):
    path = _write(tmp_path, [
        "S\tx\tAAAACC\tDP:f:50.0",
        "S\ty\tCCGGGG\tDP:f:40.0",
        "L\tx\t+\ty\t+\t2M",
    ])
    view = load_gfa_canonized(path, _LOG)
    assert set(view.nodes.keys()) == {"x", "y"}
    assert view.nodes["x"].seq == "AAAACC"
    assert view.nodes["y"].seq == "CCGGGG"
    assert list(view.edges.keys()) == [("x", "y")]
    assert view.edges[("x", "y")].overlap == 2


def test_minus_orientation_flipped(tmp_path):
    # x+ -> y-  : y picked as '-' -> y's seq revcomped, edge x->(-y)
    path = _write(tmp_path, [
        "S\tx\tAAAACC\tDP:f:50.0",
        "S\ty\tGGTTTT\tDP:f:40.0",
        "L\tx\t+\ty\t-\t2M",
    ])
    view = load_gfa_canonized(path, _LOG)
    # seed = x (max dp), picks '+'; neighbor is y with ori -1 -> pick '-'
    assert set(view.nodes.keys()) == {"x", "-y"}
    assert view.nodes["-y"].seq == revcomp_str("GGTTTT")
    assert ("x", "-y") in view.edges


def test_minus_minus_link(tmp_path):
    # x- -> y- with x seed picked '+': the edge x1-=>y1- must be rewired to
    # the + frame as y+ -> x+
    path = _write(tmp_path, [
        "S\tx\tAAAACC\tDP:f:50.0",
        "S\ty\tGGGGTT\tDP:f:40.0",
        "L\tx\t-\ty\t-\t2M",
    ])
    view = load_gfa_canonized(path, _LOG)
    assert set(view.nodes.keys()) == {"x", "y"}
    assert ("y", "x") in view.edges
    assert view.nodes["y"].seq == "GGGGTT"


def test_self_loop_segment_lowercased(tmp_path):
    path = _write(tmp_path, [
        "S\tx\tAAAACC\tDP:f:50.0",
        "S\ty\tCCGGGG\tDP:f:40.0",
        "L\tx\t+\tx\t+\t2M",
        "L\tx\t+\ty\t+\t2M",
    ])
    view = load_gfa_canonized(path, _LOG)
    assert view.nodes["x"].seq == "aaaacc"
    assert ("x", "y") in view.edges


def test_kc_ln_coverage_tags(tmp_path):
    path = _write(tmp_path, [
        "S\tx\tAAAACC\tLN:i:6\tKC:i:300",
        "S\ty\tCCGGGG\tDP:f:40.0",
        "L\tx\t+\ty\t+\t2M",
    ])
    view = load_gfa_canonized(path, _LOG)
    assert view.nodes["x"].dp == 50.0


def test_disconnected_components(tmp_path):
    path = _write(tmp_path, [
        "S\ta\tAAAACC\tDP:f:10.0",
        "S\tb\tCCGGGG\tDP:f:90.0",
        "S\tc\tTTTTGG\tDP:f:20.0",
        "L\tb\t+\tc\t+\t2M",
    ])
    view = load_gfa_canonized(path, _LOG)
    assert set(view.nodes.keys()) == {"a", "b", "c"}
    # highest-dp component seeded first: b dequeued before c before a
    assert list(view.nodes.keys())[0] == "b"
