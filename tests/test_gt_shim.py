"""Unit tests for the graph-tool/gfapy shim (shims/) — the pieces the
reference exercises, including ones the A/B configs may not reach
(all_circuits on cyclic overlap graphs, graph.copy, remove_edge)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "shims"))

from graph_tool.all import Graph  # noqa: E402
from graph_tool.topology import all_circuits  # noqa: E402


def _mk(edges, n):
    g = Graph(directed=True)
    g.vp.id = g.new_vertex_property("string")
    for i in range(n):
        v = g.add_vertex()
        g.vp.id[v] = str(i)
    for s, t in edges:
        g.add_edge(g.vertex(s), g.vertex(t))
    return g


def test_structure_and_properties():
    g = _mk([(0, 1), (1, 2), (0, 2)], 3)
    assert g.num_vertices() == 3 and g.num_edges() == 3
    v1 = g.vertex(1)
    assert v1.in_degree() == 1 and v1.out_degree() == 1
    assert [int(x) for x in v1.in_neighbors()] == [0]
    assert [int(x) for x in v1.out_neighbors()] == [2]
    assert [int(x) for x in v1.all_neighbors()] == [2, 0]  # out then in
    e = g.edge(0, 2)
    assert int(e.source()) == 0 and int(e.target()) == 2
    assert g.edge(2, 0) is None
    # property default + assignment
    g.ep.flow = g.new_edge_property("double", val=0.0)
    assert g.ep.flow[e] == 0.0
    g.ep.flow[e] = 3.5
    assert g.ep.flow[e] == 3.5
    # vertices sort as their indices (reference sorts vertex lists)
    assert sorted(g.vertices(), reverse=True)[0] == 2


def test_remove_edge_and_copy():
    g = _mk([(0, 1), (1, 0)], 2)
    g.vp.id[g.vertex(0)] = "a"
    c = g.copy()
    g.remove_edge(g.edge(0, 1))
    assert g.num_edges() == 1
    assert c.num_edges() == 2          # copy unaffected
    assert c.vp.id[c.vertex(0)] == "a"  # properties copied


def test_all_circuits_johnson():
    # two disjoint cycles + a tail: (0,1,2), (3,4), vertex 5 acyclic
    g = _mk([(0, 1), (1, 2), (2, 0), (3, 4), (4, 3), (2, 5)], 6)
    circuits = [list(c) for c in all_circuits(g, unique=True)]
    assert [0, 1, 2] in circuits
    assert [3, 4] in circuits
    assert len(circuits) == 2
    # each circuit starts at its smallest vertex (graph-tool convention)
    for c in circuits:
        assert c[0] == min(c)


def test_gfapy_facade(tmp_path):
    import gfapy
    p = tmp_path / "t.gfa"
    p.write_text("H\tVN:Z:1.0\nS\t1\tACGT\tDP:f:10.0\n"
                 "L\t1\t+\t1\t-\t2M\n")
    gfa = gfapy.Gfa().from_file(filename=str(p))
    assert len(gfa.lines) == 3
    assert gfa.version == "1.0"
    assert [str(s).split("\t")[1] for s in gfa.segments] == ["1"]
    assert len(gfa.edges) == 1
