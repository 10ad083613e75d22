"""Property tests for the graph-tool shim's ITERATION ORDERS.

The whole reference-A/B lattice stands on shims/graph_tool faithfully
reproducing Boost adjacency-list semantics (graph-tool uses
adjacency_list<vecS, vecS, bidirectionalS>): the reference's greedy
passes consume these orders (order-sensitive BFS in
/root/reference/utils/VStrains_IO.py:137-269, adjacency walks in
Preprocess/Extension), so an ordering bug in the shim could nudge its
tie-breaks and make the byte-level A/B pass vacuously.

These tests check the shim against an INDEPENDENT model of the
documented Boost semantics (plain Python lists maintained by the rules
below) over randomized mutation sequences:

  * vertices() iterates ascending by index;
  * out_edges(v)/in_edges(v) iterate in edge-insertion order
    (push_back on the per-vertex edge sequence);
  * remove_edge erases the edge from both sequences, preserving the
    relative order of the remaining edges;
  * re-adding a removed edge appends it at the END;
  * all_edges() is out-edges then in-edges;
  * neighbour iteration mirrors the corresponding edge iteration;
  * edges() iterates out-edge sequences in ascending source order;
  * copy() preserves every order; mutating the copy leaves the
    original untouched;
  * remove_vertex(v) (fast=False) drops v, decrements every index
    above v, preserves all adjacency orders, and remaps property maps.
"""

import os
import random
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "shims"))

from graph_tool.all import Graph  # noqa: E402


class BoostModel:
    """Independent order model: per-vertex out/in lists of (s, t)."""

    def __init__(self):
        self.n = 0
        self.out = []  # list per vertex of (s, t) in insertion order
        self.inn = []

    def add_vertex(self):
        self.out.append([])
        self.inn.append([])
        self.n += 1
        return self.n - 1

    def add_edge(self, s, t):
        if (s, t) in self.out[s]:       # shim/graph ref rejects
            self.out[s].remove((s, t))  # parallel edges upstream; model
            self.inn[t].remove((s, t))  # re-insertion as move-to-end
        self.out[s].append((s, t))
        self.inn[t].append((s, t))

    def remove_edge(self, s, t):
        if (s, t) in self.out[s]:
            self.out[s].remove((s, t))
            self.inn[t].remove((s, t))

    def remove_vertex(self, v):
        for (s, t) in list(self.out[v]):
            self.remove_edge(s, t)
        for (s, t) in list(self.inn[v]):
            self.remove_edge(s, t)
        del self.out[v]
        del self.inn[v]
        self.n -= 1

        def sh(i):
            return i - 1 if i > v else i

        self.out = [[(sh(s), sh(t)) for (s, t) in lst] for lst in self.out]
        self.inn = [[(sh(s), sh(t)) for (s, t) in lst] for lst in self.inn]


def _edge_tuples(edges):
    return [(int(e.source()), int(e.target())) for e in edges]


def _assert_same_orders(g, m):
    assert g.num_vertices() == m.n
    assert [int(v) for v in g.vertices()] == list(range(m.n))
    for i in range(m.n):
        v = g.vertex(i)
        assert _edge_tuples(v.out_edges()) == m.out[i], f"out of {i}"
        assert _edge_tuples(v.in_edges()) == m.inn[i], f"in of {i}"
        assert _edge_tuples(v.all_edges()) == m.out[i] + m.inn[i]
        assert [int(x) for x in v.out_neighbors()] == \
            [t for (_, t) in m.out[i]]
        assert [int(x) for x in v.in_neighbors()] == \
            [s for (s, _) in m.inn[i]]
        assert v.out_degree() == len(m.out[i])
        assert v.in_degree() == len(m.inn[i])
    flat = [e for lst in m.out for e in lst]
    assert _edge_tuples(g.edges()) == flat
    assert g.num_edges() == len(flat)


def _random_build(rng, n_ops=200, n_seed=6):
    g, m = Graph(directed=True), BoostModel()
    for _ in range(n_seed):
        g.add_vertex()
        m.add_vertex()
    for _ in range(n_ops):
        op = rng.random()
        if op < 0.15 or m.n < 2:
            g.add_vertex()
            m.add_vertex()
        elif op < 0.75:
            s, t = rng.randrange(m.n), rng.randrange(m.n)
            if g.edge(s, t) is None:
                g.add_edge(g.vertex(s), g.vertex(t))
                m.add_edge(s, t)
        else:
            flat = [e for lst in m.out for e in lst]
            if flat:
                s, t = flat[rng.randrange(len(flat))]
                g.remove_edge(g.edge(s, t))
                m.remove_edge(s, t)
    return g, m


def test_vertices_ascending_after_interleaved_adds():
    g, m = _random_build(random.Random(0), n_ops=60)
    assert [int(v) for v in g.vertices()] == list(range(m.n))


def test_out_edges_insertion_order():
    g = Graph(directed=True)
    for _ in range(5):
        g.add_vertex()
    for t in (3, 1, 4, 2):
        g.add_edge(g.vertex(0), g.vertex(t))
    assert _edge_tuples(g.vertex(0).out_edges()) == \
        [(0, 3), (0, 1), (0, 4), (0, 2)]


def test_in_edges_insertion_order():
    g = Graph(directed=True)
    for _ in range(5):
        g.add_vertex()
    for s in (2, 4, 1):
        g.add_edge(g.vertex(s), g.vertex(0))
    assert _edge_tuples(g.vertex(0).in_edges()) == \
        [(2, 0), (4, 0), (1, 0)]


def test_all_edges_out_then_in():
    g = Graph(directed=True)
    for _ in range(4):
        g.add_vertex()
    g.add_edge(g.vertex(1), g.vertex(0))   # in first chronologically
    g.add_edge(g.vertex(0), g.vertex(2))   # out second
    g.add_edge(g.vertex(3), g.vertex(0))
    assert _edge_tuples(g.vertex(0).all_edges()) == \
        [(0, 2), (1, 0), (3, 0)]           # out-list, then in-list


def test_remove_edge_preserves_relative_order():
    g = Graph(directed=True)
    for _ in range(6):
        g.add_vertex()
    for t in (1, 2, 3, 4, 5):
        g.add_edge(g.vertex(0), g.vertex(t))
    g.remove_edge(g.edge(0, 3))
    assert _edge_tuples(g.vertex(0).out_edges()) == \
        [(0, 1), (0, 2), (0, 4), (0, 5)]


def test_readd_after_remove_appends_at_end():
    g = Graph(directed=True)
    for _ in range(4):
        g.add_vertex()
    for t in (1, 2, 3):
        g.add_edge(g.vertex(0), g.vertex(t))
    g.remove_edge(g.edge(0, 1))
    g.add_edge(g.vertex(0), g.vertex(1))
    assert _edge_tuples(g.vertex(0).out_edges()) == \
        [(0, 2), (0, 3), (0, 1)]


def test_neighbors_mirror_edge_order():
    g = Graph(directed=True)
    for _ in range(5):
        g.add_vertex()
    for t in (4, 1, 3):
        g.add_edge(g.vertex(2), g.vertex(t))
    for s in (0, 4):
        g.add_edge(g.vertex(s), g.vertex(2))
    v = g.vertex(2)
    assert [int(x) for x in v.out_neighbors()] == [4, 1, 3]
    assert [int(x) for x in v.in_neighbors()] == [0, 4]
    assert [int(x) for x in v.all_neighbors()] == [4, 1, 3, 0, 4]


def test_copy_preserves_every_order():
    rng = random.Random(7)
    g, m = _random_build(rng)
    c = g.copy()
    _assert_same_orders(c, m)


def test_copy_is_isolated():
    g = Graph(directed=True)
    for _ in range(3):
        g.add_vertex()
    g.vp.id = g.new_vertex_property("string")
    g.vp.id[g.vertex(1)] = "one"
    g.add_edge(g.vertex(0), g.vertex(1))
    c = g.copy()
    c.remove_edge(c.edge(0, 1))
    c.add_edge(c.vertex(1), c.vertex(2))
    c.vp.id[c.vertex(1)] = "mutated"
    assert _edge_tuples(g.edges()) == [(0, 1)]
    assert g.vp.id[g.vertex(1)] == "one"


def test_remove_vertex_shifts_and_preserves_orders():
    g, m = Graph(directed=True), BoostModel()
    for _ in range(6):
        g.add_vertex()
        m.add_vertex()
    for s, t in ((0, 2), (3, 2), (2, 5), (2, 4), (5, 0), (4, 3)):
        g.add_edge(g.vertex(s), g.vertex(t))
        m.add_edge(s, t)
    g.remove_vertex(g.vertex(2))
    m.remove_vertex(2)
    _assert_same_orders(g, m)


def test_remove_vertex_remaps_property_maps():
    g = Graph(directed=True)
    for _ in range(4):
        g.add_vertex()
    g.vp.id = g.new_vertex_property("string")
    g.ep.w = g.new_edge_property("double")
    for i in range(4):
        g.vp.id[g.vertex(i)] = f"v{i}"
    e = g.add_edge(g.vertex(1), g.vertex(3))
    g.ep.w[e] = 2.5
    g.remove_vertex(g.vertex(0))
    assert [g.vp.id[v] for v in g.vertices()] == ["v1", "v2", "v3"]
    assert g.ep.w[g.edge(0, 2)] == 2.5   # (1,3) shifted to (0,2)


def test_remove_vertex_drops_incident_edges_and_props():
    g = Graph(directed=True)
    for _ in range(3):
        g.add_vertex()
    g.ep.w = g.new_edge_property("int")
    g.ep.w[g.add_edge(g.vertex(0), g.vertex(1))] = 7
    g.ep.w[g.add_edge(g.vertex(1), g.vertex(2))] = 8
    g.remove_vertex(g.vertex(1))
    assert g.num_edges() == 0
    assert g.num_vertices() == 2
    # no stale property entries survive under the shifted keys
    assert not g.ep.w._vals


def test_descending_removal_loop_like_reference():
    """The reference's overlap-graph cleanup removes vertices while
    iterating sorted(vertices(), reverse=True)
    (/root/reference/utils/VStrains_Utilities.py:697-708) — valid under
    Boost because removal only renumbers indices ABOVE the removed one,
    all already visited. Replay that exact pattern."""
    g = Graph(directed=True)
    for _ in range(6):
        g.add_vertex()
    g.vp.id = g.new_vertex_property("string")
    for i in range(6):
        g.vp.id[g.vertex(i)] = str(i)
    # chain 0->1->2, isolated 3, 4<->5 (both deg>1 after loop? no: make
    # 4,5 each in+out degree 1 so they survive; 3 isolated dies)
    for s, t in ((0, 1), (1, 2), (4, 5), (5, 4)):
        g.add_edge(g.vertex(s), g.vertex(t))
    has_del = True
    while has_del:
        has_del = False
        for node in sorted(g.vertices(), reverse=True):
            if (node.in_degree() == 0 and node.out_degree() == 0) or (
                    node.in_degree() > 1 or node.out_degree() > 1):
                for edge in set(node.all_edges()):
                    g.remove_edge(edge)
                g.remove_vertex(node)
                has_del = True
    assert sorted(g.vp.id[v] for v in g.vertices()) == \
        ["0", "1", "2", "4", "5"]


def test_randomized_mutation_soak_orders_match_model():
    for seed in range(8):
        rng = random.Random(seed)
        g, m = _random_build(rng, n_ops=300, n_seed=4)
        _assert_same_orders(g, m)


def test_randomized_soak_with_vertex_removal():
    for seed in range(6):
        rng = random.Random(100 + seed)
        g, m = _random_build(rng, n_ops=150, n_seed=8)
        for _ in range(4):
            if m.n <= 2:
                break
            v = rng.randrange(m.n)
            g.remove_vertex(g.vertex(v))
            m.remove_vertex(v)
            _assert_same_orders(g, m)
