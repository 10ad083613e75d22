"""Minimal pure-Python stand-in for the graph-tool API surface the
reference implementation (/root/reference) actually uses, so the REAL
reference pipeline can run in this environment (graph-tool's C++ wheel
is unavailable here) and be diffed against vstrains_tpu end-to-end.

Covered (inventoried by grep over /root/reference/utils/*.py):
Graph(directed=True), new_vertex_property/new_edge_property (with
defaults), the .vp/.ep property namespaces, add_vertex(), add_edge(),
vertex(i), edge(u, v), vertices(), edges(), num_vertices(),
num_edges(), remove_edge(), copy(); Vertex.in_edges/out_edges/
in_neighbors/out_neighbors/in_degree/out_degree/all_edges;
Edge.source/target; graph_tool.topology.all_circuits (Johnson);
graph_tool.draw.graph_draw (no-op stub).

Iteration-order semantics match graph-tool's Boost adjacency lists:
vertices by index, adjacency in insertion order — the orders the
reference's greedy passes consume.
"""

from __future__ import annotations

import copy as _copy
import os as _os
from typing import Dict, List, Optional

# Test hook: VSTRAINS_SHIM_PERTURB=reverse_adjacency reverses every
# adjacency iteration order (out/in edges and neighbours). Used by the
# perturbation A/B test to demonstrate that reference-vs-vstrains_tpu
# conclusions do not hinge on one incidental shim ordering.
_PERTURB = _os.environ.get("VSTRAINS_SHIM_PERTURB", "")


def _adj_order(vals):
    vals = list(vals)
    if _PERTURB == "reverse_adjacency":
        vals.reverse()
    return vals


class Vertex(int):
    """A vertex is its index (graph-tool prints/sorts them that way);
    navigation methods consult the owning graph."""

    def __new__(cls, idx: int, graph: "Graph" = None):
        v = super().__new__(cls, idx)
        v._g = graph
        return v

    def out_edges(self):
        return _adj_order(self._g._out[int(self)].values())

    def in_edges(self):
        return _adj_order(self._g._in[int(self)].values())

    def all_edges(self):
        # graph-tool order: out-edges then in-edges
        return self.out_edges() + self.in_edges()

    def out_neighbors(self):
        return [self._g.vertex(t)
                for t in _adj_order(self._g._out[int(self)])]

    def in_neighbors(self):
        return [self._g.vertex(s)
                for s in _adj_order(self._g._in[int(self)])]

    def out_degree(self):
        return len(self._g._out[int(self)])

    def in_degree(self):
        return len(self._g._in[int(self)])

    def all_neighbors(self):
        # graph-tool order: out-neighbours then in-neighbours
        return self.out_neighbors() + self.in_neighbors()

    all_neighbours = all_neighbors


class Edge:
    __slots__ = ("_g", "_s", "_t")

    def __init__(self, graph: "Graph", s: int, t: int):
        self._g = graph
        self._s = s
        self._t = t

    def source(self) -> Vertex:
        return self._g.vertex(self._s)

    def target(self) -> Vertex:
        return self._g.vertex(self._t)

    def __eq__(self, other):
        return (isinstance(other, Edge) and other._g is self._g
                and other._s == self._s and other._t == self._t)

    def __hash__(self):
        return hash((id(self._g), self._s, self._t))

    def __lt__(self, other):
        return (self._s, self._t) < (other._s, other._t)

    def __repr__(self):
        return f"({self._s}, {self._t})"


_TYPE_DEFAULTS = {
    "string": "",
    "double": 0.0,
    "float": 0.0,
    "int": 0,
    "int16_t": 0,
    "int32_t": 0,
    "int64_t": 0,
    "long": 0,
    "bool": False,
}


class PropertyMap:
    """Vertex/edge property map: keyed by vertex index or (s, t)."""

    def __init__(self, default):
        self._default = default
        self._vals: Dict = {}

    @staticmethod
    def _key(k):
        if isinstance(k, Edge):
            return (k._s, k._t)
        return int(k)

    def __getitem__(self, k):
        return self._vals.get(self._key(k), self._default)

    def __setitem__(self, k, v):
        self._vals[self._key(k)] = v


class _PropNamespace:
    """The `.vp` / `.ep` attribute namespaces."""

    def __init__(self):
        object.__setattr__(self, "_maps", {})

    def __setattr__(self, name, pmap):
        self._maps[name] = pmap

    def __getattr__(self, name):
        try:
            return object.__getattribute__(self, "_maps")[name]
        except KeyError:
            raise AttributeError(name)


class Graph:
    def __init__(self, directed: bool = True):
        self._directed = directed
        self._n = 0
        self._out: List[Dict[int, Edge]] = []
        self._in: List[Dict[int, Edge]] = []
        self.vp = _PropNamespace()
        self.ep = _PropNamespace()

    # -- properties ------------------------------------------------------
    def new_vertex_property(self, type_name: str, val=None):
        if val is None:
            val = _TYPE_DEFAULTS.get(type_name, None)
        return PropertyMap(val)

    def new_edge_property(self, type_name: str, val=None):
        if val is None:
            val = _TYPE_DEFAULTS.get(type_name, None)
        return PropertyMap(val)

    # -- structure -------------------------------------------------------
    def add_vertex(self):
        self._out.append({})
        self._in.append({})
        self._n += 1
        return Vertex(self._n - 1, self)

    def vertex(self, i) -> Vertex:
        return Vertex(int(i), self)

    def add_edge(self, source=None, target=None) -> Edge:
        s, t = int(source), int(target)
        e = Edge(self, s, t)
        self._out[s][t] = e
        self._in[t][s] = e
        return e

    def edge(self, u, v) -> Optional[Edge]:
        return self._out[int(u)].get(int(v))

    def remove_edge(self, e: Edge):
        self._out[e._s].pop(e._t, None)
        self._in[e._t].pop(e._s, None)

    def remove_vertex(self, v):
        """graph-tool remove_vertex(fast=False) semantics: the vertex and
        its incident edges are removed and every vertex index above it is
        decremented by one; property maps follow their vertices/edges."""
        i = int(v)
        # drop incident edges first (mirrors Boost clearing the vertex)
        for e in list(self._out[i].values()) + list(self._in[i].values()):
            self.remove_edge(e)
        del self._out[i]
        del self._in[i]
        self._n -= 1

        def _shift(j):
            return j - 1 if j > i else j

        # each Edge object is shared between _out[s] and _in[t]: shift
        # its endpoints exactly once, then rebuild the adjacency keys
        for adj in self._out:
            for e in adj.values():
                e._s = _shift(e._s)
                e._t = _shift(e._t)
        for adj_list in (self._out, self._in):
            for k, adj in enumerate(adj_list):
                adj_list[k] = {_shift(j): e for j, e in adj.items()}
        for pmap in self.vp._maps.values():
            pmap._vals = {_shift(k): val
                          for k, val in pmap._vals.items() if k != i}
        for pmap in self.ep._maps.values():
            pmap._vals = {(_shift(s), _shift(t)): val
                          for (s, t), val in pmap._vals.items()
                          if s != i and t != i}

    def vertices(self):
        return [Vertex(i, self) for i in range(self._n)]

    def edges(self):
        return [e for adj in self._out for e in adj.values()]

    def num_vertices(self) -> int:
        return self._n

    def num_edges(self) -> int:
        return sum(len(adj) for adj in self._out)

    def is_directed(self) -> bool:
        return self._directed

    def copy(self) -> "Graph":
        g = Graph(self._directed)
        g._n = self._n
        g._out = [{} for _ in range(self._n)]
        g._in = [{} for _ in range(self._n)]
        # rebuild the out- and in-adjacency dicts INDEPENDENTLY so both
        # keep their own insertion orders (re-adding edges out-list-wise
        # would rewrite every in-list in out order — caught by the
        # property tests against the Boost order model)
        emap = {}
        for s, adj in enumerate(self._out):
            for t, _ in adj.items():
                e = Edge(g, s, t)
                emap[(s, t)] = e
                g._out[s][t] = e
        for t, adj in enumerate(self._in):
            for s in adj:
                g._in[t][s] = emap[(s, t)]
        for ns_src, ns_dst in ((self.vp, g.vp), (self.ep, g.ep)):
            for name, pmap in ns_src._maps.items():
                np_ = PropertyMap(pmap._default)
                np_._vals = _copy.deepcopy(pmap._vals)
                setattr(ns_dst, name, np_)
        return g
