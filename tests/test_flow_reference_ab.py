"""Edge-flow A/B (C14): our segment-sum / exact-host flow assignment
vs the actual reference's per-edge numpy loop on random graphs —
imported directly via shims/."""

import logging
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
_LOG = logging.getLogger("flow_ab")


@pytest.mark.skipif(not os.path.exists(f"{REFERENCE}/vstrains"),
                    reason="reference not mounted")
def test_edge_flow_matches_reference():
    sys.path.insert(0, f"{REPO}/shims")
    sys.path.insert(0, REFERENCE)
    try:
        from utils.VStrains_Utilities import assign_edge_flow as ref_flow
    finally:
        sys.path.remove(f"{REPO}/shims")
        sys.path.remove(REFERENCE)

    from graph_tool.all import Graph

    from vstrains_tpu.core.graph import new_view
    from vstrains_tpu.ops.graph_ops import assign_edge_flow

    rng = np.random.RandomState(11)
    for trial in range(20):
        n = int(rng.randint(4, 40))
        dps = rng.uniform(1.0, 150.0, n)
        edges = set()
        for _ in range(int(rng.randint(n, 3 * n))):
            a, b = rng.choice(n, 2, replace=False)
            edges.add((int(a), int(b)))

        # reference side (shim graph)
        g = Graph(directed=True)
        g.vp.dp = g.new_vertex_property("double")
        g.ep.flow = g.new_edge_property("double", val=0.0)
        nd, ed = {}, {}
        for i in range(n):
            v = g.add_vertex()
            g.vp.dp[v] = float(dps[i])
            nd[str(i)] = v
        for a, b in sorted(edges):
            ed[(str(a), str(b))] = g.add_edge(nd[str(a)], nd[str(b)])
        ref_flow(g, nd, ed)

        # our side
        view = new_view()
        vs = {str(i): view.add_vertex(str(i), float(dps[i]), "ACGT")
              for i in range(n)}
        for a, b in sorted(edges):
            view.add_edge(vs[str(a)], vs[str(b)], 2)
        assign_edge_flow(view, exact=True)

        for (a, b), e in ed.items():
            ours = view.edges[(a, b)].flow
            np.testing.assert_allclose(
                ours, g.ep.flow[e], rtol=0, atol=0,
                err_msg=f"trial {trial} edge {(a, b)}")
