"""Batched numeric graph passes on device (with exact host mirrors).

The assembly graph lives in HBM as dense GraphTensors; per-edge / per-node
numeric passes run as one-shot segment ops instead of the reference's
per-edge Python loops:

  * edge-flow assignment (reference: VStrains_Utilities.py:14-31) —
    two segment-sums + one fused elementwise pass over all edges;
  * coverage-threshold histogram (reference: VStrains_Preprocess.py:37-70);
  * DAG check as iterative source-elimination (Kahn) over the dense edge
    list — a bounded frontier iteration, the device analogue of the
    reference's recursive DFS (Utilities:1158-1202).

Graphs here are small (10^2..10^4 nodes), so each function also has an exact
float64 host path; `assign_edge_flow` picks host for small graphs (kernel
launch overhead dominates) and device above a size cutoff. Both paths are
property-tested against each other.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from vstrains_tpu.core.graph import GraphTensors, GraphView

_DEVICE_EDGE_CUTOFF = 20_000


@partial(jax.jit, static_argnames=("num_nodes",))
def _edge_flow_kernel(dp, edge_src, edge_dst, num_nodes: int):
    """flow(u,v) = mean(dp[v]/out_sum(u) * dp[u], dp[u]/in_sum(v) * dp[v])."""
    out_sum = jax.ops.segment_sum(dp[edge_dst], edge_src,
                                  num_segments=num_nodes)
    in_sum = jax.ops.segment_sum(dp[edge_src], edge_dst,
                                 num_segments=num_nodes)
    du = dp[edge_src]
    dv = dp[edge_dst]
    return 0.5 * (dv / out_sum[edge_src] * du + du / in_sum[edge_dst] * dv)


def edge_flow_device(t: GraphTensors) -> np.ndarray:
    """Device path: all edge flows in one pass."""
    if t.num_edges == 0:
        return np.zeros(0, dtype=np.float32)
    return np.asarray(_edge_flow_kernel(jnp.asarray(t.dp),
                                        jnp.asarray(t.edge_src),
                                        jnp.asarray(t.edge_dst),
                                        num_nodes=t.num_nodes))


def assign_edge_flow(view: GraphView, exact: Optional[bool] = None) -> None:
    """Write coverage-proportional flow onto every live edge.

    Parity: VStrains_Utilities.py:14-31. exact=None auto-selects host
    float64 for small graphs, device segment-sums for large ones.
    """
    if exact is None:
        exact = view.num_edges() < _DEVICE_EDGE_CUTOFF
    if exact:
        for (u, v), e in view.edges.items():
            u_node = view.nodes[u]
            v_node = view.nodes[v]
            u_out_sum = float(np.sum([n.dp for n in u_node.out_neighbors()]))
            v_in_sum = float(np.sum([n.dp for n in v_node.in_neighbors()]))
            e.flow = float(np.mean([
                (v_node.dp / u_out_sum) * u_node.dp,
                (u_node.dp / v_in_sum) * v_node.dp,
            ]))
    else:
        t = view.tensors()
        flows = edge_flow_device(t)
        for e, f in zip(view.edges.values(), flows):
            e.flow = float(f)


def save_coverage_plot(dps: np.ndarray, threshold: float,
                       out_path: str) -> bool:
    """Coverage histogram plot with the chosen cutoff (parity:
    VStrains_Preprocess.py:62-69). Optional: returns False when matplotlib
    is unavailable."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return False
    dps = np.asarray(dps, dtype=np.float64)
    plt.figure(figsize=(16, 8))
    plt.hist(x=dps, bins=min(len(dps), 200))
    plt.axvline(threshold, color="r")
    plt.title("node depth histogram")
    plt.xlabel("depth")
    plt.ylabel("nodes")
    plt.savefig(out_path)
    plt.close()
    return True


def threshold_estimation(dps: np.ndarray, logger=None) -> float:
    """Histogram-based low-coverage cutoff (VStrains_Preprocess.py:37-70).

    If the global histogram peak falls in the lowest bin, the cutoff ratio
    grows by 0.05 per strictly-descending bin (max 4 steps); threshold =
    ratio * median.
    """
    dps = np.asarray(dps, dtype=np.float64)
    if dps.size == 0 or dps.max() == dps.min():
        return 0.00
    med = np.median(dps)
    nbins = int((dps.max() - dps.min()) // (0.05 * med))
    if nbins <= 0:
        return 0.00
    regions, _bins = np.histogram(dps, bins=nbins)
    pidx = int(np.argmax(regions))  # first max
    ratio = 0.00
    if pidx == 0:
        ratio = 0.05
        for i in range(0, 4):
            if i >= len(regions):
                if logger:
                    logger.warning("histogram is not properly set, reset "
                                   "cutoff to default (0.05*M)")
                ratio = 0.05
                break
            if i + 1 >= len(regions):
                break
            if regions[i] > regions[i + 1]:
                ratio += 0.05
            else:
                break
    return float(ratio * med)


@partial(jax.jit, static_argnames=("num_nodes", "max_iters"))
def _dag_check_kernel(edge_src, edge_dst, node_live, num_nodes: int,
                      max_iters: int):
    """Iterative source elimination: returns True iff the live subgraph is a
    DAG. Device frontier analogue of the reference DFS (Utilities:1158)."""
    edge_live0 = node_live[edge_src] & node_live[edge_dst]

    def body(state):
        live, edge_live, _changed = state
        indeg = jax.ops.segment_sum(edge_live.astype(jnp.int32), edge_dst,
                                    num_segments=num_nodes)
        new_live = live & (indeg > 0)
        new_edge_live = edge_live & new_live[edge_src]
        changed = jnp.any(new_live != live)
        return new_live, new_edge_live, changed

    def cond(state):
        return state[2]

    live, _, _ = jax.lax.while_loop(
        cond, body, (node_live, edge_live0, jnp.array(True)))
    return ~jnp.any(live)


def graph_is_dag_device(t: GraphTensors) -> bool:
    if t.num_edges == 0:
        return True
    live = np.ones(t.num_nodes, dtype=bool)
    return bool(_dag_check_kernel(jnp.asarray(t.edge_src),
                                  jnp.asarray(t.edge_dst),
                                  jnp.asarray(live),
                                  num_nodes=t.num_nodes,
                                  max_iters=t.num_nodes))
