"""Device graph passes vs exact host mirrors."""

import numpy as np
import pytest

from vstrains_tpu.core.graph import new_view
from vstrains_tpu.ops.graph_ops import (assign_edge_flow, edge_flow_device,
                                        graph_is_dag_device,
                                        threshold_estimation)


def _diamond():
    v = new_view()
    a = v.add_vertex("a", 100.0, "A" * 10)
    b = v.add_vertex("b", 60.0, "C" * 10)
    c = v.add_vertex("c", 40.0, "G" * 10)
    d = v.add_vertex("d", 100.0, "T" * 10)
    v.add_edge(a, b, 2)
    v.add_edge(a, c, 2)
    v.add_edge(b, d, 2)
    v.add_edge(c, d, 2)
    return v


def test_edge_flow_exact_reference_formula():
    v = _diamond()
    assign_edge_flow(v, exact=True)
    # flow(u,v) = mean(dp[v]/out_sum(u)*dp[u], dp[u]/in_sum(v)*dp[v])
    # flow(a,b) = mean(60/100*100, 100/100*60) = 60
    assert v.edges[("a", "b")].flow == pytest.approx(60.0)
    assert v.edges[("a", "c")].flow == pytest.approx(
        np.mean([40 / 100 * 100, 100 / 100 * 40]))
    assert v.edges[("b", "d")].flow == pytest.approx(
        np.mean([100 / 100 * 60, 60 / 100 * 100]))


def test_edge_flow_device_matches_exact():
    v = _diamond()
    assign_edge_flow(v, exact=True)
    exact = [e.flow for e in v.edges.values()]
    dev = edge_flow_device(v.tensors())
    np.testing.assert_allclose(dev, exact, rtol=1e-6)


def test_threshold_uniform_coverage_is_zero():
    assert threshold_estimation(np.array([50.0] * 10)) == 0.0


def test_threshold_low_peak_grows_ratio():
    # many low-coverage nodes (global peak at the lowest bin) + a strictly
    # descending tail -> ratio grows from 0.05
    dps = np.array([1.0] * 50 + [3.0] * 30 + [5.0] * 10 + [100.0] * 20)
    thr = threshold_estimation(dps)
    assert thr > 0.0


def test_threshold_high_peak_zero():
    dps = np.array([1.0] * 5 + [100.0] * 60 + [50.0] * 10)
    assert threshold_estimation(dps) == 0.0


def test_dag_check_device():
    v = _diamond()
    assert graph_is_dag_device(v.tensors())
    v.add_edge(v.nodes["d"], v.nodes["a"], 2)
    assert not graph_is_dag_device(v.tensors())


def test_dag_check_host_matches():
    from vstrains_tpu.algos.dag import graph_is_DAG
    v = _diamond()
    assert graph_is_DAG(v)
    v.add_edge(v.nodes["d"], v.nodes["a"], 2)
    assert not graph_is_DAG(v)
