"""Threshold-estimation A/B: our vectorized cutoff must equal the
actual reference's `threshold_estimation` (C7) on the same coverage
vectors — including the peak-in-lowest-bin ratio walk. The reference
function is imported directly (graph objects via shims/); its
matplotlib side effects are stubbed out for speed."""

import logging
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
_LOG = logging.getLogger("thr_ab")


@pytest.mark.skipif(not os.path.exists(f"{REFERENCE}/vstrains"),
                    reason="reference not mounted")
def test_threshold_matches_reference(monkeypatch, tmp_path):
    sys.path.insert(0, f"{REPO}/shims")
    sys.path.insert(0, REFERENCE)
    try:
        from utils import VStrains_Preprocess as REF
    finally:
        sys.path.remove(f"{REPO}/shims")
        sys.path.remove(REFERENCE)
    for fn in ("figure", "hist", "axvline", "title", "xticks",
               "savefig"):
        monkeypatch.setattr(REF.plt, fn, lambda *a, **k: None)

    from graph_tool.all import Graph

    from vstrains_tpu.ops.graph_ops import threshold_estimation

    def ref_threshold(dps):
        g = Graph(directed=True)
        g.vp.dp = g.new_vertex_property("double")
        for d in dps:
            v = g.add_vertex()
            g.vp.dp[v] = float(d)
        os.makedirs(tmp_path / "tmp", exist_ok=True)
        return REF.threshold_estimation(g, _LOG, str(tmp_path))

    rng = np.random.RandomState(3)
    checked = 0
    for trial in range(40):
        n = int(rng.randint(5, 300))
        kind = trial % 4
        if kind == 0:       # noise spike at low coverage + real signal
            dps = np.concatenate([rng.uniform(1, 5, n),
                                  rng.uniform(40, 120, max(3, n // 4))])
        elif kind == 1:     # broad uniform
            dps = rng.uniform(10, 200, n)
        elif kind == 2:     # two clusters
            dps = np.concatenate([rng.normal(30, 2, n),
                                  rng.normal(90, 5, n)])
        else:               # heavy-tailed
            dps = rng.lognormal(3.0, 0.8, n)
        dps = np.maximum(dps, 0.5)
        # the reference's histogram call raises for degenerate bin
        # counts (our guard is a documented divergence) — skip those
        med = float(np.median(dps))
        nbins = int((dps.max() - dps.min()) // (0.05 * med))
        if nbins < 1:
            continue
        expected = ref_threshold(dps)
        got = threshold_estimation(dps, _LOG)
        assert got == pytest.approx(expected, rel=0, abs=0), (
            f"trial {trial}: ours {got} != reference {expected}")
        checked += 1
    assert checked >= 30  # the sweep must mostly exercise real cases
