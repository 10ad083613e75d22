"""Canonization A/B against the ACTUAL reference on mixed-orientation
bidirected graphs — the full-pipeline A/B datasets are all-'+' GFAs, so
the flip logic's hard cases (mixed ori, merged bidirected edge classes,
ambiguous keep-both twins) only get reference coverage here.

The reference's flip itself is PYTHONHASHSEED-dependent (set iteration
at pick sites; measured: 2 output variants over 24 seeds on one fuzz
graph), so the contract is: our canonized GFA must equal the
reference's output under SOME hash seed — i.e. be one of the
reference's own possible outputs (same standard as strain.fasta,
docs/DIVERGENCES.md #1). In practice 11/12 graphs match at seed 0 and
the 12th at seed 1."""

import logging
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.test_canon_fuzz import _write_random_gfa
from vstrains_tpu.core.canon import load_gfa_canonized
from vstrains_tpu.core.gfa import write_gfa

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
_LOG = logging.getLogger("canon_ab")

_REF_DRIVER = """
import sys, logging
from utils.VStrains_IO import gfa_to_graph, graph_to_gfa
log = logging.getLogger("ref"); log.addHandler(logging.NullHandler())
g, nd, ed = gfa_to_graph(sys.argv[1], log)
graph_to_gfa(g, nd, ed, log, sys.argv[2])
"""


def _ref_canonize(driver, gfa, out, hashseed):
    env = dict(os.environ)
    env["PYTHONHASHSEED"] = str(hashseed)
    env["PYTHONPATH"] = f"{REPO}/shims:{REFERENCE}"
    r = subprocess.run([sys.executable, driver, gfa, out],
                       cwd=REFERENCE, env=env, capture_output=True,
                       text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-1000:]
    return sorted(open(out).read().splitlines())


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(f"{REFERENCE}/vstrains"),
                    reason="reference not mounted")
@pytest.mark.parametrize("seed", range(12))
def test_canonization_matches_reference(tmp_path, seed):
    rng = np.random.RandomState(seed)
    gfa = str(tmp_path / "g.gfa")
    _write_random_gfa(gfa, rng)

    view = load_gfa_canonized(gfa, _LOG)
    ours_p = str(tmp_path / "ours.gfa")
    write_gfa(view, ours_p)
    ours = sorted(open(ours_p).read().splitlines())

    driver = str(tmp_path / "drv.py")
    open(driver, "w").write(_REF_DRIVER)
    variants = []
    for hs in (0, 1, 7, 13, 23):
        ref = _ref_canonize(driver, gfa, str(tmp_path / f"r{hs}.gfa"), hs)
        if ours == ref:
            return  # byte-identical to the reference under this seed
        variants.append(ref)
    raise AssertionError(
        "our canonization matches none of the reference's outputs over "
        f"5 hash seeds; ours-only lines: "
        f"{[l for l in ours if l not in variants[0]][:3]}")
