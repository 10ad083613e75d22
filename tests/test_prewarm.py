"""vstrains_tpu/prewarm.py — dataset-shape kernel prewarming."""

import logging
import os
from types import SimpleNamespace

import numpy as np
import pytest

from vstrains_tpu.evals.synth import make_dataset
from vstrains_tpu.prewarm import plan_widths, prewarm


def test_plan_widths_single_bucket(tmp_path):
    ds = make_dataset(str(tmp_path), num_strains=2, num_bubbles=2,
                      pairs_per_strain=50, seed=0)
    widths = plan_widths(ds.fwd_path, ds.rve_path, split_len=22,
                         batch_size=512, est_pairs=100)
    # uniform 60bp library -> one bucket at the next multiple of 32
    assert widths == [64]


def test_plan_widths_mixed_lengths(tmp_path):
    # two length populations -> two buckets, widest first
    fwd = tmp_path / "f.fastq"
    rve = tmp_path / "r.fastq"
    recs_f, recs_r = [], []
    for i in range(1000):
        ln = 100 if i % 2 else 240
        recs_f.append(f"@r{i}/1\n{'A' * ln}\n+\n{'I' * ln}\n")
        recs_r.append(f"@r{i}/2\n{'C' * ln}\n+\n{'I' * ln}\n")
    fwd.write_text("".join(recs_f))
    rve.write_text("".join(recs_r))
    widths = plan_widths(str(fwd), str(rve), split_len=56,
                         batch_size=128, est_pairs=10_000)
    assert widths == [256, 128]


def test_prewarm_end_to_end(tmp_path):
    """prewarm replays stages 1-3 and compiles the PE kernel without
    error on the CPU backend; the subsequent real inference reuses the
    jit cache in-process (identical shapes)."""
    ds = make_dataset(str(tmp_path), num_strains=2, num_bubbles=3,
                      pairs_per_strain=200, seed=1)
    args = SimpleNamespace(gfa_file=ds.gfa_path, path_file=ds.paths_path,
                           fwd=ds.fwd_path, rve=ds.rve_path,
                           min_cov=None, min_len=250,
                           pe_batch_size=512)
    rec = prewarm(args, logging.getLogger("prewarm_test"))
    assert rec["errors"] == []
    assert rec["widths"] == [64]
    assert rec["nodes"] > 0 and rec["k"] == ds.k
