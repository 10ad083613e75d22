"""Checkpoint/resume: re-running from any stage reproduces the result."""

import logging
import os
from types import SimpleNamespace

import pytest

from vstrains_tpu import pipeline
from vstrains_tpu.evals.synth import make_dataset

_LOG = logging.getLogger("resume")


def _args(ds, out_dir, resume=False):
    return SimpleNamespace(
        gfa_file=ds.gfa_path, path_file=ds.paths_path,
        fwd=ds.fwd_path, rve=ds.rve_path,
        output_dir=str(out_dir), min_cov=None, min_len=250, dev=False,
        pe_batch_size=256, resume=resume)


def _read(path):
    with open(path) as f:
        return f.read()


@pytest.mark.slow
def test_resume_reproduces_output(tmp_path):
    ds = make_dataset(str(tmp_path / "data"), num_strains=2, num_bubbles=2,
                      pairs_per_strain=300, seed=21)
    out = tmp_path / "out"
    for sub in ["gfa", "tmp", "paf", "aln"]:
        os.makedirs(out / sub)
    pipeline.run(_args(ds, out), _LOG)
    ref_fasta = _read(out / "strain.fasta")
    ref_paths = _read(out / "strain.paths")
    assert (out / "ckpt" / "extended.json").exists()
    assert (out / "timings.json").exists()

    # resume from the final checkpoint: only finalize re-runs
    os.remove(out / "strain.fasta")
    pipeline.run(_args(ds, out, resume=True), _LOG)
    assert _read(out / "strain.fasta") == ref_fasta
    assert _read(out / "strain.paths") == ref_paths

    # drop the last checkpoints: resume re-runs disentangle+extension
    os.remove(out / "ckpt" / "extended.json")
    os.remove(out / "ckpt" / "disentangled.json")
    os.remove(out / "strain.fasta")
    pipeline.run(_args(ds, out, resume=True), _LOG)
    assert _read(out / "strain.fasta") == ref_fasta

    # resume from pe_links only (re-runs cleaning onwards)
    for st in ["extended", "disentangled", "cleaned"]:
        os.remove(out / "ckpt" / f"{st}.json")
    pipeline.run(_args(ds, out, resume=True), _LOG)
    assert _read(out / "strain.fasta") == ref_fasta
