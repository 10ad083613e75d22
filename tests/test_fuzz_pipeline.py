"""Pipeline fuzz soak: random synthetic configs must run to completion
with valid outputs (and recover haplotypes when the signal is clean)."""

import logging
import os
from types import SimpleNamespace

import numpy as np
import pytest

from vstrains_tpu import pipeline
from vstrains_tpu.evals.synth import make_dataset

_LOG = logging.getLogger("fuzz")


def _read_fasta(path):
    seqs, name = {}, None
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if line.startswith(">"):
                name = line
                seqs[name] = ""
            elif line:
                seqs[name] += line
    return seqs


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(8))
def test_random_configs_run_clean(tmp_path, seed):
    rng = np.random.RandomState(1000 + seed)
    n_strains = int(rng.randint(2, 6))
    kwargs = dict(
        num_strains=n_strains,
        num_bubbles=int(rng.randint(2, 6)),
        anchor_len=int(rng.randint(120, 400)),
        variant_len=int(rng.randint(80, 160)),
        pairs_per_strain=int(rng.randint(150, 600)),
        abundances=tuple(sorted(rng.randint(15, 120, n_strains)
                                .astype(float))),
        contig_mode=["full", "split"][rng.randint(0, 2)],
        error_rate=float(rng.choice([0.0, 0.002, 0.005])),
        seed=int(rng.randint(0, 10_000)))
    # distinct abundances (equal ones are legitimately ambiguous)
    if len(set(kwargs["abundances"])) < n_strains:
        kwargs["abundances"] = tuple(
            20.0 + 17.0 * i for i in range(n_strains))
    ds = make_dataset(str(tmp_path / "data"), **kwargs)
    out = tmp_path / "out"
    for sub in ["gfa", "tmp", "paf", "aln"]:
        os.makedirs(out / sub)
    args = SimpleNamespace(
        gfa_file=ds.gfa_path, path_file=ds.paths_path,
        fwd=ds.fwd_path, rve=ds.rve_path, output_dir=str(out),
        min_cov=None, min_len=250, dev=True,  # dev: invariant checks on
        pe_batch_size=512, resume=False)
    pipeline.run(args, _LOG)

    seqs = _read_fasta(out / "strain.fasta")
    assert seqs, "no strains emitted"
    for name, seq in seqs.items():
        assert set(seq) <= set("ACGT"), f"invalid bases in {name}"
    recovered = set(seqs.values())
    hits = sum(1 for h in ds.true_haplotypes if h in recovered)
    # clean staggered-abundance signals should recover everything; allow
    # one miss for the adversarial random geometries
    assert hits >= n_strains - 1, (
        f"{hits}/{n_strains} recovered for {kwargs}")
