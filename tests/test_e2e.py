"""End-to-end pipeline: recover known haplotypes from a synthetic
quasispecies mixture (graph + contigs + reads -> strain.fasta)."""

import logging
import os
from types import SimpleNamespace

import pytest

from vstrains_tpu import pipeline
from vstrains_tpu.evals.synth import make_dataset

_LOG = logging.getLogger("e2e")
_LOG.setLevel(logging.DEBUG)


def _run(tmp_path, **synth_kwargs):
    data_dir = tmp_path / "data"
    out_dir = tmp_path / "out"
    ds = make_dataset(str(data_dir), **synth_kwargs)
    for sub in ["gfa", "tmp", "paf", "aln"]:
        os.makedirs(out_dir / sub)
    args = SimpleNamespace(
        gfa_file=ds.gfa_path, path_file=ds.paths_path,
        fwd=ds.fwd_path, rve=ds.rve_path,
        output_dir=str(out_dir), min_cov=None, min_len=250, dev=True,
        pe_batch_size=256)
    pipeline.run(args, _LOG)
    return ds, out_dir


def _read_fasta(path):
    seqs = {}
    name = None
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if line.startswith(">"):
                name = line[1:]
                seqs[name] = ""
            elif line and name is not None:
                seqs[name] += line
    return seqs


@pytest.mark.slow
def test_two_strain_recovery_full_contigs(tmp_path):
    ds, out = _run(tmp_path, num_strains=2, num_bubbles=3,
                   pairs_per_strain=400, seed=11, contig_mode="full")
    seqs = _read_fasta(out / "strain.fasta")
    assert len(seqs) >= 2
    recovered = set(seqs.values())
    for hap in ds.true_haplotypes:
        assert hap in recovered, "haplotype not reconstructed"
    # stage checkpoints exist
    for f in ["gfa/graph_L0.gfa", "gfa/s_graph_L1.gfa",
              "gfa/es_graph_L2.gfa", "gfa/split_graph_final.gfa",
              "aln/pe_info", "aln/st_info", "strain.paths"]:
        assert (out / f).exists(), f


@pytest.mark.slow
def test_two_strain_recovery_split_contigs(tmp_path):
    """Per-bubble contig fragments force disentanglement + extension to do
    the real work."""
    ds, out = _run(tmp_path, num_strains=2, num_bubbles=3,
                   pairs_per_strain=400, seed=5, contig_mode="split")
    seqs = _read_fasta(out / "strain.fasta")
    recovered = set(seqs.values())
    hits = sum(1 for hap in ds.true_haplotypes if hap in recovered)
    assert hits == 2, f"only {hits}/2 haplotypes reconstructed"


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["full", "split"])
def test_five_strain_recovery(tmp_path, mode):
    """The 5-strain HIV-benchmark analogue (BASELINE config 1): five
    haplotypes at staggered abundances."""
    ds, out = _run(tmp_path, num_strains=5, num_bubbles=4,
                   pairs_per_strain=500,
                   abundances=(20.0, 40.0, 60.0, 80.0, 100.0),
                   contig_mode=mode, seed=42)
    seqs = _read_fasta(out / "strain.fasta")
    recovered = set(seqs.values())
    hits = sum(1 for hap in ds.true_haplotypes if hap in recovered)
    assert hits == 5, f"only {hits}/5 haplotypes reconstructed"


@pytest.mark.slow
def test_ten_strain_recovery(tmp_path):
    """The 10-strain HCV analogue (BASELINE config 2): denser graph
    exercising disentanglement depth."""
    ds, out = _run(tmp_path, num_strains=10, num_bubbles=5,
                   pairs_per_strain=400,
                   abundances=tuple(20.0 + 15 * i for i in range(10)),
                   contig_mode="split", seed=7)
    seqs = _read_fasta(out / "strain.fasta")
    recovered = set(seqs.values())
    hits = sum(1 for hap in ds.true_haplotypes if hap in recovered)
    assert hits == 10, f"only {hits}/10 haplotypes reconstructed"


@pytest.mark.slow
def test_recovery_with_sequencing_errors(tmp_path):
    """0.5% substitution errors in reads: the saturation heuristic still
    yields exact haplotype recovery."""
    ds, out = _run(tmp_path, num_strains=3, num_bubbles=3,
                   pairs_per_strain=800,
                   abundances=(40.0, 70.0, 100.0),
                   contig_mode="split", error_rate=0.005, seed=23)
    seqs = _read_fasta(out / "strain.fasta")
    recovered = set(seqs.values())
    hits = sum(1 for hap in ds.true_haplotypes if hap in recovered)
    assert hits == 3, f"only {hits}/3 haplotypes reconstructed"


@pytest.mark.slow
def test_dev_mode_with_reference_eval(tmp_path, caplog):
    """-r REF.fasta turns on reference-guided evaluation at every stage
    (the reference's dev-mode integration-test role, SURVEY section 4)."""
    data_dir = tmp_path / "data"
    out = tmp_path / "out"
    ds = make_dataset(str(data_dir), num_strains=2, num_bubbles=2,
                      pairs_per_strain=300, seed=33)
    ref_fa = tmp_path / "refs.fasta"
    with open(ref_fa, "w") as f:
        for i, hap in enumerate(ds.true_haplotypes):
            f.write(f">strain{i}\n{hap}\n")
    for sub in ["gfa", "tmp", "paf", "aln"]:
        os.makedirs(out / sub)
    args = SimpleNamespace(
        gfa_file=ds.gfa_path, path_file=ds.paths_path,
        fwd=ds.fwd_path, rve=ds.rve_path, output_dir=str(out),
        min_cov=None, min_len=250, dev=True, pe_batch_size=256,
        resume=False, ref_file=str(ref_fa))
    import logging as _logging
    with caplog.at_level(_logging.INFO, logger="e2e"):
        pipeline.run(args, _LOG)
    # the final strain-accuracy report scored both strains as exact
    acc_lines = [r.message for r in caplog.records
                 if "containment" in r.message]
    assert len(acc_lines) >= 2
    assert all("1.0000" in line for line in acc_lines)
