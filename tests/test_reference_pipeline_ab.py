"""FULL-PIPELINE A/B against the ACTUAL reference implementation.

The reference (/root/reference) needs graph-tool and gfapy — unavailable
as wheels here — so `shims/` provides a pure-Python stand-in for the
exact API surface it uses (see shims/graph_tool/__init__.py). With it,
the real reference pipeline runs end-to-end in a subprocess and every
shared artifact is compared:

  * strain.fasta           — identical strain-sequence SETS (the
    reference's record order depends on dict-insertion history at
    equal-length ties and PYTHONHASHSEED; see docs/DIVERGENCES.md)
  * split_graph_final.gfa  — byte-identical (the disentanglement
    north-star artifact)
  * aln/pe_info, aln/st_info — byte-identical
  * stage breadcrumb GFAs  — byte-identical except extraction-order-
    dependent graph_S{i}/S{i}post snapshots
"""

import os
import subprocess
import sys
from types import SimpleNamespace

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"


def _have_reference():
    return os.path.exists(os.path.join(REFERENCE, "vstrains"))


def _run_reference(data, outdir, extra_env=None, timeout=900,
                   files=None):
    env = dict(os.environ)
    env["PYTHONHASHSEED"] = "0"
    env["PYTHONPATH"] = f"{REPO}/shims:{REFERENCE}"
    if extra_env:
        env.update(extra_env)
    files = files or {
        "gfa": f"{data}/assembly_graph_after_simplification.gfa",
        "paths": f"{data}/contigs.paths",
        "fwd": f"{data}/reads_1.fastq",
        "rve": f"{data}/reads_2.fastq"}
    r = subprocess.run(
        [sys.executable, os.path.join(REFERENCE, "vstrains"),
         "-a", "spades",
         "-g", files["gfa"], "-p", files["paths"],
         "-fwd", files["fwd"], "-rve", files["rve"],
         "-o", outdir],
        cwd=REFERENCE, env=env, capture_output=True, text=True,
        timeout=timeout)
    assert r.returncode == 0, f"reference failed:\n{r.stdout[-2000:]}" \
                              f"\n{r.stderr[-2000:]}"


def _run_ours(data, outdir):
    from vstrains_tpu import pipeline
    import logging
    args = SimpleNamespace(
        gfa_file=f"{data}/assembly_graph_after_simplification.gfa",
        path_file=f"{data}/contigs.paths",
        fwd=f"{data}/reads_1.fastq", rve=f"{data}/reads_2.fastq",
        output_dir=outdir, min_cov=None, min_len=250, dev=False,
        pe_batch_size=1024, resume=False)
    for sub in ["gfa", "tmp", "paf", "aln"]:
        os.makedirs(os.path.join(outdir, sub), exist_ok=True)
    pipeline.run(args, logging.getLogger("ab"))


def _fasta_seqs(path):
    recs = open(path).read().split(">")[1:]
    return sorted("".join(r.splitlines()[1:]) for r in recs)


@pytest.mark.slow
@pytest.mark.skipif(not _have_reference(), reason="reference not mounted")
@pytest.mark.parametrize("cfg", [
    dict(num_strains=3, num_bubbles=3, pairs_per_strain=400,
         abundances=(40.0, 70.0, 100.0), contig_mode="split",
         error_rate=0.0, seed=77),
    dict(num_strains=5, num_bubbles=4, pairs_per_strain=400,
         abundances=(20.0, 45.0, 70.0, 95.0, 120.0),
         contig_mode="split", error_rate=0.0, seed=3),
    dict(num_strains=2, num_bubbles=2, pairs_per_strain=300,
         abundances=(50.0, 90.0), contig_mode="full",
         error_rate=0.0, seed=11),
    # the reference's own hardest benchmark scale (15-strain ZIKV)
    dict(num_strains=15, num_bubbles=6, pairs_per_strain=300,
         abundances=tuple(20.0 + 13.0 * i for i in range(15)),
         contig_mode="split", error_rate=0.0, seed=5),
])
def test_full_pipeline_matches_reference(tmp_path, cfg):
    from vstrains_tpu.evals.synth import make_dataset

    data = tmp_path / "data"
    ds = make_dataset(str(data), **cfg)
    ref_out = str(tmp_path / "ref")
    our_out = str(tmp_path / "ours")
    _run_reference(str(data), ref_out)
    _run_ours(str(data), our_out)

    ref_seqs = _fasta_seqs(f"{ref_out}/strain.fasta")
    our_seqs = _fasta_seqs(f"{our_out}/strain.fasta")
    assert ref_seqs == our_seqs, "strain sequence sets differ"
    # both recover the planted haplotypes exactly on clean signals
    assert ref_seqs == sorted(ds.true_haplotypes)

    for name in ("aln/pe_info", "aln/st_info",
                 "gfa/split_graph_final.gfa", "gfa/graph_L0.gfa",
                 "gfa/s_graph_L1.gfa"):
        a = open(f"{ref_out}/{name}", "rb").read()
        b = open(f"{our_out}/{name}", "rb").read()
        assert a == b, f"{name} differs from the reference's bytes"

    # strain.paths: same {(length_cov, node path)} multiset; the A<k>
    # strain numbers follow extraction order, which is the reference's
    # hash-history tie (docs/DIVERGENCES.md #1), so strip them
    def paths_records(p):
        lines = open(p).read().splitlines()
        recs = []
        for i in range(0, len(lines), 2):
            name = lines[i].split("_", 2)[-1]  # drop NODE_A<k>_
            recs.append((name, lines[i + 1]))
        return sorted(recs)

    assert (paths_records(f"{ref_out}/strain.paths")
            == paths_records(f"{our_out}/strain.paths"))


@pytest.mark.slow
@pytest.mark.skipif(not _have_reference(), reason="reference not mounted")
@pytest.mark.parametrize("n_components,sub_pairs,ref_timeout", [
    pytest.param(65, 60_000, 3600, id="2k_nodes"),
    # The reference CANNOT reach 5k nodes: its pe_info is a dense
    # N^2/2-key Python dict and simp_path_compactification rescans ALL
    # of it per contracted path with O(|contig|) membership tests
    # (/root/reference/utils/VStrains_Utilities.py:489-499) — ~4e9
    # dict iterations at N=5115. Measured: 60-min wall timeout with the
    # log stalled at 'non-branching path contraction..' (45+ CPU-min in
    # that one pass). Our engine's sparse PE store makes the same pass
    # O(nonzero). Run explicitly with -m '' --runxfail to reproduce.
    pytest.param(165, 100_000, 14400, id="5k_nodes",
                 marks=pytest.mark.skip(
                     reason="reference architecturally cannot finish "
                     "5k nodes (quadratic pe_info rescan per contracted"
                     " path, Utilities.py:489-499; measured 60-min "
                     "timeout stuck in compactification)")),
])
def test_reference_ab_at_scale(tmp_path, n_components, sub_pairs,
                               ref_timeout):
    """Full-pipeline A/B at multi-thousand-node scale (VERDICT r2 item
    4): the round-2 lattice topped out at 992 nodes, leaving the
    disentanglement/extension stack undiffed where tie-break density is
    highest. Components are 31 nodes each (5 strains x 5 bubbles)."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from tools.realistic_e2e import merge_with_paths

    base = str(tmp_path / "data")
    os.makedirs(base, exist_ok=True)
    gfa, paths, fwd, rve, n_nodes, haps = merge_with_paths(
        base, n_components, sub_pairs)
    assert n_nodes == 31 * n_components

    ref_out = str(tmp_path / "ref")
    our_out = str(tmp_path / "ours")
    _run_reference(base, ref_out, timeout=ref_timeout,
                   files=dict(gfa=gfa, paths=paths, fwd=fwd, rve=rve))

    from types import SimpleNamespace
    import logging
    from vstrains_tpu import pipeline
    for sub in ("gfa", "tmp", "paf", "aln"):
        os.makedirs(os.path.join(our_out, sub), exist_ok=True)
    args = SimpleNamespace(
        gfa_file=gfa, path_file=paths, fwd=fwd, rve=rve,
        output_dir=our_out, min_cov=None, min_len=250, dev=False,
        pe_batch_size=16384, resume=False)
    pipeline.run(args, logging.getLogger("ab_scale"))

    ref_seqs = _fasta_seqs(f"{ref_out}/strain.fasta")
    our_seqs = _fasta_seqs(f"{our_out}/strain.fasta")
    assert ref_seqs == our_seqs, f"strain sets differ at {n_nodes} nodes"
    for name in ("aln/pe_info", "aln/st_info",
                 "gfa/split_graph_final.gfa"):
        a = open(f"{ref_out}/{name}", "rb").read()
        b = open(f"{our_out}/{name}", "rb").read()
        assert a == b, f"{name} differs from the reference's bytes"


@pytest.mark.slow
@pytest.mark.skipif(not _have_reference(), reason="reference not mounted")
def test_reference_ab_under_full_error_model(tmp_path):
    """Indels + N-runs + degrading quality, quality-trimmed, fed to BOTH
    engines: strain sets equal (and equal to truth), pe_info/st_info and
    split_graph_final.gfa byte-identical — the A/B lattice extended to
    realistic read pathology (VERDICT r2 item 6)."""
    from vstrains_tpu.evals.sampling import quality_trim
    from vstrains_tpu.evals.synth import make_dataset

    data = tmp_path / "data"
    ds = make_dataset(str(data), num_strains=3, num_bubbles=3,
                      pairs_per_strain=700,
                      abundances=(40.0, 70.0, 100.0),
                      contig_mode="split", read_len=80,
                      error_rate=0.004, indel_rate=0.001, n_rate=0.002,
                      quality_model="degrading", seed=21)
    # in-place is safe: quality_trim reads both inputs fully before
    # opening its outputs
    quality_trim(ds.fwd_path, ds.rve_path,
                 f"{data}/reads_1.fastq", f"{data}/reads_2.fastq")
    ref_out = str(tmp_path / "ref")
    our_out = str(tmp_path / "ours")
    _run_reference(str(data), ref_out)
    _run_ours(str(data), our_out)
    ref_seqs = _fasta_seqs(f"{ref_out}/strain.fasta")
    our_seqs = _fasta_seqs(f"{our_out}/strain.fasta")
    assert ref_seqs == our_seqs
    assert ref_seqs == sorted(ds.true_haplotypes)
    for name in ("aln/pe_info", "aln/st_info",
                 "gfa/split_graph_final.gfa"):
        a = open(f"{ref_out}/{name}", "rb").read()
        b = open(f"{our_out}/{name}", "rb").read()
        assert a == b, f"{name} differs from the reference's bytes"


@pytest.mark.slow
@pytest.mark.skipif(not _have_reference(), reason="reference not mounted")
def test_reference_ab_robust_to_shim_order_perturbation(tmp_path):
    """Run the reference twice — once on the faithful shim, once with
    every adjacency iteration order REVERSED (VSTRAINS_SHIM_PERTURB) —
    and require the recovered strain SETS to be identical to each other
    and to ours. Together with the property tests this demonstrates the
    A/B lattice's conclusions do not hinge on one incidental shim
    ordering: the orders shift the reference's internal tie-breaks, not
    its answers, on these configs."""
    from vstrains_tpu.evals.synth import make_dataset

    cfg = dict(num_strains=5, num_bubbles=4, pairs_per_strain=400,
               abundances=(20.0, 45.0, 70.0, 95.0, 120.0),
               contig_mode="split", error_rate=0.0, seed=3)
    data = tmp_path / "data"
    ds = make_dataset(str(data), **cfg)
    ref_out = str(tmp_path / "ref")
    pert_out = str(tmp_path / "ref_perturbed")
    our_out = str(tmp_path / "ours")
    _run_reference(str(data), ref_out)
    _run_reference(str(data), pert_out,
                   extra_env={"VSTRAINS_SHIM_PERTURB":
                              "reverse_adjacency"})
    _run_ours(str(data), our_out)

    ref_seqs = _fasta_seqs(f"{ref_out}/strain.fasta")
    pert_seqs = _fasta_seqs(f"{pert_out}/strain.fasta")
    our_seqs = _fasta_seqs(f"{our_out}/strain.fasta")
    assert pert_seqs == ref_seqs, \
        "reference strains changed under adjacency-order perturbation"
    assert our_seqs == ref_seqs
    assert ref_seqs == sorted(ds.true_haplotypes)
