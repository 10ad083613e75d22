"""Realistic read-error models (indels, N-runs, degrading quality +
trimming) and the in-repo NGA50 scorer (VERDICT r2 item 6)."""

import os

import numpy as np
import pytest

from vstrains_tpu.evals.nga50 import load_fasta, nga50_report
from vstrains_tpu.evals.sampling import quality_trim
from vstrains_tpu.evals.synth import make_dataset


def _reads(path):
    lines = open(path).read().splitlines()
    return lines[1::4], lines[3::4]


# ---------------------------------------------------------------------------
# error-model generator properties
# ---------------------------------------------------------------------------

def test_clean_model_unchanged_bytes(tmp_path):
    """error model off -> byte-identical datasets across the refactor
    (same rng stream as round 2's generator)."""
    a = make_dataset(str(tmp_path / "a"), num_strains=2, num_bubbles=2,
                     pairs_per_strain=50, seed=9)
    b = make_dataset(str(tmp_path / "b"), num_strains=2, num_bubbles=2,
                     pairs_per_strain=50, seed=9)
    for attr in ("gfa_path", "paths_path", "fwd_path", "rve_path"):
        assert open(getattr(a, attr), "rb").read() == \
            open(getattr(b, attr), "rb").read()
    seqs, quals = _reads(a.fwd_path)
    assert all(set(s) <= set("ACGT") for s in seqs)
    assert all(q == "I" * len(q) for q in quals)


def test_indel_model_emits_fixed_length_reads(tmp_path):
    ds = make_dataset(str(tmp_path / "d"), num_strains=2, num_bubbles=2,
                      pairs_per_strain=200, read_len=60,
                      error_rate=0.005, indel_rate=0.004, seed=4)
    for path in (ds.fwd_path, ds.rve_path):
        seqs, quals = _reads(path)
        assert seqs and all(len(s) == 60 for s in seqs)
        assert all(len(q) == len(s) for q, s in zip(quals, seqs))
    # indels shift suffixes: reads can no longer all be exact haplotype
    # substrings
    hap_blob = "|".join(ds.true_haplotypes)
    seqs, _ = _reads(ds.fwd_path)
    assert any(s not in hap_blob for s in seqs)


def test_n_runs_present_and_marked_low_quality(tmp_path):
    ds = make_dataset(str(tmp_path / "d"), num_strains=2, num_bubbles=2,
                      pairs_per_strain=300, read_len=60, n_rate=0.004,
                      quality_model="degrading", seed=5)
    seqs, quals = _reads(ds.fwd_path)
    n_reads = [(s, q) for s, q in zip(seqs, quals) if "N" in s]
    assert n_reads, "n_rate produced no N bases"
    for s, q in n_reads:
        for i, ch in enumerate(s):
            if ch == "N":
                assert ord(q[i]) - 33 <= 6, "N not marked low quality"
    # some runs of >= 2 Ns exist (dropout-style)
    assert any("NN" in s for s in seqs)


def test_degrading_quality_profile(tmp_path):
    ds = make_dataset(str(tmp_path / "d"), num_strains=2, num_bubbles=2,
                      pairs_per_strain=400, read_len=80,
                      error_rate=0.01, quality_model="degrading", seed=6)
    _, quals = _reads(ds.fwd_path)
    qm = np.array([[ord(c) - 33 for c in q] for q in quals
                   if len(q) == 80])
    head, tail = qm[:, :20].mean(), qm[:, -20:].mean()
    assert head > tail, "3' end should have lower quality"
    # and the error rate actually rises toward the 3' end
    haps = ds.true_haplotypes
    seqs, _ = _reads(ds.fwd_path)
    mism_head = mism_tail = tot = 0
    for s in seqs:
        best = min(haps, key=lambda h: _best_hamming(s, h))
        d_head, d_tail = _end_mismatches(s, best)
        if d_head is None:
            continue
        mism_head += d_head
        mism_tail += d_tail
        tot += 1
    assert tot > 100
    assert mism_tail > mism_head


def _best_hamming(read, hap):
    """Min mismatches of read against any same-length window of hap
    (anchored by the read's first 20bp for speed)."""
    seed = read[:20]
    pos = hap.find(seed)
    if pos < 0 or pos + len(read) > len(hap):
        return len(read)
    win = hap[pos: pos + len(read)]
    return sum(a != b for a, b in zip(read, win))


def _end_mismatches(read, hap):
    seed = read[:20]
    pos = hap.find(seed)
    if pos < 0 or pos + len(read) > len(hap):
        return None, None
    win = hap[pos: pos + len(read)]
    h = sum(a != b for a, b in zip(read[:30], win[:30]))
    t = sum(a != b for a, b in zip(read[-30:], win[-30:]))
    return h, t


def test_quality_trim_cuts_bad_tails_and_drops_short(tmp_path):
    ds = make_dataset(str(tmp_path / "d"), num_strains=2, num_bubbles=2,
                      pairs_per_strain=300, read_len=80,
                      error_rate=0.02, n_rate=0.003,
                      quality_model="degrading", seed=7)
    of = str(tmp_path / "t1.fq")
    orv = str(tmp_path / "t2.fq")
    kept = quality_trim(ds.fwd_path, ds.rve_path, of, orv,
                        min_q=20, window=5, min_len=30)
    assert 0 < kept
    in_seqs, _ = _reads(ds.fwd_path)
    out_seqs, out_quals = _reads(of)
    assert len(out_seqs) == kept <= len(in_seqs)
    assert all(30 <= len(s) <= 80 for s in out_seqs)
    assert any(len(s) < 80 for s in out_seqs), "nothing was trimmed"
    # trimming raises mean tail quality
    def tail_q(quals):
        return np.mean([ord(c) - 33 for q in quals for c in q[-5:]])
    _, in_quals = _reads(ds.fwd_path)
    assert tail_q(out_quals) > tail_q(in_quals)
    # pairing preserved
    r1, _ = _reads(of)
    r2, _ = _reads(orv)
    assert len(r1) == len(r2)


# ---------------------------------------------------------------------------
# NGA50 scorer
# ---------------------------------------------------------------------------

def _mk_refs(rng, n, ln):
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    return {f"ref{i}": bases[rng.randint(0, 4, ln)].tobytes().decode()
            for i in range(n)}


def test_nga50_perfect_assembly_equals_ref_len():
    rng = np.random.RandomState(0)
    refs = _mk_refs(rng, 3, 2000)
    contigs = {f"c{i}": seq for i, seq in enumerate(refs.values())}
    rep = nga50_report(contigs, refs)
    for rname, r in ((k, v) for k, v in rep.items() if k != "_aggregate"):
        assert r["nga50"] == 2000
        assert r["genome_fraction"] == 100.0
    assert rep["_aggregate"]["refs_with_nga50"] == 3


def test_nga50_fragmented_assembly():
    rng = np.random.RandomState(1)
    refs = _mk_refs(rng, 1, 3000)
    ref = refs["ref0"]
    # three fragments 1500/900/600 -> cumulative 1500 >= 1500 (50%)
    contigs = {"a": ref[:1500], "b": ref[1500:2400], "c": ref[2400:]}
    rep = nga50_report(contigs, refs)
    assert rep["ref0"]["nga50"] == 1500
    assert rep["ref0"]["genome_fraction"] == 100.0


def test_nga50_under_50pct_coverage_is_zero():
    rng = np.random.RandomState(2)
    refs = _mk_refs(rng, 1, 3000)
    contigs = {"a": refs["ref0"][:1200]}   # 40% only
    rep = nga50_report(contigs, refs)
    assert rep["ref0"]["nga50"] == 0
    assert 0 < rep["ref0"]["genome_fraction"] < 50


def test_nga50_misassembly_breaks_alignment():
    """A chimera of two distant ref regions must NOT count as one
    alignment: NGA50 reflects the broken pieces."""
    rng = np.random.RandomState(3)
    refs = _mk_refs(rng, 1, 4000)
    ref = refs["ref0"]
    chimera = ref[:1000] + ref[3000:4000]    # 2000bp contig, 2 pieces
    rep = nga50_report({"x": chimera, "y": ref[1000:2100]}, refs)
    # pieces: 1000, 1000, 1100 -> cumulative to 2000: 1100+1000 >= 2000
    assert rep["ref0"]["nga50"] == 1000
    assert rep["ref0"]["largest_alignment"] == 1100


def test_nga50_reverse_complement_and_snps():
    from vstrains_tpu.core.seq import revcomp_str
    rng = np.random.RandomState(4)
    refs = _mk_refs(rng, 1, 2500)
    ref = refs["ref0"]
    # rc contig with 3 scattered SNPs still one alignment (>=95% ident)
    arr = list(ref)
    for pos in (500, 1200, 1900):
        arr[pos] = "ACGT"[("ACGT".index(arr[pos]) + 1) % 4]
    rep = nga50_report({"c": revcomp_str("".join(arr))}, refs)
    assert rep["ref0"]["nga50"] >= 2400
    assert rep["ref0"]["genome_fraction"] > 95


def test_nga50_unique_mapping_assignment():
    """A contig matching two refs goes only to the better one."""
    rng = np.random.RandomState(5)
    refs = _mk_refs(rng, 2, 2000)
    shared = refs["ref0"][:800]
    refs["ref1"] = shared + refs["ref1"][800:]
    rep = nga50_report({"c": refs["ref0"]}, refs)
    assert rep["ref0"]["genome_fraction"] == 100.0
    assert rep["ref1"]["total_aligned"] == 0


# ---------------------------------------------------------------------------
# end-to-end: realistic error model -> pipeline -> NGA50
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_pipeline_under_full_error_model_with_trimming(tmp_path):
    """Indels + N-runs + degrading quality, quality-trimmed, through the
    full pipeline: all haplotypes recovered exactly and NGA50 equals the
    haplotype lengths (the component-level 'NGA50 parity' check)."""
    import logging
    from types import SimpleNamespace

    from vstrains_tpu import pipeline

    data = tmp_path / "data"
    ds = make_dataset(str(data), num_strains=3, num_bubbles=3,
                      pairs_per_strain=700,
                      abundances=(40.0, 70.0, 100.0),
                      contig_mode="split", read_len=80,
                      error_rate=0.004, indel_rate=0.001, n_rate=0.002,
                      quality_model="degrading", seed=21)
    t1 = str(tmp_path / "trim_1.fastq")
    t2 = str(tmp_path / "trim_2.fastq")
    kept = quality_trim(ds.fwd_path, ds.rve_path, t1, t2)
    assert kept > 1000
    out = str(tmp_path / "out")
    for sub in ("gfa", "tmp", "paf", "aln"):
        os.makedirs(os.path.join(out, sub), exist_ok=True)
    args = SimpleNamespace(
        gfa_file=ds.gfa_path, path_file=ds.paths_path, fwd=t1, rve=t2,
        output_dir=out, min_cov=None, min_len=250, dev=False,
        pe_batch_size=1024, resume=False)
    pipeline.run(args, logging.getLogger("err_e2e"))

    strains = load_fasta(os.path.join(out, "strain.fasta"))
    assert sorted(strains.values()) == sorted(ds.true_haplotypes)
    refs = {f"hap{i}": h for i, h in enumerate(ds.true_haplotypes)}
    rep = nga50_report(strains, refs)
    for name, r in ((k, v) for k, v in rep.items()
                    if k != "_aggregate"):
        assert r["nga50"] == r["ref_len"], f"{name}: {r}"
    assert rep["_aggregate"]["refs_with_nga50"] == 3
