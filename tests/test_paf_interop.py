"""PAF-interop path vs the device hash engine: identical matrices when fed
equivalent perfect-match alignments."""

import os

import numpy as np
import pytest

from tests.oracle_pe import _revcomp, build_table
from tests.test_pe_infer import (_make_batch, _random_refs, _sample_reads)
from vstrains_tpu.evals.paf_interop import (export_subread_fastq,
                                            pe_matrices_from_paf)
from vstrains_tpu.ops.pe_infer import infer_pe_links


def _write_synthetic_paf(path, reads, table, ids, split_len):
    """Emit the PAF a perfect exact aligner would produce for every
    sub-read window (both strands via the two-strand table)."""
    with open(path, "w") as fh:
        for j, seq in enumerate(reads):
            for sub_i in range(len(seq) - split_len + 1):
                kmer = seq[sub_i: sub_i + split_len]
                for (node, off) in table.get(kmer, []):
                    # qname qlen qs qe strand tname tlen ts te nmatch
                    # nblock mapq
                    fh.write(f"{j}_{sub_i}\t{split_len}\t0\t{split_len}"
                             f"\t+\t{ids[node]}\t0\t{off}"
                             f"\t{off + split_len}\t{split_len}"
                             f"\t{split_len}\t60\n")


def test_paf_matrices_match_engine(tmp_path):
    rng = np.random.RandomState(11)
    k = 11
    split_len = k + 1
    refs = _random_refs(rng, 5, [60, 80, 100, 120, 140])
    fwd, rve = _sample_reads(rng, refs, 50, 30, k)
    # drop N-containing reads (aligner path assumes pre-filtered pairs)
    pairs = [(f, r) for f, r in zip(fwd, rve)
             if "N" not in f and "N" not in r
             and len(f) >= split_len and len(r) >= split_len]
    ids = [str(i) for i in range(5)]

    read_ids = export_subread_fastq(pairs, str(tmp_path / "f.fq"),
                                    str(tmp_path / "r.fq"), split_len)
    table = build_table(refs, split_len)
    _write_synthetic_paf(tmp_path / "f.paf", [p[0] for p in pairs], table,
                         ids, split_len)
    _write_synthetic_paf(tmp_path / "r.paf", [p[1] for p in pairs], table,
                         ids, split_len)
    nm_paf, sm_paf = pe_matrices_from_paf(
        ids, [len(s) for s in refs], read_ids,
        str(tmp_path / "f.paf"), str(tmp_path / "r.paf"), split_len)

    batch = _make_batch([p[0] for p in pairs], [p[1] for p in pairs],
                        split_len)
    res = infer_pe_links(ids, refs, batch, k, batch_size=32)
    np.testing.assert_array_equal(nm_paf, res.node_mat)
    np.testing.assert_array_equal(sm_paf, res.short_mat)


def _aligner_path(tmp_path):
    """Prefer a real minimap2; otherwise stage tools/fake_minimap2 (an
    exact-match PAF emitter — semantically complete for the legacy
    path's perfect-match filter, see its docstring) as `minimap2` on a
    private PATH entry."""
    import shutil
    if shutil.which("minimap2"):
        return os.environ["PATH"]
    bindir = tmp_path / "bin"
    os.makedirs(bindir, exist_ok=True)
    fake = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools", "fake_minimap2")
    dst = bindir / "minimap2"
    shutil.copy(fake, dst)
    os.chmod(dst, 0o755)
    return f"{bindir}:{os.environ['PATH']}"


def test_legacy_alignment_matches_hash_engine(tmp_path, monkeypatch):
    """The legacy aligner path end-to-end must agree with the hash
    engine (C12 full parity). Runs against a real minimap2 when one is
    on PATH; otherwise against the exact-match PAF emitter, which the
    legacy path's nm==0 full-length filter makes equivalent."""
    monkeypatch.setenv("PATH", _aligner_path(tmp_path))
    from vstrains_tpu.evals.paf_interop import run_legacy_alignment
    from tests.test_pe_infer import (_make_batch, _random_refs,
                                     _sample_reads)
    from vstrains_tpu.ops.pe_infer import infer_pe_links

    rng = np.random.RandomState(3)
    k = 27  # minimap2 min seed window constraints favor larger k
    refs = _random_refs(rng, 4, [400, 500, 600, 700])
    fwd, rve = _sample_reads(rng, refs, 50, 80, k)
    # the aligner path assumes pre-filtered pairs (the reference filters
    # N/short reads before batching, VStrains_Alignment.py:255-270)
    pairs = [(f, r) for f, r in zip(fwd, rve)
             if "N" not in f and "N" not in r
             and len(f) >= k + 1 and len(r) >= k + 1]
    ids = [str(i) for i in range(4)]
    node_mat, short_mat = run_legacy_alignment(
        ids, refs, pairs, k, str(tmp_path))
    res = infer_pe_links(ids, refs,
                         _make_batch([p[0] for p in pairs],
                                     [p[1] for p in pairs], k + 1),
                         k, batch_size=32)
    np.testing.assert_array_equal(node_mat, res.node_mat)
    np.testing.assert_array_equal(short_mat, res.short_mat)
