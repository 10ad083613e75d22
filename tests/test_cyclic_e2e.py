"""End-to-end pipeline on a CYCLIC assembly graph (circular viral
genome): the bubble's variant nodes wrap back to the shared anchor, so
the graph is not a DAG — exercising the cyclic gates (tip-removal
eligibility, cyclic-to-DAG handling in extension) that linear synthetic
datasets never reach."""

import logging
import os
from types import SimpleNamespace

import numpy as np
import pytest

from vstrains_tpu import pipeline

_LOG = logging.getLogger("cyclic")


def _mk_circular_dataset(base, k=21, read_len=60, pairs_per_strain=500):
    rng = np.random.RandomState(42)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)

    def rand(n):
        return bases[rng.randint(0, 4, n)].tobytes().decode()

    anchor = rand(150)
    cores = [rand(80), rand(80)]
    variants = [anchor[-k:] + c + anchor[:k] for c in cores]
    covs = [30.0, 50.0]

    gfa = os.path.join(base, "graph.gfa")
    with open(gfa, "w") as g:
        g.write(f"S\t1\t{anchor}\tDP:f:{sum(covs)}\n")
        for i, v in enumerate(variants):
            g.write(f"S\t{i + 2}\t{v}\tDP:f:{covs[i]}\n")
        for i in range(2):
            g.write(f"L\t1\t+\t{i + 2}\t+\t{k}M\n")
            g.write(f"L\t{i + 2}\t+\t1\t+\t{k}M\n")  # closes the circle

    paths = os.path.join(base, "contigs.paths")
    with open(paths, "w") as f:
        for i in range(2):
            ln = len(anchor) + len(variants[i]) - 2 * k
            f.write(f"NODE_{i + 1}_length_{ln}_cov_{covs[i]}\n")
            f.write(f"1+,{i + 2}+\n")
            f.write(f"NODE_{i + 1}_length_{ln}_cov_{covs[i]}'\n")
            f.write(f"{i + 2}-,1-\n")

    # circular haplotypes, reads sampled across the wrap point
    circs = [anchor + v[k:-k] for v in variants]
    fwd_p = os.path.join(base, "reads_1.fastq")
    rve_p = os.path.join(base, "reads_2.fastq")
    qual = "I" * read_len
    with open(fwd_p, "w") as f1, open(rve_p, "w") as f2:
        rid = 0
        for s, circ in enumerate(circs):
            wrap = circ + circ[:read_len]
            n = int(pairs_per_strain * covs[s] / covs[-1])
            for _ in range(n):
                p1 = rng.randint(0, len(circ))
                p2 = rng.randint(0, len(circ))
                f1.write(f"@r{rid}/1\n{wrap[p1:p1 + read_len]}\n+\n"
                         f"{qual}\n")
                f2.write(f"@r{rid}/2\n{wrap[p2:p2 + read_len]}\n+\n"
                         f"{qual}\n")
                rid += 1
    return gfa, paths, fwd_p, rve_p, cores


def test_cyclic_graph_pipeline_completes(tmp_path):
    gfa, paths, fwd, rve, cores = _mk_circular_dataset(str(tmp_path))
    out = tmp_path / "out"
    for sub in ["gfa", "tmp", "paf", "aln"]:
        os.makedirs(out / sub)
    args = SimpleNamespace(
        gfa_file=gfa, path_file=paths, fwd=fwd, rve=rve,
        output_dir=str(out), min_cov=None, min_len=50, dev=True,
        pe_batch_size=512, resume=False)
    rc = pipeline.run(args, _LOG)
    assert rc in (0, None)
    fa = (out / "strain.fasta").read_text()
    seqs = ["".join(r.splitlines()[1:]) for r in fa.split(">")[1:]]
    assert seqs, "no strains emitted from the cyclic graph"
    for s in seqs:
        assert set(s) <= set("ACGT")
    # both variant cores must survive into some strain
    joined = " ".join(seqs)
    for core in cores:
        assert core in joined, "a variant core was lost"
