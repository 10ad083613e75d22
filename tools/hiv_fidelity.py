#!/usr/bin/env python3
"""HIV-labmix-fidelity benchmark: both pipelines, NGA50 side by side.

Simulates the reference's flagship dataset shape (5-strain HIV-1 labmix:
~9.7kb full genomes evolved down a phylogeny — nested variation, >=95%
backbone identity — 20,000x total coverage, 2x250bp reads with an
Illumina-shaped error profile; /root/reference/README.md:209-211), runs
BOTH pipelines on the identical inputs, and scores each output
strain.fasta against the true genomes with the in-repo QUAST-style
NGA50 (evals/nga50.py, mirroring evals/quast_evaluation.py:38-60).

The reference runs via shims/ exactly as in
tests/test_reference_pipeline_ab.py. Its PE inference is a pure-Python
per-read loop (~220 reads/s), so the reference leg takes ~30-40 min at
389k pairs; HIV_SKIP_REF=1 skips it.

Env: HIV_COVERAGE (20000), HIV_SEED (0), HIV_WORKDIR (tmp),
HIV_OUT (hiv_fidelity_r4.json), HIV_SKIP_REF, HIV_REF_TIMEOUT (14400).
"""

import json
import logging
import os
import shutil
import subprocess
import sys
import tempfile
import time
from types import SimpleNamespace

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/vstrains_tpu_jax"))
os.environ.setdefault("VSTRAINS_FORCE_BACKEND", "bench")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REFERENCE = "/root/reference"


def run_ours(data, outdir):
    from vstrains_tpu import pipeline
    args = SimpleNamespace(
        gfa_file=data.gfa_path, path_file=data.paths_path,
        fwd=data.fwd_path, rve=data.rve_path,
        output_dir=outdir, min_cov=None, min_len=250, dev=False,
        pe_batch_size=16384, resume=False)
    for sub in ["gfa", "tmp", "paf", "aln"]:
        os.makedirs(os.path.join(outdir, sub), exist_ok=True)
    logger = logging.getLogger("hiv_fidelity")
    logger.setLevel(logging.INFO)
    pipeline.run(args, logger)


def run_reference(data, outdir, timeout):
    env = dict(os.environ)
    env["PYTHONHASHSEED"] = "0"
    env["PYTHONPATH"] = f"{REPO}/shims:{REFERENCE}"
    os.makedirs(outdir, exist_ok=True)
    r = subprocess.run(
        [sys.executable, os.path.join(REFERENCE, "vstrains"),
         "-a", "spades", "-g", data.gfa_path, "-p", data.paths_path,
         "-fwd", data.fwd_path, "-rve", data.rve_path, "-o", outdir],
        cwd=REFERENCE, env=env, capture_output=True, text=True,
        timeout=timeout)
    if r.returncode != 0:
        raise RuntimeError(f"reference failed:\n{r.stdout[-3000:]}\n"
                           f"{r.stderr[-3000:]}")


def score(strain_fasta, truth_fasta):
    from vstrains_tpu.evals.nga50 import load_fasta, nga50_report
    contigs = load_fasta(strain_fasta)
    refs = load_fasta(truth_fasta)
    rep = nga50_report(contigs, refs, k=31, min_block=500)
    agg = rep.pop("_aggregate")
    return {
        "num_output_strains": len(contigs),
        "mean_nga50": round(agg["mean_nga50"], 1),
        "min_nga50": agg["min_nga50"],
        "strains_recovered": f"{agg['refs_with_nga50']}/{agg['num_refs']}",
        "per_strain": {r: {"nga50": v["nga50"],
                           "genome_fraction": v["genome_fraction"]}
                       for r, v in sorted(rep.items())},
    }


def main():
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(message)s",
                        stream=sys.stderr)
    coverage = float(os.environ.get("HIV_COVERAGE", 20000))
    seed = int(os.environ.get("HIV_SEED", 0))
    out_json = os.environ.get("HIV_OUT",
                              os.path.join(REPO, "hiv_fidelity_r4.json"))
    skip_ref = os.environ.get("HIV_SKIP_REF", "") not in ("", "0")
    ref_timeout = float(os.environ.get("HIV_REF_TIMEOUT", 14400))
    workdir = os.environ.get("HIV_WORKDIR") or tempfile.mkdtemp(
        prefix="hiv_fidelity_")
    os.makedirs(workdir, exist_ok=True)

    from vstrains_tpu.evals.hivsim import make_hiv_dataset
    t0 = time.time()
    data = make_hiv_dataset(os.path.join(workdir, "data"),
                            coverage=coverage, seed=seed)
    gen_s = time.time() - t0
    print(f"# dataset: {data.stats} pairs={data.n_pairs} "
          f"identity={data.identity} gen={gen_s:.0f}s", file=sys.stderr)

    rec = {
        "dataset": "simulated 5-strain HIV labmix shape "
                   "(evals/hivsim.py)",
        "genomes": {n: len(s) for n, s in data.true_haplotypes.items()},
        "identity": data.identity,
        "coverage": coverage,
        "read_pairs": data.n_pairs,
        "graph": data.stats,
    }

    import jax
    rec["backend"] = jax.default_backend()

    ours_dir = os.path.join(workdir, "ours")
    t0 = time.time()
    run_ours(data, ours_dir)
    rec["ours_wall_seconds"] = round(time.time() - t0, 1)
    rec["ours"] = score(os.path.join(ours_dir, "strain.fasta"),
                        data.truth_path)
    print(f"# ours: {rec['ours_wall_seconds']}s {rec['ours']}",
          file=sys.stderr)

    if skip_ref:
        rec["reference"] = "skipped (HIV_SKIP_REF)"
    else:
        ref_dir = os.path.join(workdir, "ref")
        t0 = time.time()
        run_reference(data, ref_dir, ref_timeout)
        rec["reference_wall_seconds"] = round(time.time() - t0, 1)
        rec["reference"] = score(os.path.join(ref_dir, "strain.fasta"),
                                 data.truth_path)
        print(f"# reference: {rec['reference_wall_seconds']}s "
              f"{rec['reference']}", file=sys.stderr)
        if rec.get("ours_wall_seconds"):
            rec["speedup"] = round(rec["reference_wall_seconds"]
                                   / rec["ours_wall_seconds"], 1)

    with open(out_json, "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec))
    print(f"# wrote {out_json}", file=sys.stderr)
    if os.environ.get("HIV_KEEP_WORKDIR", "") in ("", "0") \
            and workdir.startswith(tempfile.gettempdir()):
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
