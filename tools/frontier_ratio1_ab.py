#!/usr/bin/env python3
"""Equal-abundance frontier A/B vs the ACTUAL reference (VERDICT r3 #8).

frontier_r3.json showed exact recovery breaking only at abundance
ratio exactly 1.0 — suspected inherent to coverage-evidence
disentanglement (VStrains_Decomposition.py:31-88 resolves secondary
links by mutual-best coverage matching, which has no signal when the
strains' coverages are equal). This tool turns that suspicion into a
measurement: both pipelines (ours, and the real reference via shims/)
run the identical 2-strain datasets at ratios 1.0 / 1.02 / 1.05, and
per-seed exact-haplotype recovery is recorded side by side.

    JAX_PLATFORMS=cpu python tools/frontier_ratio1_ab.py \
        --out frontier_r4.json
"""

import argparse
import json
import logging
import os
import shutil
import subprocess
import sys
import tempfile
from types import SimpleNamespace

os.environ.setdefault("JAX_PLATFORMS", "cpu")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REFERENCE = "/root/reference"


def _recovered(strain_fasta, truths):
    if not os.path.exists(strain_fasta):
        return 0, 0
    recs = open(strain_fasta).read().split(">")[1:]
    got = {"".join(r.splitlines()[1:]) for r in recs}
    return sum(1 for h in truths if h in got), len(got)


def run_ours(ds, out):
    from vstrains_tpu import pipeline
    for sub in ("gfa", "tmp", "paf", "aln"):
        os.makedirs(os.path.join(out, sub))
    args = SimpleNamespace(
        gfa_file=ds.gfa_path, path_file=ds.paths_path,
        fwd=ds.fwd_path, rve=ds.rve_path, output_dir=out,
        min_cov=None, min_len=250, dev=False, pe_batch_size=1024,
        resume=False)
    try:
        pipeline.run(args, logging.getLogger("ab"))
        return None
    except Exception as exc:  # noqa: BLE001 — a crash IS a result
        return f"{type(exc).__name__}: {exc}"


def run_reference(ds, out):
    env = dict(os.environ)
    env["PYTHONHASHSEED"] = "0"
    env["PYTHONPATH"] = f"{REPO}/shims:{REFERENCE}"
    os.makedirs(out, exist_ok=True)
    r = subprocess.run(
        [sys.executable, os.path.join(REFERENCE, "vstrains"),
         "-a", "spades", "-g", ds.gfa_path, "-p", ds.paths_path,
         "-fwd", ds.fwd_path, "-rve", ds.rve_path, "-o", out],
        cwd=REFERENCE, env=env, capture_output=True, text=True,
        timeout=1800)
    if r.returncode != 0:
        return f"exit {r.returncode}: {r.stderr[-300:]}"
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "frontier_r4.json"))
    ap.add_argument("--pairs", type=int, default=800)
    ap.add_argument("--seeds", default="0,1,2")
    args = ap.parse_args()
    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from vstrains_tpu.evals.synth import make_dataset

    results = {"workload": "2 strains x 3 bubbles, split contigs, "
                           f"{args.pairs} pairs/strain",
               "ratios": []}
    for ratio in (1.0, 1.02, 1.05):
        row = {"ratio": ratio, "ours": [], "reference": []}
        for seed in [int(s) for s in args.seeds.split(",")]:
            base = tempfile.mkdtemp(prefix="r1ab_")
            try:
                ds = make_dataset(
                    os.path.join(base, "data"), num_strains=2,
                    num_bubbles=3, contig_mode="split",
                    pairs_per_strain=args.pairs,
                    abundances=(100.0, 100.0 * ratio), seed=seed)
                truths = ds.true_haplotypes
                err_o = run_ours(ds, os.path.join(base, "ours"))
                hits_o, n_o = _recovered(
                    os.path.join(base, "ours", "strain.fasta"), truths)
                err_r = run_reference(ds, os.path.join(base, "ref"))
                hits_r, n_r = _recovered(
                    os.path.join(base, "ref", "strain.fasta"), truths)
                row["ours"].append(
                    {"seed": seed, "recovered": hits_o, "total": 2,
                     "emitted": n_o, **({"error": err_o} if err_o
                                        else {})})
                row["reference"].append(
                    {"seed": seed, "recovered": hits_r, "total": 2,
                     "emitted": n_r, **({"error": err_r} if err_r
                                        else {})})
                print(f"# ratio={ratio} seed={seed}: ours {hits_o}/2 "
                      f"ref {hits_r}/2", file=sys.stderr)
            finally:
                shutil.rmtree(base, ignore_errors=True)
        row["ours_total"] = sum(r["recovered"] for r in row["ours"])
        row["reference_total"] = sum(r["recovered"]
                                     for r in row["reference"])
        results["ratios"].append(row)

    eq = results["ratios"][0]
    results["shared_limit"] = (eq["ours_total"] == 0
                               and eq["reference_total"] == 0)
    results["conclusion"] = (
        "ratio=1.0 failure is a SHARED limit of coverage-evidence "
        "disentanglement (both pipelines fail identically)"
        if results["shared_limit"] else
        "pipelines behave differently at ratio=1.0 - see per-seed rows")
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))
    print(f"# wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    sys.exit(main())
