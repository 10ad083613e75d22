#!/usr/bin/env python3
"""Full benchmark matrix over the BASELINE.json config analogues.

Synthesizes each config locally (the reference's real datasets are not
redistributable; generator in evals/synth.py), runs the end-to-end
pipeline, and reports recovery + stage timings. Run on TPU (default env)
or CPU (JAX_PLATFORMS=cpu).

    python tools/benchmark_suite.py [--out results.json]
"""

import argparse
import json
import logging
import os
import shutil
import sys
import tempfile
import time
from types import SimpleNamespace

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

CONFIGS = {
    # BASELINE.json configs[0]: tiny 2-strain mix, CPU-runnable E2E
    "2strain_polio": dict(num_strains=2, num_bubbles=3,
                          pairs_per_strain=500, contig_mode="full",
                          seed=11),
    # configs[1]: 5-strain HIV-like lab mix, staggered abundances
    "5strain_hiv": dict(num_strains=5, num_bubbles=4,
                        pairs_per_strain=500,
                        abundances=(20.0, 40.0, 60.0, 80.0, 100.0),
                        contig_mode="split", seed=42),
    # configs[2]: 10-strain HCV-like quasispecies, deeper disentanglement
    "10strain_hcv": dict(num_strains=10, num_bubbles=5,
                         pairs_per_strain=400,
                         abundances=tuple(20.0 + 15 * i
                                          for i in range(10)),
                         contig_mode="split", seed=7),
    # configs[3]: high-coverage single sample (PE-inference stress)
    "sarscov2_deep": dict(num_strains=2, num_bubbles=4, anchor_len=2000,
                          variant_len=300, k=55, read_len=150,
                          insert_len=400, pairs_per_strain=20000,
                          contig_mode="split", error_rate=0.003, seed=3),
}
MULTI = {
    # configs[4]: 15-strain metaviral, multi-component (metaSPAdes-style)
    "15strain_metaviral": dict(n_components=3, num_strains=5,
                               num_bubbles=3, pairs_per_strain=300,
                               abundances=(20.0, 40.0, 60.0, 80.0, 100.0),
                               seed=3),
}


def run_config(name, kwargs, multi=False):
    from vstrains_tpu import pipeline
    from vstrains_tpu.evals.synth import (make_dataset,
                                          make_multi_component_dataset)
    base = tempfile.mkdtemp(prefix=f"bench_{name}_")
    try:
        gen = make_multi_component_dataset if multi else make_dataset
        ds = gen(os.path.join(base, "data"), **kwargs)
        out = os.path.join(base, "out")
        for sub in ["gfa", "tmp", "paf", "aln"]:
            os.makedirs(os.path.join(out, sub))
        args = SimpleNamespace(
            gfa_file=ds.gfa_path, path_file=ds.paths_path,
            fwd=ds.fwd_path, rve=ds.rve_path, output_dir=out,
            min_cov=None, min_len=250, dev=False, pe_batch_size=16384,
            resume=False, per_component=multi,
            component_workers=2 if multi else 1)
        t0 = time.time()
        pipeline.run(args, logging.getLogger(name))
        wall = time.time() - t0

        seqs, cur = {}, None
        with open(os.path.join(out, "strain.fasta")) as fh:
            for line in fh:
                line = line.strip()
                if line.startswith(">"):
                    cur = line
                    seqs[cur] = ""
                elif line:
                    seqs[cur] += line
        recovered = set(seqs.values())
        hits = sum(1 for h in ds.true_haplotypes if h in recovered)
        with open(os.path.join(out, "timings.json")) as fh:
            stages = json.load(fh)["stages"]
        n_pairs = sum(1 for _ in open(ds.fwd_path)) // 4
        return {
            "config": name,
            "nodes": len(ds.node_names),
            "read_pairs": n_pairs,
            "haplotypes": len(ds.true_haplotypes),
            "recovered_exact": hits,
            "wall_seconds": round(wall, 2),
            "stages": stages,
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default=None)
    parser.add_argument("--configs", nargs="*", default=None)
    parser.add_argument("--expect-backend", default=None,
                        help="refuse to run (and to write a mislabeled "
                             "results file) unless jax.default_backend() "
                             "matches")
    args = parser.parse_args()
    logging.basicConfig(level=logging.WARNING)

    # honor a CPU request even when jax was already imported by
    # sitecustomize (env var alone is too late then)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    backend = jax.default_backend()
    if args.expect_backend and backend != args.expect_backend:
        print(f"refusing to run: backend is {backend!r}, expected "
              f"{args.expect_backend!r}", file=sys.stderr)
        return 2
    results = {"backend": backend, "runs": []}
    for name, kwargs in CONFIGS.items():
        if args.configs and name not in args.configs:
            continue
        print(f"=== {name} ===", flush=True)
        res = run_config(name, kwargs)
        print(json.dumps({k: v for k, v in res.items() if k != "stages"}),
              flush=True)
        results["runs"].append(res)
    for name, kwargs in MULTI.items():
        if args.configs and name not in args.configs:
            continue
        print(f"=== {name} ===", flush=True)
        res = run_config(name, kwargs, multi=True)
        print(json.dumps({k: v for k, v in res.items() if k != "stages"}),
              flush=True)
        results["runs"].append(res)

    total_h = sum(r["haplotypes"] for r in results["runs"])
    total_r = sum(r["recovered_exact"] for r in results["runs"])
    print(f"TOTAL exact recovery: {total_r}/{total_h}")
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=2)
        print("written:", args.out)


if __name__ == "__main__":
    sys.exit(main())
