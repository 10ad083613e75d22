#!/usr/bin/env python3
"""Extended randomized pipeline soak (beyond the CI fuzz): wider config
space — more strains, deeper bubbles, long anchors, higher error rates,
per-component mode — run to completion with dev-mode invariants on.
Reports every failure with its full config for reproduction.

    JAX_PLATFORMS=cpu python tools/fuzz_soak.py --seeds 120
"""

import argparse
import logging
import os
import sys
import tempfile
import traceback
from types import SimpleNamespace

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from vstrains_tpu import pipeline
from vstrains_tpu.evals.synth import make_dataset

_LOG = logging.getLogger("soak")


def run_one(seed: int) -> tuple:
    rng = np.random.RandomState(seed)
    n_strains = int(rng.randint(2, 9))
    kwargs = dict(
        num_strains=n_strains,
        num_bubbles=int(rng.randint(2, 13)),
        anchor_len=int(rng.choice([150, 300, 800, 2000])),
        variant_len=int(rng.randint(80, 300)),
        pairs_per_strain=int(rng.randint(150, 800)),
        abundances=tuple(sorted(rng.randint(15, 200, n_strains)
                                .astype(float))),
        contig_mode=["full", "split"][rng.randint(0, 2)],
        error_rate=float(rng.choice([0.0, 0.002, 0.005, 0.01])),
        seed=int(rng.randint(0, 100_000)))
    if len(set(kwargs["abundances"])) < n_strains:
        kwargs["abundances"] = tuple(
            20.0 + 17.0 * i for i in range(n_strains))
    base = tempfile.mkdtemp(prefix=f"soak{seed}_")
    try:
        ds = make_dataset(os.path.join(base, "data"), **kwargs)
        out = os.path.join(base, "out")
        for sub in ["gfa", "tmp", "paf", "aln"]:
            os.makedirs(os.path.join(out, sub))
        args = SimpleNamespace(
            gfa_file=ds.gfa_path, path_file=ds.paths_path,
            fwd=ds.fwd_path, rve=ds.rve_path, output_dir=out,
            min_cov=None, min_len=250, dev=True,
            pe_batch_size=1024, resume=False,
            per_component=bool(rng.randint(0, 2)))
        pipeline.run(args, _LOG)
        fa = open(os.path.join(out, "strain.fasta")).read()
        seqs = ["".join(r.splitlines()[1:]) for r in fa.split(">")[1:]]
        assert seqs, "no strains emitted"
        for s in seqs:
            assert set(s) <= set("ACGT"), "invalid bases"
        got = set(seqs)
        hits = sum(1 for h in ds.true_haplotypes if h in got)
        return (hits, n_strains, kwargs, None)
    except Exception:
        return (0, n_strains, kwargs, traceback.format_exc())
    finally:
        import shutil
        shutil.rmtree(base, ignore_errors=True)


def main():
    logging.basicConfig(level=logging.ERROR)
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=120)
    ap.add_argument("--start", type=int, default=5000)
    args = ap.parse_args()
    fails, partial = [], []
    for i in range(args.seeds):
        seed = args.start + i
        hits, n, kwargs, err = run_one(seed)
        if err:
            fails.append((seed, kwargs, err))
            print(f"[{seed}] CRASH {kwargs}\n{err}", flush=True)
        elif hits < n - 1:
            partial.append((seed, hits, n, kwargs))
            print(f"[{seed}] LOW RECOVERY {hits}/{n} {kwargs}",
                  flush=True)
        if (i + 1) % 20 == 0:
            print(f"# {i + 1}/{args.seeds} done "
                  f"({len(fails)} crashes, {len(partial)} low)",
                  file=sys.stderr, flush=True)
    print(f"\nTOTAL: {args.seeds} configs, {len(fails)} crashes, "
          f"{len(partial)} low-recovery")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
