"""Paired-FASTQ random down-sampler.

Parity: /root/reference/evals/sampling.py (1/s uniform pair sampling),
re-implemented with a seeded vectorized mask so runs are reproducible.

    python -m vstrains_tpu.evals.sampling -s 2 -f r1.fq -r r2.fq \
        -of out1.fq -or out2.fq [--seed 0]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def sample_pairs(fwd_path: str, rve_path: str, out_fwd: str, out_rve: str,
                 sratio: int, seed: int = None) -> int:
    if sratio <= 1:
        raise ValueError("sampling ratio must be > 1")
    with open(fwd_path, "rb") as f:
        flines = f.read().split(b"\n")
    with open(rve_path, "rb") as f:
        rlines = f.read().split(b"\n")
    n = min(len(flines) // 4, len(rlines) // 4)
    rng = np.random.RandomState(seed)
    keep = rng.random_sample(n) <= 1.0 / sratio
    k = int(keep.sum())
    with open(out_fwd, "wb") as of, open(out_rve, "wb") as orv:
        for i in np.flatnonzero(keep):
            of.write(b"\n".join(flines[i * 4: i * 4 + 4]) + b"\n")
            orv.write(b"\n".join(rlines[i * 4: i * 4 + 4]) + b"\n")
    print(f"reads in input: {n}")
    print(f"sample {k} reads given ratio {sratio}")
    return k


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="sampling", description="Randomly down-sample a paired FASTQ set")
    parser.add_argument("-s", "--sampling_ratio", dest="sratio", type=int,
                        required=True,
                        help="sampling ratio, 2 for half the dataset")
    parser.add_argument("-f", "--forward", dest="fwd", required=True)
    parser.add_argument("-r", "--reverse", dest="rve", required=True)
    parser.add_argument("-of", "--out_forward", dest="ofwd", required=True)
    parser.add_argument("-or", "--out_reverse", dest="orve", required=True)
    parser.add_argument("--seed", dest="seed", type=int, default=None)
    args = parser.parse_args(argv)
    sample_pairs(args.fwd, args.rve, args.ofwd, args.orve, args.sratio,
                 args.seed)
    return 0


if __name__ == "__main__":
    sys.exit(main())
