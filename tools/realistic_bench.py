#!/usr/bin/env python3
"""Realistic-scale PE benchmark: metaSPAdes-sized graph, 1M+ read pairs.

Addresses the 'toy synthetics only' gap: a >= 5,000-node multi-component
graph (including 10kb nodes) with >= 1M read pairs, measuring

  * our engine end-to-end (reads/s, this backend),
  * the ACTUAL reference script (VStrains_PE_Inference.py) on a
    subsample, extrapolated,
  * a byte-level pe_info/st_info diff on that subsample at full graph
    size (N ~ 5k) — correctness at scale, not just speed.

Writes one JSON to --out (and stdout). Honest backend labeling: refuses
to run if --expect-backend mismatches.

    python tools/realistic_bench.py --out realistic_r2_tpu.json
    JAX_PLATFORMS=cpu python tools/realistic_bench.py \
        --expect-backend cpu --pairs 50000
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/vstrains_tpu_jax"))
# the warmup slice is small enough to trip the engine's tiny-workload
# CPU fallback, which would leave the accelerator compile inside the
# timed run — force the requested backend for the whole benchmark
os.environ.setdefault("VSTRAINS_FORCE_BACKEND", "bench")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

REF_SCRIPT = "/root/reference/utils/VStrains_PE_Inference.py"


def build_dataset(base, n_components, pairs_total, rng_seed=5,
                  return_comps=False):
    """Multi-component metaSPAdes-style mixture, one component with 10kb
    anchor nodes (exercises the SP table-build path on multi-device).
    With return_comps, also returns the per-component SynthDataset list
    (true haplotypes, per-component contigs.paths)."""
    from vstrains_tpu.evals.synth import make_dataset

    # abundances 20..100 scale per-strain pair counts by
    # (1+2+3+4+5); normalize so the total lands near pairs_total
    per_comp = max(1, pairs_total // (n_components * 15))
    comps = []
    for ci in range(n_components):
        anchor = 10000 if ci == 0 else 1200
        d = os.path.join(base, f"comp{ci}")
        comps.append(make_dataset(
            d, num_strains=5, num_bubbles=5, anchor_len=anchor,
            variant_len=300, k=55, read_len=150, insert_len=400,
            pairs_per_strain=per_comp,
            abundances=(20.0, 40.0, 60.0, 80.0, 100.0),
            contig_mode="split", error_rate=0.002, seed=rng_seed + ci))

    gfa = os.path.join(base, "graph.gfa")
    fwd = os.path.join(base, "reads_1.fastq")
    rve = os.path.join(base, "reads_2.fastq")
    n_nodes = 0
    with open(gfa, "w") as g:
        for ci, ds in enumerate(comps):
            with open(ds.gfa_path) as fh:
                for line in fh:
                    fields = line.rstrip("\n").split("\t")
                    if fields[0] == "S":
                        fields[1] = str(int(fields[1]) + 100000 * ci)
                        n_nodes += 1
                    elif fields[0] == "L":
                        fields[1] = str(int(fields[1]) + 100000 * ci)
                        fields[3] = str(int(fields[3]) + 100000 * ci)
                    g.write("\t".join(fields) + "\n")
    for out, attr in ((fwd, "fwd_path"), (rve, "rve_path")):
        with open(out, "wb") as o:
            for ds in comps:
                with open(getattr(ds, attr), "rb") as f:
                    o.write(f.read())
    if return_comps:
        return gfa, fwd, rve, n_nodes, comps
    return gfa, fwd, rve, n_nodes


def head_fastq(src, dst, n_reads):
    with open(src) as i, open(dst, "w") as o:
        for idx, line in enumerate(i):
            if idx >= 4 * n_reads:
                break
            o.write(line)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--components", type=int, default=32)
    ap.add_argument("--pairs", type=int, default=1_000_000)
    ap.add_argument("--subsample", type=int, default=2000)
    ap.add_argument("--expect-backend", default=None)
    ap.add_argument("--skip-diff", action="store_true")
    args = ap.parse_args()

    # honor a CPU request even though sitecustomize already imported jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    backend = jax.default_backend()
    if args.expect_backend and backend != args.expect_backend:
        print(f"refusing: backend {backend!r} != {args.expect_backend!r}",
              file=sys.stderr)
        return 2

    from vstrains_tpu.core.fastq import load_read_pairs
    from vstrains_tpu.ops.pe_infer import (PESparseResult, infer_pe_links,
                                           write_pe_files)

    base = tempfile.mkdtemp(prefix="realbench_")
    result = {"backend": backend}
    try:
        t0 = time.time()
        gfa, fwd, rve, n_nodes = build_dataset(base, args.components,
                                               args.pairs)
        result["nodes"] = n_nodes
        print(f"# dataset: {n_nodes} nodes, built in "
              f"{time.time() - t0:.1f}s", file=sys.stderr)

        index2id, index2seq = [], []
        with open(gfa) as fh:
            for line in fh:
                f = line.rstrip("\n").split("\t")
                if f and f[0] == "S":
                    index2id.append(f[1])
                    index2seq.append(f[2])

        k = 55
        t0 = time.time()
        reads = load_read_pairs(fwd, rve, k + 1, pad_to_multiple=32)
        t_load = time.time() - t0
        result["pairs"] = reads.used_reads
        print(f"# reads: {reads.used_reads} pairs, loaded in "
              f"{t_load:.1f}s", file=sys.stderr)

        # warmup/compile on one batch worth, then timed full run
        from vstrains_tpu.core.fastq import ReadPairBatch
        nb = min(16384, reads.num_pairs)
        warm = ReadPairBatch(reads.fwd_codes[:nb], reads.fwd_len[:nb],
                             reads.rve_codes[:nb], reads.rve_len[:nb],
                             0, 0, nb)
        t0 = time.time()
        infer_pe_links(index2id, index2seq, warm, k)
        result["warmup_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        res = infer_pe_links(index2id, index2seq, reads, k)
        dt = time.time() - t0
        result["engine_reads_per_s"] = round(reads.used_reads / dt, 1)
        result["engine_seconds"] = round(dt, 2)
        result["engine_mode"] = ("sparse" if isinstance(
            res, PESparseResult) else "dense")
        print(f"# engine: {result['engine_reads_per_s']} reads/s "
              f"({result['engine_mode']})", file=sys.stderr)

        # reference script on a subsample, extrapolated
        sub_f = os.path.join(base, "sub_1.fastq")
        sub_r = os.path.join(base, "sub_2.fastq")
        head_fastq(fwd, sub_f, args.subsample)
        head_fastq(rve, sub_r, args.subsample)
        ref_out = os.path.join(base, "ref_aln")
        t0 = time.time()
        subprocess.run([sys.executable, REF_SCRIPT, "-g", gfa,
                        "-o", ref_out, "-f", sub_f, "-r", sub_r,
                        "-k", str(k)], check=True, capture_output=True,
                       timeout=7200)
        ref_dt = time.time() - t0
        result["reference_reads_per_s"] = round(args.subsample / ref_dt, 1)
        result["speedup_vs_reference"] = round(
            result["engine_reads_per_s"]
            / result["reference_reads_per_s"], 1)
        print(f"# reference: {result['reference_reads_per_s']} reads/s "
              f"(subsample {args.subsample})", file=sys.stderr)

        if not args.skip_diff:
            sub_reads = load_read_pairs(sub_f, sub_r, k + 1,
                                        pad_to_multiple=32)
            sub_res = infer_pe_links(index2id, index2seq, sub_reads, k)
            our_out = os.path.join(base, "our_aln")
            os.makedirs(our_out, exist_ok=True)
            write_pe_files(sub_res, f"{our_out}/pe_info",
                           f"{our_out}/st_info")
            same = all(
                open(f"{ref_out}/{n}", "rb").read()
                == open(f"{our_out}/{n}", "rb").read()
                for n in ("pe_info", "st_info"))
            result["subsample_diff_identical"] = same
            print(f"# subsample byte-diff identical: {same}",
                  file=sys.stderr)
    finally:
        shutil.rmtree(base, ignore_errors=True)

    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=2)
    return 0 if result.get("subsample_diff_identical", True) else 1


if __name__ == "__main__":
    sys.exit(main())
