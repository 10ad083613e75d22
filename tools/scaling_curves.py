#!/usr/bin/env python3
"""DP/TP scaling curves on the virtual CPU mesh (VERDICT r3 item 7).

Runs tools/multichip_bench.py under 1/2/4/8 forced host-platform
devices and collects the pure-DP (n x 1) and pure-TP (1 x n) reads/s
into one curve, plus bit-equality at every point.

Interpretation caveat (recorded in the JSON): the virtual devices share
one physical CPU's cores, so absolute reads/s does NOT grow with n —
what the curve validates is the SHAPE of the parallel path: partition
+ collective overhead vs the 1-device run stays bounded, and the
per-axis ranking (DP vs TP) predicts which axis to prefer on a real
slice. The first real multi-chip run should reproduce the ranking and
replace the absolute numbers.

    python tools/scaling_curves.py --out scaling_r4.json
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run_point(n_dev: int, bench_args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(f for f in flags.split()
                     if "host_platform_device_count" not in f)
    env["XLA_FLAGS"] = (flags +
                        f" --xla_force_host_platform_device_count={n_dev}"
                        ).strip()
    with tempfile.NamedTemporaryFile(suffix=".json") as tf:
        cmd = [sys.executable, os.path.join(HERE, "multichip_bench.py"),
               "--out", tf.name] + bench_args
        r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                           timeout=3600)
        if r.returncode != 0:
            raise RuntimeError(
                f"multichip_bench n={n_dev} failed:\n{r.stderr[-2000:]}")
        return json.load(open(tf.name))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "scaling_r4.json"))
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--nodes", type=int, default=2000)
    ap.add_argument("--pairs", type=int, default=131072)
    args = ap.parse_args()
    bench_args = ["--nodes", str(args.nodes), "--pairs", str(args.pairs)]

    curve = {"workload": {"nodes": args.nodes, "pairs": args.pairs},
             "caveat": "virtual CPU mesh: devices share one CPU, so "
                       "reads/s is flat-to-declining by construction; "
                       "the curve validates partition+collective "
                       "overhead and the DP-vs-TP ranking, not speedup",
             "points": []}
    for n in [int(x) for x in args.devices.split(",")]:
        res = run_point(n, bench_args)
        meshes = res["meshes"]
        dp = meshes.get(f"{n}x1")
        tp = meshes.get(f"1x{n}")
        point = {
            "devices": n,
            "single_chip_reads_per_s": res["single_chip"]["reads_per_s"],
            "dp_reads_per_s": dp["reads_per_s"] if dp else None,
            "dp_bit_equal": dp["bit_equal"] if dp else None,
            "tp_reads_per_s": tp["reads_per_s"] if tp else None,
            "tp_bit_equal": tp["bit_equal"] if tp else None,
            "all_shapes": {k: v["reads_per_s"]
                           for k, v in meshes.items()},
            "all_bit_equal": res["all_bit_equal"],
        }
        curve["points"].append(point)
        print(f"# n={n}: engine={point['single_chip_reads_per_s']:,} "
              f"dp={point['dp_reads_per_s']} tp={point['tp_reads_per_s']} "
              f"ok={point['all_bit_equal']}", file=sys.stderr)

    ok = all(p["all_bit_equal"] for p in curve["points"])
    curve["all_bit_equal"] = ok
    with open(args.out, "w") as f:
        json.dump(curve, f, indent=2)
    print(json.dumps(curve))
    print(f"# wrote {args.out}", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
