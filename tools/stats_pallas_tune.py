#!/usr/bin/env python3
"""Micro-tuner for stats_accum_pallas at realistic mid-N shape:
R=2*16384 rows, C ~ K*D slots, N ~ 1k nodes. Sweeps (block, col chunk)
to find what fits VMEM and what's fastest on the live chip."""

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/vstrains_tpu_jax"))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import vstrains_tpu.ops.pallas_kernels as PK


def main():
    R = int(os.environ.get("TUNE_R", 32768))
    C = int(os.environ.get("TUNE_C", 1152))
    N = int(os.environ.get("TUNE_N", 992))
    depth = int(os.environ.get("TUNE_D", 9))
    rng = np.random.RandomState(0)
    node_t = rng.randint(0, N + 1, size=(R, C)).astype(np.int32)
    node_t = jnp.asarray(node_t)
    print(f"# backend={jax.default_backend()} R={R} C={C} N={N}",
          file=sys.stderr)

    for cw in (int(x) for x in
               os.environ.get("TUNE_CW", "128,64,32").split(",")):
        PK._STATS_PALLAS_COL_CHUNK = cw
        for blk in (int(x) for x in
                    os.environ.get("TUNE_BLK", "256,128,64,32").split(",")):
            try:
                f = jax.jit(lambda x: tuple(
                    jnp.sum(y.astype(jnp.float32)) for y in
                    PK.stats_accum_pallas(x, depth=depth, num_nodes=N,
                                          block=blk)))
                r = f(node_t)
                jax.block_until_ready(r)
                t0 = time.time()
                for _ in range(3):
                    r = f(node_t)
                jax.block_until_ready(r)
                dt = (time.time() - t0) / 3 * 1000
                print(f"cw={cw:4d} blk={blk:4d}  {dt:8.1f} ms")
            except Exception as exc:
                msg = str(exc).split("\n")[0][:110]
                print(f"cw={cw:4d} blk={blk:4d}  FAIL {msg}")


if __name__ == "__main__":
    main()
