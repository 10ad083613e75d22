#!/usr/bin/env python3
"""Correctness + honest timing of stats_accum_pallas on the live chip.
Compares against the XLA scatter accumulator at mid-N shape."""

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
import vstrains_tpu.ops.pe_infer as P


def main():
    R = int(os.environ.get("TUNE_R", 4096))
    C = int(os.environ.get("TUNE_C", 1152))
    N = int(os.environ.get("TUNE_N", 992))
    depth = int(os.environ.get("TUNE_D", 9))
    blk = int(os.environ.get("TUNE_BLK", 128))
    reps = int(os.environ.get("TUNE_REPS", 20))
    rng = np.random.RandomState(0)
    nt = rng.randint(0, N + 1, size=(R, C)).astype(np.int32)
    # make misses common like real data
    nt[rng.rand(R, C) < 0.7] = N
    node_t = jnp.asarray(nt)
    print(f"# backend={jax.default_backend()} R={R} C={C} N={N} blk={blk}",
          file=sys.stderr)

    cnt, kmin = PK.stats_accum_pallas(node_t, depth=depth, num_nodes=N,
                                      block=blk)
    cnt_ref, kmin_ref = jax.jit(
        P._slots_scatter_accum, static_argnums=(1, 2))(node_t, depth, N)
    np.testing.assert_array_equal(np.asarray(cnt), np.asarray(cnt_ref))
    np.testing.assert_array_equal(np.asarray(kmin), np.asarray(kmin_ref))
    print("correctness: OK")

    f = jax.jit(lambda x: PK.stats_accum_pallas(x, depth=depth,
                                                num_nodes=N, block=blk))
    r = jax.block_until_ready(f(node_t))
    t0 = time.time()
    for _ in range(reps):
        r = f(node_t)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / reps * 1000
    vol = R * C * ((N + 129) // 128 * 128)
    print(f"pallas  {dt:8.2f} ms  ({vol / dt / 1e9:.1f} Gcmp/ms)")

    g = jax.jit(lambda x: P._slots_scatter_accum(x, depth, N))
    r = jax.block_until_ready(g(node_t))
    t0 = time.time()
    for _ in range(reps):
        r = g(node_t)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / reps * 1000
    print(f"scatter {dt:8.2f} ms")

    h = jax.jit(lambda x: P._slots_onehot_accum(x, depth, N))
    try:
        r = jax.block_until_ready(h(node_t))
        t0 = time.time()
        for _ in range(reps):
            r = h(node_t)
        jax.block_until_ready(r)
        dt = (time.time() - t0) / reps * 1000
        print(f"onehot  {dt:8.2f} ms")
    except Exception as exc:
        print(f"onehot  FAIL {str(exc).splitlines()[0][:90]}")


if __name__ == "__main__":
    main()
