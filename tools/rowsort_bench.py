#!/usr/bin/env python3
"""Pallas bitonic row sorter vs XLA lax.sort on the sparse-tail shape
(R=32768 rows, C~K*D columns). Correctness + scalar-synced timing."""

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

from vstrains_tpu.ops.pallas_sort import sort_rows_pallas


def main():
    R = int(os.environ.get("RS_R", 32768))
    C = int(os.environ.get("RS_C", 1050))
    reps = int(os.environ.get("RS_REPS", 10))
    print(f"# backend={jax.default_backend()} R={R} C={C}",
          file=sys.stderr)
    rng = np.random.RandomState(0)
    key = jnp.asarray(rng.randint(-2**31, 2**31, (R, C)).astype(np.int32))
    val = jnp.asarray(rng.randint(0, 1 << 30, (R, C)).astype(np.int32))

    @jax.jit
    def f_pallas(k, v, s):
        ko, vo = sort_rows_pallas(k + s, v)
        return (jnp.sum(ko.astype(jnp.float32))
                + jnp.sum(vo.astype(jnp.float32)))

    @jax.jit
    def f_xla(k, v, s):
        ko, vo = jax.lax.sort((k + s, v), dimension=1, num_keys=2)
        return (jnp.sum(ko.astype(jnp.float32))
                + jnp.sum(vo.astype(jnp.float32)))

    # correctness on a slice
    ks, vs = key[:256], val[:256]
    a = sort_rows_pallas(ks, vs)
    b = jax.lax.sort((ks, vs), dimension=1, num_keys=2)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    print("correctness vs lax.sort: OK")

    for name, f in (("pallas", f_pallas), ("lax.sort", f_xla)):
        try:
            float(f(key, val, jnp.int32(0)))
            t0 = time.time()
            for r in range(reps):
                float(f(key, val, jnp.int32(r)))
            dt = (time.time() - t0) / reps * 1000
            print(f"{name:9s} {dt:8.2f} ms")
        except Exception as exc:
            print(f"{name:9s} FAIL {str(exc).splitlines()[0][:100]}")


if __name__ == "__main__":
    main()
