#!/usr/bin/env python3
"""Hypothesis test: a bitonic sort along the SUBLANE axis (columns of an
(L, W) tile) avoids the lane-permute bound that killed the row sorter.
Every compare-exchange is elementwise between leading-axis slices.

Sorts each column of an (L, W) int32 matrix ascending (key only).
Compares against jnp.sort(axis=0) and times both."""

import os
import sys
import time
from functools import partial

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/vstrains_tpu_jax"))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bitonic_cols(x, L):
    """Bitonic sort along axis 0 of (L, W); L power of two."""
    W = x.shape[1]
    k = 2
    while k <= L:
        j = k // 2
        while j >= 1:
            g = L // (2 * j)
            x4 = x.reshape(g, 2, j, W)
            a = x4[:, 0]          # (g, j, W)
            b = x4[:, 1]
            lo = jnp.minimum(a, b)
            hi = jnp.maximum(a, b)
            # block of size k at column position g*2j: ascending iff
            # bit k of the element index is 0
            gi = jax.lax.broadcasted_iota(jnp.int32, (g, 1, 1), 0)
            asc = ((gi * (2 * j)) & k) == 0
            m = 0 - asc.astype(jnp.int32)
            na = (lo & m) | (hi & ~m)
            nb = (hi & m) | (lo & ~m)
            x = jnp.stack([na, nb], axis=1).reshape(L, W)
            j //= 2
        k *= 2
    return x


def _kernel(x_ref, o_ref, *, L):
    o_ref[:] = _bitonic_cols(x_ref[:], L)


@partial(jax.jit, static_argnames=("blk", "interpret"))
def sort_cols_pallas(x, blk=256, interpret=False):
    L, W = x.shape
    grid = (W // blk,)
    return pl.pallas_call(
        partial(_kernel, L=L),
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((L, W), jnp.int32),
        in_specs=[pl.BlockSpec((L, blk), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((L, blk), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)


def main():
    L = int(os.environ.get("CS_L", 2048))
    W = int(os.environ.get("CS_W", 2048))
    blk = int(os.environ.get("CS_BLK", 256))
    reps = int(os.environ.get("CS_REPS", 10))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(-2**31, 2**31, (L, W)).astype(np.int32))
    print(f"# backend={jax.default_backend()} L={L} W={W} blk={blk}",
          file=sys.stderr)

    # correctness (small slice)
    a = sort_cols_pallas(x[:, :1024], blk=min(blk, 1024))
    b = jnp.sort(x[:, :1024], axis=0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    print("correctness: OK")

    f1 = jax.jit(lambda v, s: jnp.sum(
        sort_cols_pallas(v + s, blk=blk).astype(jnp.float32)))
    f2 = jax.jit(lambda v, s: jnp.sum(
        jnp.sort(v + s, axis=0).astype(jnp.float32)))
    for name, f in (("pallas_col", f1), ("lax.sort0", f2)):
        try:
            float(f(x, jnp.int32(0)))
            t0 = time.time()
            for r in range(reps):
                float(f(x, jnp.int32(r)))
            print(f"{name:10s} {(time.time() - t0) / reps * 1000:8.2f} ms")
        except Exception as exc:
            print(f"{name:10s} FAIL {str(exc).splitlines()[0][:100]}")


if __name__ == "__main__":
    main()
