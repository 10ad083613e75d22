#!/usr/bin/env python3
"""Micro-benchmark: Pallas kernels vs XLA counterparts on the real device.

Run on TPU:  python tools/kernel_bench.py
Prints a table; used to decide the default kernel per op.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def bench(fn, *args, n=20):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    import jax.numpy as jnp

    from vstrains_tpu.ops.pallas_kernels import (pair_matmuls_pallas,
                                                 window_hashes_pallas)
    from vstrains_tpu.ops.pe_infer import (_device_window_hashes,
                                           _pair_matmuls_jit)

    rng = np.random.RandomState(0)
    B, T, L = 16384, 152, 56
    codes = jnp.asarray(rng.randint(0, 4, (B, T)).astype(np.uint8))
    lens = jnp.asarray(np.full(B, 150, np.int32))

    import jax
    xla_hash = jax.jit(lambda c, l: _device_window_hashes(c, l, L))
    t_xla = bench(xla_hash, codes, lens)
    t_pal = bench(lambda c, l: window_hashes_pallas(c, l, L), codes, lens)
    print(f"window hashes  B={B} T={T} L={L}:", flush=True)
    print(f"  xla    {t_xla*1e3:8.3f} ms")
    print(f"  pallas {t_pal*1e3:8.3f} ms", flush=True)

    # correctness on device (everything inside one jit: eager op-by-op
    # execution over the compile relay is pathologically slow)
    K = T - L + 1

    @jax.jit
    def hash_check(codes, lens):
        h1p, h2p, vp = window_hashes_pallas(codes, lens, L)
        h1x, h2x, vx = _device_window_hashes(codes, lens, L)
        h1x_b = (h1x ^ jnp.uint32(0x80000000)).astype(jnp.int32)
        return (jnp.all(h1p[:, :K] == h1x_b)
                & jnp.all(vp[:, :K].astype(bool) == vx))

    print(f"  match: {bool(hash_check(codes, lens))}", flush=True)

    from vstrains_tpu.ops.pallas_kernels import pair_matmuls_pallas_fits
    for N in (128, 1024):
        f = jnp.asarray((rng.rand(B, N) < 0.05).astype(np.float32))
        r = jnp.asarray((rng.rand(B, N) < 0.05).astype(np.float32))
        t_xla = bench(lambda a, b: _pair_matmuls_jit(a, b, num_nodes=N),
                      f, r)
        if not pair_matmuls_pallas_fits(B, N):
            print(f"pair matmuls  B={B} N={N}:")
            print(f"  xla    {t_xla*1e3:8.3f} ms")
            print("  pallas (outputs exceed VMEM budget; XLA fallback)")
            continue
        t_pal = bench(pair_matmuls_pallas, f, r)
        print(f"pair matmuls  B={B} N={N}:")
        print(f"  xla    {t_xla*1e3:8.3f} ms")
        print(f"  pallas {t_pal*1e3:8.3f} ms", flush=True)

        @jax.jit
        def pair_check(a, b):
            nmx, smx = _pair_matmuls_jit(a, b, num_nodes=N)
            nmp, smp = pair_matmuls_pallas(a, b)
            return jnp.all(nmx == nmp) & jnp.all(smx == smp)

        print(f"  match: {bool(pair_check(f, r))}", flush=True)


if __name__ == "__main__":
    main()
