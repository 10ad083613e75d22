"""Pallas TPU kernels for the PE-engine hot ops.

Two kernels ship today, both drop-in equivalents of their XLA
counterparts in ops/pe_infer.py and auto-benchmarked against them
(tools/kernel_bench.py):

  * window_hashes_pallas — the dual-lane rolling (k+1)-mer hash over a
    read block: streams code tiles through VMEM, unrolls the L-step
    polynomial accumulation on the VPU;
  * pair_matmuls_pallas — saturation-mask pair counting on the MXU with
    the upper-triangle mask fused into the same kernel (the XLA version
    materializes `same` then masks).

Why there is no Pallas probe kernel: the probe needs arbitrary per-lane
gathers from a VMEM-resident table; Mosaic on this toolchain only lowers
2-D aligned gathers (`take_along_axis` shapes), so a vectorized binary
search cannot be expressed — measured alternatives and the sort-merge-join
decision are documented in docs/ARCHITECTURE.md.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vstrains_tpu.core.seq import HASH_MULT_1, HASH_MULT_2, _mult_pows


def _hash_kernel(codes_ref, lens_ref, h1_ref, h2_ref, valid_ref, *,
                 split_len: int, K: int, Kp: int, pow1, pow2):
    codes = codes_ref[:].astype(jnp.int32)  # v5e lacks i8 vector compares
    B, T = codes.shape
    bad = (codes >= 4).astype(jnp.int32)
    c = jnp.where(codes < 4, codes, 0).astype(jnp.uint32) + jnp.uint32(1)
    h1 = jnp.zeros((B, K), jnp.uint32)
    h2 = jnp.zeros((B, K), jnp.uint32)
    nbad = jnp.zeros((B, K), jnp.int32)
    for i in range(split_len):
        ci = c[:, i: i + K]
        h1 = h1 + ci * jnp.uint32(int(pow1[i]))
        h2 = h2 + ci * jnp.uint32(int(pow2[i]))
        nbad = nbad + bad[:, i: i + K]
    win = jax.lax.broadcasted_iota(jnp.int32, (B, Kp), 1)
    lens = lens_ref[:]
    valid = (((win + split_len) <= lens[:, :1]) & (win < K)
             & (jnp.pad(nbad, [(0, 0), (0, Kp - K)],
                        constant_values=1) == 0))
    pad = [(0, 0), (0, Kp - K)]
    # bias h1 into signed order (the sort-join key domain); h2 raw bitcast
    h1_ref[:] = jnp.pad((h1 ^ jnp.uint32(0x80000000)).astype(jnp.int32),
                        pad)
    h2_ref[:] = jnp.pad(h2.astype(jnp.int32), pad)
    valid_ref[:] = valid.astype(jnp.int32)


@partial(jax.jit, static_argnames=("split_len", "block", "interpret"))
def window_hashes_pallas(codes, lens, split_len: int, block: int = 128,
                         interpret: bool = False):
    """Dual 32-bit window hashes of a read batch.

    codes: uint8 [B, T]; lens: int32 [B]. Returns (h1_biased, h2, valid)
    of shape [B, Kp] where Kp = K rounded up to the 128-lane boundary
    (extra windows marked invalid); h1 carries the sort-join sign bias
    (h1 ^ 0x80000000 as int32). The first K columns match
    ops.pe_infer._device_window_hashes bit-for-bit (after bias).
    """
    B, T = codes.shape
    K = T - split_len + 1
    Kp = -(-K // 128) * 128  # lane-aligned output width
    pow1 = _mult_pows(HASH_MULT_1, split_len)[::-1].copy()
    pow2 = _mult_pows(HASH_MULT_2, split_len)[::-1].copy()
    grid = (max(1, B // block),)
    kernel = partial(_hash_kernel, split_len=split_len, K=K, Kp=Kp,
                     pow1=pow1, pow2=pow2)
    lens2 = lens.reshape(B, 1)
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((B, Kp), jnp.int32),
            jax.ShapeDtypeStruct((B, Kp), jnp.int32),
            jax.ShapeDtypeStruct((B, Kp), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((block, T), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block, Kp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, Kp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, Kp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(codes, lens2)


def _stats_accum_kernel(node_ref, cnt_ref, kmin_ref, *, CW: int,
                        depth: int, Np: int, inf: int):
    c = pl.program_id(1)
    nodes = node_ref[:]
    ns = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)

    @pl.when(c == 0)
    def _():
        cnt_ref[:] = jnp.zeros_like(cnt_ref)
        kmin_ref[:] = jnp.full_like(kmin_ref, inf)

    cnt = cnt_ref[:]
    kmin = kmin_ref[:]
    base = c * CW
    for jj in range(CW):
        oh = nodes[:, jj: jj + 1] == ns
        cnt = cnt + oh.astype(jnp.int32)
        kmin = jnp.minimum(kmin, jnp.where(oh, (base + jj) // depth, inf))
    cnt_ref[:] = cnt
    kmin_ref[:] = kmin


_STATS_PALLAS_MAX_NODES = 4096
_STATS_PALLAS_COL_CHUNK = 128


def stats_accum_pallas_fits(C: int, num_nodes: int) -> bool:
    """Any slot count fits (the kernel sweeps C in 128-column grid
    steps); N is bounded by Mosaic's scoped-vmem stack. The stack has
    two terms (fit to observed sizes on v5e — 17.77M at blk=256/
    Np=1024/CW=128 and 21.20M at blk=64/Np=2048/CW=128): ~37 B per
    (blk, Np) accumulator element plus ~64 B per (CW, Np) temporary
    element of the unrolled column loop. CW cannot shrink below 128
    (TPU lane-dimension constraint), so at the minimum blk=8 the
    kernel fits only while (296 + 8192) * Np <= 12M, i.e.
    Np <= 1408 — beyond that the compile itself OOMs (caught live by
    tools/cutover_sweep.py at N=2000 in round 5; the old check
    approved up to N=4096). The driver routes larger graphs to the
    sparse row-sort engine instead."""
    n_pad = -(-(num_nodes + 1) // 128) * 128
    return ((296 + 8192) * n_pad <= 12 * 1024 * 1024
            and num_nodes <= _STATS_PALLAS_MAX_NODES)


@partial(jax.jit, static_argnames=("depth", "num_nodes", "block",
                                   "interpret"))
def stats_accum_pallas(node_t, depth: int, num_nodes: int,
                       block: int = 256, interpret: bool = False):
    """Per-(read, node) (count, min k-index) from per-slot node ids.

    node_t: int32 [R, C] where slot j of row r holds the node id matched
    by window k = j // depth at duplicate rank j % depth, or the sentinel
    `num_nodes` for a miss. Returns (cnt, kmin) int32 [R, num_nodes].

    This fuses the one-hot accumulation of
    ops.pe_infer._dup_scan_stats_onehot_impl into VMEM: the XLA version
    materializes (R, C, N)-shaped intermediates in HBM per reduction;
    here the whole compare/accumulate loop stays on-chip per row block.
    The grid is (row blocks, column chunks) with columns innermost: the
    accumulators for a row block stay resident in VMEM across the C
    sweep (the canonical Pallas revisiting-output pattern), so slot
    count is unbounded and compile size is fixed at one 128-column
    unroll."""
    R, C = node_t.shape
    Np = -(-(num_nodes + 1) // 128) * 128
    inf = 2**31 - 1
    CW = min(_STATS_PALLAS_COL_CHUNK, C)
    Cp = -(-C // CW) * CW
    if Cp != C:
        # sentinel-padded slots never match a real node column
        node_t = jnp.pad(node_t, ((0, 0), (0, Cp - C)),
                         constant_values=num_nodes)
    blk = min(block, R)
    while R % blk:
        blk //= 2
    # Mosaic's scoped-vmem stack for the unrolled compare loop has TWO
    # terms (fit to observed stack sizes on v5e: 17.77M at blk=256/
    # Np=1024/CW=128 and 21.20M at blk=64/Np=2048/CW=128): ~37 bytes
    # per (blk, Np) accumulator element plus ~64 bytes per (CW, Np)
    # temporary element from the unrolled column loop. The old
    # single-term model ignored the CW term, so any Np >= 2048 kernel
    # compiled over the 16M limit REGARDLESS of blk — a hard
    # compile-time OOM for dense TPU runs at N in [~1100, 3800]
    # (caught by tools/cutover_sweep.py in round 5). Shrink CW first
    # (its term dominates at large Np), then blk, keeping the estimate
    # under 12M.
    def _scoped(b):
        return 37 * b * Np + 64 * CW * Np

    while blk > 8 and _scoped(blk) > 12 * 1024 * 1024:
        blk //= 2
    # interpret mode (CPU tests) has no VMEM; only real Mosaic
    # lowering must be gated on stats_accum_pallas_fits
    assert interpret or _scoped(blk) <= 12 * 1024 * 1024, (
        f"stats_accum_pallas cannot fit Np={Np} in scoped VMEM; "
        "callers must gate on stats_accum_pallas_fits")
    grid = (R // blk, Cp // CW)
    kernel = partial(_stats_accum_kernel, CW=CW, depth=depth, Np=Np,
                     inf=inf)
    cnt, kmin = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((R, Np), jnp.int32),
            jax.ShapeDtypeStruct((R, Np), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((blk, CW), lambda i, c: (i, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((blk, Np), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, Np), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(node_t)
    return cnt[:, :num_nodes], kmin[:, :num_nodes]


def pair_matmuls_pallas_fits(B: int, N: int) -> bool:
    """True when the (N, N) outputs (double-buffered) + input blocks fit
    the 16MB VMEM budget — covers typical viral graphs (N up to ~700)."""
    return 2 * 2 * 4 * N * N + 2 * 2 * 4 * 128 * N <= 9 * 1024 * 1024


def _pair_kernel(f_ref, r_ref, nm_ref, sm_ref):
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    f = f_ref[:]
    r = r_ref[:]

    @pl.when(i == 0)
    def _():
        nm_ref[:] = jnp.zeros_like(nm_ref)
        sm_ref[:] = jnp.zeros_like(sm_ref)

    # per-block partials are small integers exactly representable in f32;
    # accumulating in the int32 outputs keeps VMEM within budget at any N
    nm_ref[:] += jax.lax.dot_general(
        f, r, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)
    sm_ref[:] += (
        jax.lax.dot_general(f, f, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(r, r, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    ).astype(jnp.int32)

    @pl.when(i == n_blocks - 1)
    def _():
        N = nm_ref.shape[0]
        rows = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
        sm_ref[:] = jnp.where(rows <= cols, sm_ref[:], 0)


@partial(jax.jit, static_argnames=("block", "interpret"))
def pair_matmuls_pallas(f, r, block: int = None, interpret: bool = False):
    """node_mat = f^T r ; short_mat = triu(f^T f + r^T r), fused on MXU
    with int32 output accumulation over B-blocks.

    f, r: float32 [B, N] saturation masks (0/1). Equals
    ops.pe_infer._pair_matmuls exactly (0/1 entries, exact in f32).
    """
    B, N = f.shape
    if not pair_matmuls_pallas_fits(B, N):
        raise ValueError(
            f"pair_matmuls_pallas: N={N} outputs exceed the VMEM budget "
            "(outputs are double-buffered); use the XLA path")
    if block is None:
        # keep inputs + outputs (both double-buffered by the pipeline)
        # within the 16MB VMEM budget; block must divide B (pallas would
        # feed garbage-padded partial blocks into the matmul), so round
        # down to a power of two — the engine's batch sizes are powers of
        # two times 128
        budget = 4 * 1024 * 1024
        target = max(128, min(B, budget // max(1, 16 * N)))
        block = 1 << (target.bit_length() - 1)
    block = min(block, B)
    if B % block != 0:
        # largest power-of-two factor of B within the target; a fallback
        # to block=B could blow the input VMEM budget
        import math
        block = math.gcd(B, block)
        if 2 * 2 * 4 * block * N > 12 * 1024 * 1024:
            raise ValueError(
                f"pair_matmuls_pallas: no dividing block for B={B}, N={N} "
                "fits the VMEM budget; use the XLA path")
    grid = (max(1, B // block),)
    return pl.pallas_call(
        _pair_kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((N, N), jnp.int32),
            jax.ShapeDtypeStruct((N, N), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((block, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((N, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(f, r)
