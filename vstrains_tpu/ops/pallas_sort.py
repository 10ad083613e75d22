"""Pallas batched row sorter (bitonic network, VMEM-resident).

Sorts each row of an int32 matrix independently — the shape of work the
PE engine's sparse stats tail does per batch (row-sort of (2B, K*D)
match slots) and the building block of a future flat-array sorter
(docs/ROADMAP.md #1). XLA's lax.sort lowers to ~log^2(n) full-HBM
passes; here every substage of the network runs on the VMEM-resident
row block, so HBM sees each element once in and once out.

The network sorts ascending with a deterministic total order; an
optional value operand rides along (compare-exchange moves key and
value together, ties broken by value for a unique order)."""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bitonic_rows(key, val, L: int, roll=None):
    """Full bitonic sort of each row of (blk, L) arrays; L power of 2.
    Returns (key, val) sorted ascending by (key, val) per row.

    Pair exchange at stride j is expressed with circular rolls instead
    of reshapes (Mosaic rejects the (blk, g, 2, j) shape cast): element
    i's partner i^j sits at roll -j when bit j of i is 0, else +j;
    wrap-around lanes land only on positions that take the other
    branch, so the circular shift is exact."""
    if roll is None:
        roll = lambda x, s: jnp.roll(x, s, axis=1)  # noqa: E731

    def bsel(mask_bool, a, b):
        # branchless bitwise select: Mosaic rejects select_n at these
        # layouts ("unsupported target bitwidth for truncation")
        m = 0 - mask_bool.astype(jnp.int32)  # -1 where True
        return (a & m) | (b & ~m)

    idx = jax.lax.broadcasted_iota(jnp.int32, key.shape, 1)
    k = 2
    while k <= L:
        asc = (idx & k) == 0
        j = k // 2
        while j >= 1:
            left = (idx & j) == 0
            pk = bsel(left, roll(key, -j), roll(key, j))
            pv = bsel(left, roll(val, -j), roll(val, j))
            gt = (key > pk) | ((key == pk) & (val > pv))
            lt = (key < pk) | ((key == pk) & (val < pv))
            # an element keeps the smaller of the pair iff it is the
            # left member of an ascending block or the right member of
            # a descending one
            take = bsel(left == asc, 0 - gt.astype(jnp.int32),
                        0 - lt.astype(jnp.int32))
            key = (pk & take) | (key & ~take)
            val = (pv & take) | (val & ~take)
            j //= 2
        k *= 2
    return key, val


def _rowsort_kernel(key_ref, val_ref, ko_ref, vo_ref, *, L: int):
    def roll(x, s):
        return pltpu.roll(x, s % L, axis=1)

    k, v = _bitonic_rows(key_ref[:], val_ref[:], L, roll=roll)
    ko_ref[:] = k
    vo_ref[:] = v


@partial(jax.jit, static_argnames=("block", "interpret"))
def sort_rows_pallas(key, val, block: int = 64, interpret: bool = False):
    """Row-wise (key, val) sort, ascending by (key, val).

    key/val: int32 [R, C]. C pads to a power of two with INT32_MAX
    sentinels (stripped from the result). Each grid step sorts a
    VMEM-resident row block through the full bitonic network."""
    R, C = key.shape
    L = 1
    while L < C:
        L *= 2
    if L != C:
        key = jnp.pad(key, ((0, 0), (0, L - C)),
                      constant_values=np.int32(2**31 - 1))
        val = jnp.pad(val, ((0, 0), (0, L - C)),
                      constant_values=np.int32(2**31 - 1))
    blk = min(block, R)
    while R % blk:
        blk //= 2
    # the network holds ~6 live (blk, L) i32 planes; stay under VMEM
    while blk > 1 and 4 * blk * L * 8 > 12 * 1024 * 1024:
        blk //= 2
    grid = (R // blk,)
    ko, vo = pl.pallas_call(
        partial(_rowsort_kernel, L=L),
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((R, L), jnp.int32),
            jax.ShapeDtypeStruct((R, L), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((blk, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((blk, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(key, val)
    return ko[:, :C], vo[:, :C]
