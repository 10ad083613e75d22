"""Pallas kernels (interpret mode on CPU) vs their XLA counterparts."""

import numpy as np
import pytest

import jax.numpy as jnp

from vstrains_tpu.ops.pallas_kernels import (pair_matmuls_pallas,
                                             window_hashes_pallas)
from vstrains_tpu.ops.pe_infer import (_device_window_hashes,
                                       _pair_matmuls)


def test_window_hashes_pallas_matches_xla():
    rng = np.random.RandomState(0)
    B, T, L = 16, 40, 7
    codes = rng.randint(0, 4, (B, T)).astype(np.uint8)
    codes[3, 35:] = 255  # padding
    lens = rng.randint(L, T + 1, B).astype(np.int32)
    h1p, h2p, vp = window_hashes_pallas(jnp.asarray(codes),
                                        jnp.asarray(lens), L, block=8,
                                        interpret=True)
    h1x, h2x, vx = _device_window_hashes(jnp.asarray(codes),
                                         jnp.asarray(lens), L)
    K = T - L + 1
    np.testing.assert_array_equal(
        np.asarray(h1p)[:, :K],
        (np.asarray(h1x) ^ np.uint32(0x80000000)).view(np.int32))
    np.testing.assert_array_equal(np.asarray(h2p)[:, :K],
                                  np.asarray(h2x).view(np.int32))
    np.testing.assert_array_equal(np.asarray(vp)[:, :K].astype(bool),
                                  np.asarray(vx))
    # padded lanes are invalid
    assert not np.asarray(vp)[:, K:].any()


def test_pair_matmuls_pallas_matches_xla():
    rng = np.random.RandomState(1)
    B, N = 32, 10
    f = (rng.rand(B, N) < 0.3).astype(np.float32)
    r = (rng.rand(B, N) < 0.3).astype(np.float32)
    nmp, smp = pair_matmuls_pallas(jnp.asarray(f), jnp.asarray(r),
                                   interpret=True)
    nmx, smx = _pair_matmuls(jnp.asarray(f), jnp.asarray(r), N)
    np.testing.assert_array_equal(np.asarray(nmp), np.asarray(nmx))
    np.testing.assert_array_equal(np.asarray(smp), np.asarray(smx))


def test_sort_rows_pallas_matches_lexsort():
    """The bitonic row sorter (kept as a tested artifact — see
    docs/ROADMAP.md #1 negative result) matches a (key, val) lexsort,
    including non-power-of-two widths via sentinel padding."""
    from vstrains_tpu.ops.pallas_sort import sort_rows_pallas

    rng = np.random.RandomState(7)
    for R, C in ((32, 100), (16, 256), (8, 5)):
        key = rng.randint(-2**31, 2**31, (R, C)).astype(np.int32)
        val = rng.randint(0, 97, (R, C)).astype(np.int32)
        ko, vo = sort_rows_pallas(jnp.asarray(key), jnp.asarray(val),
                                  interpret=True)
        order = np.lexsort((val, key), axis=-1)
        np.testing.assert_array_equal(
            np.asarray(ko), np.take_along_axis(key, order, axis=1))
        np.testing.assert_array_equal(
            np.asarray(vo), np.take_along_axis(val, order, axis=1))
