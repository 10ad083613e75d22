"""A/B the native (C++) k-mer table build against the numpy oracle.

The native path (native/table_build.cpp via build_table_entries_native)
must produce a bit-identical KmerTable on every field — including the
tie order of equal (h1, h2) keys across different (node, offset), which
duplicate sequences force at high volume.
"""

import os

import numpy as np
import pytest

from vstrains_tpu import native as nat
from vstrains_tpu.ops.pe_infer import build_kmer_table

pytestmark = pytest.mark.skipif(
    nat.get_table_lib() is None, reason="no native toolchain")


def _ab(seqs, L, **kw):
    os.environ["VSTRAINS_NATIVE_TABLE"] = "0"
    try:
        a = build_kmer_table(seqs, L, **kw)
    finally:
        os.environ["VSTRAINS_NATIVE_TABLE"] = "1"
    b = build_kmer_table(seqs, L, **kw)
    for f in ("h1_biased", "h2", "node", "offset", "seq_lens"):
        x, y = getattr(a, f), getattr(b, f)
        assert x.shape == y.shape, f
        assert (x == y).all(), f
    for f in ("max_dup", "num_nodes", "split_len", "num_entries",
              "bucket_shift", "scan_depth"):
        assert getattr(a, f) == getattr(b, f), f
    xa, xb = a.bucket_starts, b.bucket_starts
    assert (xa is None) == (xb is None)
    if xa is not None:
        assert (xa == xb).all()
    return b


def _random_seqs(rng, n, lo, hi, alphabet="ACGT"):
    return ["".join(rng.choice(list(alphabet), size=rng.integers(lo, hi)))
            for _ in range(n)]


def test_random_with_ns_and_lowercase():
    rng = np.random.default_rng(7)
    seqs = _random_seqs(rng, 40, 5, 120, alphabet="ACGTN")
    seqs += [s.lower() for s in seqs[:5]]        # lowercase -> BAD_CODE
    seqs += ["ACG", "", "N" * 50, "A" * 17]      # short / empty / all-bad
    _ab(seqs, 17)


def test_duplicate_sequences_force_tie_canonization():
    rng = np.random.default_rng(11)
    base = _random_seqs(rng, 6, 40, 80)
    seqs = base * 7                              # every k-mer in 7+ nodes
    t = _ab(seqs, 21)
    assert t.max_dup >= 7                        # ties actually occurred


def test_exact_length_and_single_node():
    _ab(["ACGTACGTACGTACGTA"], 17)               # exactly one window
    _ab(["ACGTACGTACGTACGTA"], 18)               # no window (n < L)


def test_bucket_index_variants():
    rng = np.random.default_rng(3)
    seqs = _random_seqs(rng, 30, 30, 90)
    _ab(seqs, 15, bucket_index=True)
    _ab(seqs, 15, bucket_index=False)
    _ab(seqs, 15, pad_to_bucket=False)


def test_matches_direct_hash_definition():
    # the native rolling hash must equal the L-term definition, not just
    # the numpy prefix-sum factorization
    from vstrains_tpu.core.seq import (_window_hashes_np_direct,
                                       encode_seq)
    rng = np.random.default_rng(5)
    seq = "".join(rng.choice(list("ACGTN"), size=300))
    L = 19
    h1d, h2d, vd = _window_hashes_np_direct(encode_seq(seq), L)
    got = nat.build_table_entries_native([seq], L)
    assert got is not None
    h1, h2, node, off, _ = got
    # entries arrive sorted — verify as a set against the direct oracle
    idx = np.nonzero(vd)[0]
    want = set(zip(h1d[idx].tolist(), h2d[idx].tolist(), idx.tolist()))
    havef = set()
    for a, b, n_, o in zip(h1.tolist(), h2.tolist(), node.tolist(),
                           off.tolist()):
        assert n_ == 0
        havef.add((a, b, o))
    # every forward-strand (h1, h2, offset) from the definition appears
    assert want <= havef
