"""Unit tests for core/seq.py: encoding, revcomp, window hashes."""

import numpy as np
import pytest

from vstrains_tpu.core.seq import (BAD_CODE, HASH_MULT_1, HASH_MULT_2,
                                   decode_codes, encode_seq, revcomp_codes,
                                   revcomp_str, seq_window_hashes,
                                   window_hashes_np)


def test_encode_decode_roundtrip():
    s = "ACGTACGTTTGA"
    codes = encode_seq(s)
    assert decode_codes(codes) == s


def test_encode_bad_chars():
    codes = encode_seq("ACGNacg")
    assert codes[3] == BAD_CODE
    assert (codes[4:] == BAD_CODE).all()


def test_revcomp_str_matches_reference_semantics():
    # reference: VStrains_Utilities.py:1015-1016
    assert revcomp_str("ACGT") == "ACGT"
    assert revcomp_str("AACCGT") == "ACGGTT"
    assert revcomp_str("A") == "T"


def test_revcomp_codes():
    codes = encode_seq("AACG")
    rc = revcomp_codes(codes)
    assert decode_codes(rc) == "CGTT"


def _brute_hash(seq: str, L: int):
    """Independent O(n*L) reference hash for cross-checking."""
    codes = encode_seq(seq)
    n = len(seq)
    out1, out2, val = [], [], []
    for w in range(n - L + 1):
        win = codes[w: w + L]
        ok = bool((win < 4).all())
        h1 = np.uint32(0)
        h2 = np.uint32(0)
        for c in win:
            cc = np.uint32((c if c < 4 else 0) + 1)
            h1 = np.uint32(h1 * HASH_MULT_1 + cc * 1)
            h2 = np.uint32(h2 * HASH_MULT_2 + cc * 1)
        out1.append(h1)
        out2.append(h2)
        val.append(ok)
    return (np.array(out1, np.uint32), np.array(out2, np.uint32),
            np.array(val, bool))


@pytest.mark.parametrize("L", [3, 7, 22])
def test_window_hashes_match_bruteforce(L):
    rng = np.random.RandomState(1)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    s = bases[rng.randint(0, 4, 100)].tobytes().decode()
    # sprinkle an N
    s = s[:40] + "N" + s[41:]
    h1, h2, valid = seq_window_hashes(s, L)
    b1, b2, bval = _brute_hash(s, L)
    np.testing.assert_array_equal(valid, bval)
    np.testing.assert_array_equal(h1[valid], b1[bval])
    np.testing.assert_array_equal(h2[valid], b2[bval])


def test_window_hash_distinct_seqs():
    h1a, _, _ = seq_window_hashes("ACGTACGTAC", 5)
    h1b, _, _ = seq_window_hashes("ACGTACGTAG", 5)
    # last windows differ
    assert h1a[-1] != h1b[-1]


def test_window_hash_short_seq():
    h1, h2, v = seq_window_hashes("ACG", 5)
    assert h1.size == 0 and v.size == 0


def test_revcomp_window_consistency():
    """hash(revcomp(window at offset)) == hash of rc-seq window at mirrored
    offset — the identity the kmer table build relies on."""
    s = "ACGTTTGCAGGTACCTA"
    L = 6
    codes = encode_seq(s)
    rc = revcomp_codes(codes)
    h_f, _, _ = window_hashes_np(codes, L)
    h_r, _, _ = window_hashes_np(rc, L)
    n = len(s)
    for off in range(n - L + 1):
        win_rc = revcomp_codes(codes[off: off + L])
        hh, _, _ = window_hashes_np(win_rc, L)
        assert hh[0] == h_r[n - L - off]
