"""Sparse aln/pe_info writer (--pe-files) — docs/DIVERGENCES.md #13.

The reference writes all N^2 `u:v:count` lines (PE_Inference.py:190-207)
but its loader initializes every pair to 0 first (VStrains_IO.py:598-627),
so nonzero-only files must load to bit-identical dicts.
"""

import numpy as np

from vstrains_tpu.ops.pe_infer import (PEResult, PESparseResult,
                                       process_pe_info, write_pe_files,
                                       write_pe_files_sparse)


def _dense_result(n=7, seed=5):
    rng = np.random.RandomState(seed)
    node = rng.randint(0, 4, size=(n, n)).astype(np.int64)
    short = rng.randint(0, 3, size=(n, n)).astype(np.int64)
    node[node < 2] = 0   # plenty of zeros
    short[short < 2] = 0
    ids = [f"n{i}" for i in range(n)]
    return PEResult(ids, node, short, 100, 1, 99)


def _to_sparse(res):
    n = len(res.ids)
    def coo(mat):
        us, vs = np.nonzero(mat)
        keys = (us.astype(np.int64) * n + vs).astype(np.int64)
        order = np.argsort(keys)
        return keys[order], mat[us, vs][order]
    pk, pc = coo(res.node_mat)
    sk, sc = coo(res.short_mat)
    return PESparseResult(res.ids, pk, pc, sk, sc, res.n_reads,
                          res.short_reads, res.used_reads)


def test_sparse_files_load_identically(tmp_path):
    res = _dense_result()
    full_pe, full_st = str(tmp_path / "pe_f"), str(tmp_path / "st_f")
    sp_pe, sp_st = str(tmp_path / "pe_s"), str(tmp_path / "st_s")
    write_pe_files(res, full_pe, full_st)
    write_pe_files_sparse(res, sp_pe, sp_st)

    got_full = process_pe_info(res.ids, full_pe, full_st)
    got_sparse = process_pe_info(res.ids, sp_pe, sp_st)
    assert got_full == got_sparse

    # sparse lines are exactly the full file minus its zero lines
    keep = [ln for ln in open(full_pe) if not ln.rstrip().endswith(":0")]
    assert keep == list(open(sp_pe))
    keep = [ln for ln in open(full_st) if not ln.rstrip().endswith(":0")]
    assert keep == list(open(sp_st))


def test_sparse_writer_coo_input(tmp_path):
    res = _dense_result(seed=11)
    sp = _to_sparse(res)
    a_pe, a_st = str(tmp_path / "a_pe"), str(tmp_path / "a_st")
    b_pe, b_st = str(tmp_path / "b_pe"), str(tmp_path / "b_st")
    write_pe_files_sparse(res, a_pe, a_st)
    write_pe_files_sparse(sp, b_pe, b_st)
    assert open(a_pe).read() == open(b_pe).read()
    assert open(a_st).read() == open(b_st).read()
