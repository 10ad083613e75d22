"""FASTQ loading: Python path semantics + native C++ path equivalence."""

import numpy as np
import pytest

from vstrains_tpu.core.fastq import load_read_pairs


def _write_fastq(path, seqs):
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n")


@pytest.fixture
def pair_files(tmp_path):
    fseqs = ["ACGTACGTACGT", "ACGNACGTACGT", "ACG", "TTTTGGGGCCCC",
             "ACGTACGTACGTACGT"]
    rseqs = ["TGCATGCATGCA", "ACGTACGTACGT", "ACGTACGTACGT", "CCGG",
             "GGGGTTTT"]
    fp = tmp_path / "r1.fastq"
    rp = tmp_path / "r2.fastq"
    _write_fastq(fp, fseqs)
    _write_fastq(rp, rseqs)
    return str(fp), str(rp)


def test_python_loader_filtering(pair_files):
    fp, rp = pair_files
    batch = load_read_pairs(fp, rp, split_len=6, use_native=False)
    # pair1 has N -> n_reads; pair2 fwd len 3 < 6 and pair3 rve len 4 < 6
    # -> short
    assert batch.n_reads == 1
    assert batch.short_reads == 2
    assert batch.used_reads == 2
    assert batch.fwd_len.tolist() == [12, 16]
    assert batch.rve_len.tolist() == [12, 8]
    # padding with BAD_CODE
    assert batch.rve_codes[1, 8:].max() == 255


def test_native_matches_python(pair_files):
    from vstrains_tpu.native import get_lib
    if get_lib() is None:
        pytest.skip("no native toolchain")
    fp, rp = pair_files
    py = load_read_pairs(fp, rp, split_len=6, use_native=False)
    nat = load_read_pairs(fp, rp, split_len=6, use_native=True)
    assert nat.n_reads == py.n_reads
    assert nat.short_reads == py.short_reads
    assert nat.used_reads == py.used_reads
    np.testing.assert_array_equal(nat.fwd_len, py.fwd_len)
    np.testing.assert_array_equal(nat.rve_len, py.rve_len)
    np.testing.assert_array_equal(nat.fwd_codes, py.fwd_codes)
    np.testing.assert_array_equal(nat.rve_codes, py.rve_codes)


def test_gzip_and_crlf_fastq(tmp_path):
    """Gzip-compressed and CRLF FASTQ load identically to plain LF files
    in both the Python and native loaders."""
    import gzip

    recs = [("ACGTACGTACGTACGT", "TTTTCCCCGGGGAAAA"),
            ("ACGTNCGTACGTACGT", "TTTTCCCCGGGGAAAA"),  # N pair
            ("ACG", "TTTTCCCCGGGGAAAA")]               # short pair
    plain_f = tmp_path / "r1.fastq"
    plain_r = tmp_path / "r2.fastq"
    for path, side in ((plain_f, 0), (plain_r, 1)):
        with open(path, "w") as fh:
            for i, pair in enumerate(recs):
                s = pair[side]
                fh.write(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n")
    gz_f = tmp_path / "r1.fastq.gz"
    crlf_r = tmp_path / "r2_crlf.fastq"
    with gzip.open(gz_f, "wb") as gz:
        gz.write(open(plain_f, "rb").read())
    with open(crlf_r, "wb") as fh:
        fh.write(open(plain_r, "rb").read().replace(b"\n", b"\r\n"))

    for use_native in (False, True):
        base = load_read_pairs(str(plain_f), str(plain_r), 8,
                               use_native=use_native)
        alt = load_read_pairs(str(gz_f), str(crlf_r), 8,
                              use_native=use_native)
        assert alt.n_reads == base.n_reads == 1
        assert alt.short_reads == base.short_reads == 1
        assert alt.used_reads == base.used_reads == 1
        np.testing.assert_array_equal(alt.fwd_codes, base.fwd_codes)
        np.testing.assert_array_equal(alt.rve_codes, base.rve_codes)
        np.testing.assert_array_equal(alt.fwd_len, base.fwd_len)
        np.testing.assert_array_equal(alt.rve_len, base.rve_len)
