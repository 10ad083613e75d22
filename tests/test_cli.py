"""CLI smoke tests: the end-to-end executable and the standalone PE CLI."""

import os

import pytest

from vstrains_tpu import cli, pe_cli
from vstrains_tpu.evals.synth import make_dataset


def test_cli_help_smoke(capsys):
    with pytest.raises(SystemExit) as e:
        cli.main(["-h"])
    assert e.value.code == 0
    assert "vstrains-tpu" in capsys.readouterr().out


def test_cli_full_run(tmp_path):
    ds = make_dataset(str(tmp_path / "data"), num_strains=2, num_bubbles=2,
                      pairs_per_strain=200, seed=13)
    out = tmp_path / "out"
    rc = cli.main(["-a", "spades", "-g", ds.gfa_path, "-p", ds.paths_path,
                   "-fwd", ds.fwd_path, "-rve", ds.rve_path,
                   "-o", str(out), "--pe-batch-size", "256"])
    assert rc == 0
    assert (out / "strain.fasta").exists()
    assert (out / "strain.paths").exists()
    assert (out / "vstrains.log").exists()
    assert (out / "timings.json").exists()


def test_cli_refuses_nonempty_output(tmp_path):
    ds = make_dataset(str(tmp_path / "data"), num_strains=2, num_bubbles=2,
                      pairs_per_strain=50, seed=13)
    out = tmp_path / "out"
    os.makedirs(out / "gfa")
    rc = cli.main(["-a", "spades", "-g", ds.gfa_path, "-p", ds.paths_path,
                   "-fwd", ds.fwd_path, "-rve", ds.rve_path,
                   "-o", str(out)])
    assert rc == 1


def test_pe_cli_parity_with_pipeline(tmp_path):
    """The standalone PE CLI reproduces the reference child-process
    contract: same pe_info/st_info files as the in-process engine."""
    ds = make_dataset(str(tmp_path / "data"), num_strains=2, num_bubbles=2,
                      pairs_per_strain=100, seed=19)
    # canonized single-orientation graph for the CLI
    from vstrains_tpu.core.canon import load_gfa_canonized
    from vstrains_tpu.core.gfa import write_gfa
    import logging
    view = load_gfa_canonized(ds.gfa_path, logging.getLogger("t"))
    gfa = tmp_path / "canon.gfa"
    write_gfa(view.compact(), str(gfa))

    out = tmp_path / "aln"
    rc = pe_cli.main(["-g", str(gfa), "-o", str(out), "-f", ds.fwd_path,
                      "-r", ds.rve_path, "-k", str(ds.k),
                      "--batch-size", "128"])
    assert rc == 0

    # equivalent in-process run
    from vstrains_tpu.core.fastq import load_read_pairs
    from vstrains_tpu.ops.pe_infer import infer_pe_links, write_pe_files
    ids = list(view.compact().nodes.keys())
    seqs = [view.compact().nodes[i].seq for i in ids]
    reads = load_read_pairs(ds.fwd_path, ds.rve_path, ds.k + 1)
    res = infer_pe_links(ids, seqs, reads, ds.k, batch_size=64)
    write_pe_files(res, str(tmp_path / "pe_ref"), str(tmp_path / "st_ref"))
    assert (out / "pe_info").read_bytes() == \
        (tmp_path / "pe_ref").read_bytes()
    assert (out / "st_info").read_bytes() == \
        (tmp_path / "st_ref").read_bytes()


def test_cli_clean_error_on_bad_gfa(tmp_path, caplog):
    ds = make_dataset(str(tmp_path / "data"), num_strains=2, num_bubbles=2,
                      pairs_per_strain=20, seed=13)
    bad = tmp_path / "bad.gfa"
    bad.write_text("S\tx\tACGT\tDP:f:5.0\n")  # no edges -> invalid ksize
    out = tmp_path / "outx"
    rc = cli.main(["-a", "spades", "-g", str(bad), "-p", ds.paths_path,
                   "-fwd", ds.fwd_path, "-rve", ds.rve_path,
                   "-o", str(out)])
    assert rc == 1
