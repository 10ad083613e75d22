"""End-to-end execution of the MetaQUAST wrapper against the strict
fake_metaquast fixture (VERDICT r4 ask #7): the wrapper's flag
construction, per-strain reference splitting, cleanup, and the CLI
entry all run for real instead of being path-checked."""

import os
import subprocess

import pytest

from vstrains_tpu.evals import quast

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FAKE = os.path.join(REPO, "tools", "fake_metaquast")


def _write_fasta(path, recs):
    with open(path, "w") as f:
        for name, seq in recs:
            f.write(f">{name}\n{seq}\n")
    return str(path)


@pytest.fixture
def dataset(tmp_path):
    truth = _write_fasta(tmp_path / "truth.fasta",
                         [("strainA.1 extra words", "ACGT" * 50),
                          ("strainB", "TTGG" * 50)])
    cand1 = _write_fasta(tmp_path / "ours.fasta",
                         [("A1", "ACGT" * 30), ("A2", "TTGG" * 30)])
    cand2 = _write_fasta(tmp_path / "theirs.fasta",
                         [("B1", "ACGT" * 25)])
    return truth, cand1, cand2


def test_quast_eval_runs_fixture(dataset, tmp_path, monkeypatch):
    truth, cand1, cand2 = dataset
    monkeypatch.chdir(tmp_path)  # sep_ref writes split refs into cwd
    out = tmp_path / "quast_out"
    quast.quast_eval([cand1, cand2], truth, str(out), FAKE, run_id=3)

    report = out / "combined_reference" / "report.tsv"
    assert report.is_file()
    header = report.read_text().splitlines()[0].split("\t")
    assert header == ["Assembly", "ours", "theirs"]
    # per-strain reference runs exist for both strains (name before the
    # first '.'/' ', quast_evaluation.py:19)
    runs = out / "runs_per_reference"
    assert sorted(os.listdir(runs)) == ["sub_3_strainA_ref",
                                       "sub_3_strainB_ref"]
    # the split per-strain refs are removed after the run
    assert not [p for p in os.listdir(tmp_path)
                if p.startswith("sub_3_") and p.endswith("_ref.fasta")]


def test_quast_cli_directory_mode(dataset, tmp_path, monkeypatch):
    truth, cand1, cand2 = dataset
    monkeypatch.chdir(tmp_path)
    out = tmp_path / "cli_out"
    rc = quast.main(["-quast", FAKE, "-d", str(tmp_path),
                     "-ref", truth, "-o", str(out)])
    assert rc == 0
    report = out / "combined_reference" / "report.tsv"
    # directory mode picks up every .fasta in the dir, sorted — the
    # truth file itself included (same behavior a real run would see)
    header = report.read_text().splitlines()[0].split("\t")
    assert header == ["Assembly", "ours", "theirs", "truth"]


def test_quast_cli_rejects_missing_inputs(tmp_path, dataset):
    truth, _, _ = dataset
    assert quast.main(["-quast", FAKE, "-ref", truth,
                       "-o", str(tmp_path / "x")]) == 1


def test_fixture_rejects_wrapper_contract_violations(dataset, tmp_path):
    """The fixture must actually police the argv contract — otherwise a
    wrapper regression would pass silently."""
    truth, cand1, _ = dataset
    r = subprocess.run([FAKE, "--unique-mapping", cand1,
                        "-o", str(tmp_path / "o"), "-R", truth],
                       capture_output=True, text=True)
    assert r.returncode == 2
    assert "missing required flag" in r.stderr


def test_quast_eval_cleans_refs_on_failure(dataset, tmp_path,
                                           monkeypatch):
    """Split refs are removed even when the binary fails (the wrapper's
    finally-cleanup), and the failure propagates."""
    truth, cand1, _ = dataset
    monkeypatch.chdir(tmp_path)
    missing = str(tmp_path / "nope.fasta")
    with pytest.raises(subprocess.CalledProcessError):
        quast.quast_eval([missing], truth, str(tmp_path / "o2"), FAKE,
                         run_id=9)
    assert not [p for p in os.listdir(tmp_path)
                if p.startswith("sub_9_")]
