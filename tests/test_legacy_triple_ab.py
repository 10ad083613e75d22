"""Triple A/B for C12: the reference's LEGACY v1.0 aligner pipeline
(VStrains_Alignment.py, driven by the exact-match PAF emitter — its
nm==0 full-length filter makes the emitter semantically complete), the
reference's v1.1 hash script, and our engine must all produce
byte-identical aln/pe_info + aln/st_info on the same inputs."""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(f"{REFERENCE}/vstrains"),
                    reason="reference not mounted")
def test_reference_v10_v11_and_ours_byte_identical(tmp_path):
    from vstrains_tpu.evals.synth import make_dataset

    ds = make_dataset(str(tmp_path / "data"), num_strains=3,
                      num_bubbles=3, pairs_per_strain=200,
                      abundances=(40.0, 70.0, 100.0),
                      contig_mode="split", error_rate=0.002, seed=9)
    k = 21

    bindir = tmp_path / "bin"
    os.makedirs(bindir)
    if not shutil.which("minimap2"):
        shutil.copy(os.path.join(REPO, "tools", "fake_minimap2"),
                    bindir / "minimap2")
        os.chmod(bindir / "minimap2", 0o755)
    env = dict(os.environ)
    env["PATH"] = f"{bindir}:{env['PATH']}"

    outs = {}
    for name, cmd in (
        ("v10", [sys.executable,
                 f"{REFERENCE}/utils/VStrains_Alignment.py"]),
        ("v11", [sys.executable,
                 f"{REFERENCE}/utils/VStrains_PE_Inference.py"]),
        ("ours", [sys.executable, "-m", "vstrains_tpu.pe_cli"]),
    ):
        out = str(tmp_path / f"aln_{name}")
        r = subprocess.run(
            cmd + ["-g", ds.gfa_path, "-o", out, "-f", ds.fwd_path,
                   "-r", ds.rve_path, "-k", str(k)],
            env=env, cwd=REPO, capture_output=True, text=True,
            timeout=600)
        assert r.returncode == 0, f"{name}: {r.stderr[-800:]}"
        outs[name] = out

    for f in ("pe_info", "st_info"):
        a = open(f"{outs['v10']}/{f}", "rb").read()
        b = open(f"{outs['v11']}/{f}", "rb").read()
        c = open(f"{outs['ours']}/{f}", "rb").read()
        assert a == b, f"{f}: reference v1.0 != v1.1"
        assert b == c, f"{f}: ours != reference"
