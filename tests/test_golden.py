"""Golden-file regression: byte-stable pipeline outputs on the pinned
synthetic 2-strain config (SURVEY.md section 4's golden-file strategy).

Regenerate deliberately (after auditing the diff) with the recipe in this
file's git history if an intentional semantic change lands.
"""

import logging
import os
from types import SimpleNamespace

import pytest

from vstrains_tpu import pipeline
from vstrains_tpu.evals.synth import make_dataset

_LOG = logging.getLogger("golden")
_GOLDEN = os.path.join(os.path.dirname(__file__), "data", "golden_2strain")


@pytest.mark.slow
def test_pipeline_outputs_byte_stable(tmp_path):
    ds = make_dataset(str(tmp_path / "data"), num_strains=2, num_bubbles=3,
                      pairs_per_strain=400, seed=11, contig_mode="full")
    out = tmp_path / "out"
    for sub in ["gfa", "tmp", "paf", "aln"]:
        os.makedirs(out / sub)
    args = SimpleNamespace(
        gfa_file=ds.gfa_path, path_file=ds.paths_path,
        fwd=ds.fwd_path, rve=ds.rve_path, output_dir=str(out),
        min_cov=None, min_len=250, dev=False, pe_batch_size=256,
        resume=False)
    pipeline.run(args, _LOG)

    pairs = [
        ("strain.fasta", out / "strain.fasta"),
        ("strain.paths", out / "strain.paths"),
        ("pe_info", out / "aln" / "pe_info"),
        ("st_info", out / "aln" / "st_info"),
        ("split_graph_final.gfa", out / "gfa" / "split_graph_final.gfa"),
    ]
    for name, produced in pairs:
        with open(os.path.join(_GOLDEN, name), "rb") as f:
            want = f.read()
        with open(produced, "rb") as f:
            got = f.read()
        assert got == want, f"{name} diverged from golden"
