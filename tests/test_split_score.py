"""Dev-mode per-split scoring: Correct / False-Positive / Error labels
against reference strains (parity: reference Decomposition:209-251,
362-416, 509-529)."""

import numpy as np

from vstrains_tpu.core.graph import new_view
from vstrains_tpu.evals.refmap import SplitScorer


def _rand_seq(rng, n):
    return np.frombuffer(b"ACGT", dtype=np.uint8)[
        rng.randint(0, 4, n)].tobytes().decode()


def _build_branch(tmp_path, rng, junk_u2=False):
    """2-in/2-out branch `b`: strainA = u1-b-w1, strainB = u2-b-w2.
    With junk_u2, u2's sequence appears in no strain (graph-error node)."""
    u1, u2, b, w1, w2 = (_rand_seq(rng, 80) for _ in range(5))
    strain_a = u1 + b + w1
    strain_b = u2 + b + w2
    ref = tmp_path / "refs.fasta"
    ref.write_text(f">A\n{strain_a}\n>B\n{strain_b}\n")

    view = new_view()
    seqs = {"u1": u1, "u2": _rand_seq(rng, 80) if junk_u2 else u2,
            "b": b, "w1": w1, "w2": w2}
    verts = {vid: view.add_vertex(vid, 50.0, s)
             for vid, s in seqs.items()}
    for uid in ("u1", "u2"):
        view.add_edge(verts[uid], verts["b"], 0, 50.0)
    for wid in ("w1", "w2"):
        view.add_edge(verts["b"], verts[wid], 0, 50.0)
    return view, str(ref)


def test_split_scorer_correct_and_error(tmp_path):
    rng = np.random.RandomState(3)
    view, ref = _build_branch(tmp_path, rng)
    scorer = SplitScorer(ref, out_dir=str(tmp_path))
    # the right split plus one wrong link
    scorer.score_branch(view, "b", ["u1", "u2"], ["w1", "w2"],
                        {("u1", "w1"): (50.0, 12),
                         ("u2", "w2"): (50.0, 9),
                         ("u1", "w2"): (50.0, 1)})
    assert scorer.counts == {"correct": 2, "false_positive": 0,
                             "error": 1}
    assert scorer.plot_pass()
    assert (tmp_path / "split_scatter_1.png").exists()
    # buffers reset: a second pass with no decisions plots nothing
    assert not scorer.plot_pass()


def test_split_scorer_false_positive_on_graph_error(tmp_path):
    """A kept link touching a node that matches no strain perfectly is a
    graph error, not a splitter error -> False-Positive."""
    rng = np.random.RandomState(7)
    view, ref = _build_branch(tmp_path, rng, junk_u2=True)
    scorer = SplitScorer(ref, out_dir=None)
    scorer.score_branch(view, "b", ["u1", "u2"], ["w1", "w2"],
                        {("u1", "w1"): (50.0, 12),
                         ("u2", "w2"): (50.0, 9)})
    assert scorer.counts["correct"] == 1
    assert scorer.counts["false_positive"] == 1
    assert scorer.counts["error"] == 0


def test_balance_split_with_scorer_labels_synthetic(tmp_path, caplog):
    """End-to-end: balance_split on a clean 2-strain bubble dataset under
    a scorer labels every decision Correct."""
    import logging
    from types import SimpleNamespace

    from vstrains_tpu import pipeline
    from vstrains_tpu.evals.synth import make_dataset

    import os
    ds = make_dataset(str(tmp_path / "data"), num_strains=2,
                      num_bubbles=2, pairs_per_strain=300, seed=33)
    ref_fa = tmp_path / "refs.fasta"
    with open(ref_fa, "w") as f:
        for i, hap in enumerate(ds.true_haplotypes):
            f.write(f">strain{i}\n{hap}\n")
    out = tmp_path / "out"
    for sub in ["gfa", "tmp", "paf", "aln"]:
        os.makedirs(out / sub)
    args = SimpleNamespace(
        gfa_file=ds.gfa_path, path_file=ds.paths_path,
        fwd=ds.fwd_path, rve=ds.rve_path, output_dir=str(out),
        min_cov=None, min_len=250, dev=True, pe_batch_size=256,
        resume=False, ref_file=str(ref_fa))
    with caplog.at_level(logging.INFO, logger="split-score-e2e"):
        pipeline.run(args, logging.getLogger("split-score-e2e"))
    score_lines = [r.message % r.args if r.args else r.message
                   for r in caplog.records
                   if "split decisions vs reference" in r.message]
    assert score_lines, "scorer summary not logged"
    assert "'error': 0" in score_lines[0]
    assert "'correct':" in score_lines[0]
    import glob
    assert glob.glob(str(out / "tmp" / "split_scatter_*.png"))
