"""SPAdes .paths parser A/B (C8): our parser vs the actual reference's
`spades_paths_parser` on a dataset extended with edge cases the
full-pipeline A/B never hits — gapped (multi-subpath) records, a
reverse-orientation-preferred record, sub-min-length and low-coverage
filters, and repeated-node multiplicities."""

import logging
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
_LOG = logging.getLogger("paths_ab")


@pytest.mark.skipif(not os.path.exists(f"{REFERENCE}/vstrains"),
                    reason="reference not mounted")
def test_paths_parser_matches_reference(tmp_path):
    sys.path.insert(0, f"{REPO}/shims")
    sys.path.insert(0, REFERENCE)
    try:
        from utils.VStrains_IO import (flipped_gfa_to_graph, gfa_to_graph,
                                       graph_to_gfa)
        from utils.VStrains_IO import \
            spades_paths_parser as ref_paths_parser
        from utils.VStrains_Preprocess import reindexing as ref_reindexing
    finally:
        sys.path.remove(f"{REPO}/shims")
        sys.path.remove(REFERENCE)

    from vstrains_tpu.algos.preprocess import reindexing
    from vstrains_tpu.core.canon import load_gfa_canonized
    from vstrains_tpu.core.contig_io import spades_paths_parser
    from vstrains_tpu.evals.synth import make_dataset

    ds = make_dataset(str(tmp_path / "data"), num_strains=3,
                      num_bubbles=3, pairs_per_strain=10,
                      abundances=(40.0, 70.0, 100.0),
                      contig_mode="split", error_rate=0.0, seed=7)
    # crafted extras (synth node names are '1'..'16': anchors 1-4,
    # variants 5..13; all edges anchor->variant->anchor)
    with open(ds.paths_path, "a") as f:
        # gapped record: two subpaths across the first and last bubbles
        f.write("NODE_90_length_700_cov_55.0\n")
        f.write("1+,5+;\n12+,4+\n")
        f.write("NODE_90_length_700_cov_55.0'\n")
        f.write("4-,12-;\n5-,1-\n")
        # reverse-preferred record: forward row is garbage node ids, the
        # reverse row maps fully
        f.write("NODE_91_length_400_cov_22.0\n")
        f.write("77+,88+\n")
        f.write("NODE_91_length_400_cov_22.0'\n")
        f.write("2-,6-\n")
        # single long node (kept) and short low-cov node (filtered)
        f.write("NODE_92_length_400_cov_80.0\n2+\n")
        f.write("NODE_92_length_400_cov_80.0'\n2-\n")
        f.write("NODE_93_length_30_cov_1.0\n5+\n")
        f.write("NODE_93_length_30_cov_1.0'\n5-\n")
        # repeated node -> repeat multiplicity bookkeeping
        f.write("NODE_94_length_600_cov_33.0\n2+,6+,2+\n")
        f.write("NODE_94_length_600_cov_33.0'\n2-,6-,2-\n")

    # reference preamble: parse -> flip -> write -> reload -> reindex
    g0, nd0, ed0 = gfa_to_graph(ds.gfa_path, _LOG)
    l0 = str(tmp_path / "ref_L0.gfa")
    graph_to_gfa(g0, nd0, ed0, _LOG, l0)
    g1, nd1, ed1 = flipped_gfa_to_graph(l0, _LOG)
    g1, nd1, ed1, ref_idx = ref_reindexing(g1, nd1, ed1)
    ref_contigs, ref_info = ref_paths_parser(
        g1, nd1, ed1, ref_idx, _LOG, ds.paths_path, min_len=250,
        min_cov=10.0)

    # our preamble mirrors pipeline stage 1
    view = load_gfa_canonized(ds.gfa_path, _LOG)
    view0 = view.compact()
    view0, idx_mapping = reindexing(view0)
    ours_contigs, ours_info = spades_paths_parser(
        view0, idx_mapping, ds.paths_path, min_len=250, min_cov=10.0)

    assert set(ours_contigs) == set(ref_contigs)
    for cno, (path, clen, ccov) in ref_contigs.items():
        opath, olen, ocov = ours_contigs[cno]
        assert opath == path, f"contig {cno}: {opath} != {path}"
        assert olen == clen and ocov == ccov
    # repeat bookkeeping: same multiplicity maps
    assert set(ours_info) == set(ref_info)
    for cno in ref_info:
        assert tuple(ours_info[cno][1].items()) == tuple(
            ref_info[cno][1].items()), cno
