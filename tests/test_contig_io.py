"""SPAdes paths parsing against the synthetic dataset generator."""

import logging

from vstrains_tpu.algos.preprocess import reindexing
from vstrains_tpu.core.canon import load_gfa_canonized
from vstrains_tpu.core.contig_io import spades_paths_parser
from vstrains_tpu.evals.synth import make_dataset

_LOG = logging.getLogger("test")


def test_paths_parser_on_synth(tmp_path):
    ds = make_dataset(str(tmp_path), num_strains=2, num_bubbles=2,
                      pairs_per_strain=10, seed=3)
    view = load_gfa_canonized(ds.gfa_path, _LOG)
    view0 = view.compact()
    view0, idx_mapping = reindexing(view0)
    contig_dict, contig_info = spades_paths_parser(
        view0, idx_mapping, ds.paths_path, min_len=250, min_cov=0,
        logger=_LOG)
    # one contig per strain, each mapped through idx ids onto live edges
    assert len(contig_dict) == 2
    for cno, (contig, clen, ccov) in contig_dict.items():
        assert len(contig) == 5  # anchor,var,anchor,var,anchor
        for i in range(len(contig) - 1):
            assert (contig[i], contig[i + 1]) in view0.edges
        assert cno in contig_info


def test_paths_parser_reverse_record_preferred_when_forward_invalid(
        tmp_path):
    """If the forward path references unknown nodes, the reverse-prime
    record (if valid) wins."""
    gfa = tmp_path / "g.gfa"
    gfa.write_text(
        "S\t1\tAAAACC\tDP:f:50.0\n"
        "S\t2\tCCGGGG\tDP:f:40.0\n"
        "L\t1\t+\t2\t+\t2M\n")
    view = load_gfa_canonized(str(gfa), _LOG)
    view0 = view.compact()
    view0, idx_mapping = reindexing(view0)
    paths = tmp_path / "contigs.paths"
    paths.write_text(
        "NODE_1_length_10_cov_44.0\n"
        "9+,8+\n"
        "NODE_1_length_10_cov_44.0'\n"
        "1+,2+\n")
    contig_dict, _ = spades_paths_parser(view0, idx_mapping, str(paths),
                                         logger=_LOG)
    assert len(contig_dict) == 1
    [(cno, (contig, clen, ccov))] = contig_dict.items()
    assert contig == [idx_mapping["1"], idx_mapping["2"]]


def test_paths_parser_gapped_subpaths(tmp_path):
    """SPAdes gapped contigs: ';'-terminated sub-path lines become separate
    `cno$i` contigs (VStrains_IO.py:412-442, 493-499)."""
    gfa = tmp_path / "g.gfa"
    gfa.write_text(
        "S\t1\tAAAACC\tDP:f:50.0\n"
        "S\t2\tCCGGGG\tDP:f:40.0\n"
        "S\t3\tGGTTTT\tDP:f:30.0\n"
        "S\t4\tTTACAC\tDP:f:20.0\n"
        "L\t1\t+\t2\t+\t2M\n"
        "L\t3\t+\t4\t+\t2M\n")
    view = load_gfa_canonized(str(gfa), _LOG)
    view0 = view.compact()
    view0, idx_mapping = reindexing(view0)
    paths = tmp_path / "contigs.paths"
    paths.write_text(
        "NODE_1_length_20_cov_44.0\n"
        "1+,2+;\n"
        "3+,4+\n"
        "NODE_1_length_20_cov_44.0'\n"
        "4-,3-;\n"
        "2-,1-\n")
    contig_dict, contig_info = spades_paths_parser(
        view0, idx_mapping, str(paths), logger=_LOG)
    assert set(contig_dict.keys()) == {"1$0", "1$1"}
    assert contig_dict["1$0"][0] == [idx_mapping["1"], idx_mapping["2"]]
    assert contig_dict["1$1"][0] == [idx_mapping["3"], idx_mapping["4"]]
    assert "1$0" in contig_info and "1$1" in contig_info


def test_paths_parser_repeat_multiplicity(tmp_path):
    """A contig revisiting a node records its repeat count and stores the
    deduplicated path (VStrains_IO.py:484-502)."""
    gfa = tmp_path / "g.gfa"
    gfa.write_text(
        "S\t1\tAAAACC\tDP:f:50.0\n"
        "S\t2\tCCGGGG\tDP:f:40.0\n"
        "L\t1\t+\t2\t+\t2M\n"
        "L\t2\t+\t1\t+\t2M\n")
    view = load_gfa_canonized(str(gfa), _LOG)
    view0 = view.compact()
    view0, idx_mapping = reindexing(view0)
    paths = tmp_path / "contigs.paths"
    paths.write_text(
        "NODE_1_length_20_cov_44.0\n"
        "1+,2+,1+\n"
        "NODE_1_length_20_cov_44.0'\n"
        "1-,2-,1-\n")
    contig_dict, contig_info = spades_paths_parser(
        view0, idx_mapping, str(paths), logger=_LOG)
    [(cno, (contig, _, _))] = contig_dict.items()
    assert contig == [idx_mapping["1"], idx_mapping["2"]]  # deduped
    _, repeat = contig_info[cno]
    assert repeat[idx_mapping["1"]] == 2
    assert repeat[idx_mapping["2"]] == 1


def test_strain_paths_renders_minus_orientation(tmp_path):
    """keep_original mode maps ids back through reindexing and renders a
    '-X' original as 'X-' (VStrains_IO.py:577-584)."""
    from vstrains_tpu.core.contig_io import contig_dict_to_path
    # idx_mapping: canonized original id -> dense idx
    idx_mapping = {"7": "0", "-9": "1"}
    strain_dict = {"A1": [["0", "1*0", "0&1"], 100, 50.0]}
    out = tmp_path / "strain.paths"
    contig_dict_to_path(strain_dict, str(out), idx_mapping, True)
    text = out.read_text()
    assert "NODE_A1_100_50.0" in text
    # 0 -> orig 7 ; 1*0 -> 1 -> orig -9 -> rendered 9- ; 0&1 -> 7,9-
    assert "7,9-,7,9-" in text
