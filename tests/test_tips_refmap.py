"""Tip removal + reference-mapping eval components."""

import logging

import pytest

from vstrains_tpu.algos.tips import kmer_containment, tip_removal_s
from vstrains_tpu.core.graph import new_view
from vstrains_tpu.evals.refmap import (load_fasta, map_ref_to_graph,
                                       strain_accuracy)
from vstrains_tpu.core.seq import revcomp_str

_LOG = logging.getLogger("tips")


def test_kmer_containment_scores():
    s = ("ACGTACGGTTACGATCGATCGGCTAGCTAACCGGTTACGATGCAGCTAGCTA"
         "GGATCCTTAACCGG")
    assert kmer_containment(s, s) == 1.0
    assert kmer_containment(s, "prefix" + s + "suffix") == 1.0
    # reverse complement also matches
    assert kmer_containment(s, revcomp_str(s)) == 1.0
    # a mutation in the middle lowers the score below the 0.99 gate
    mut = s[:30] + ("A" if s[30] != "A" else "C") + s[31:]
    assert kmer_containment(mut, s) < 0.99
    # unrelated sequence scores ~0
    assert kmer_containment(s, "TTTT" * 30) < 0.1


def test_tip_removal_on_cyclic_graph():
    # cycle a->b->c->a with a tip t -> b where t duplicates a's sequence
    v = new_view()
    seq_a = "ACGTACGGTTACGATCGATCGGCTAGCTAACCGGTT"
    a = v.add_vertex("a", 50.0, seq_a)
    b = v.add_vertex("b", 50.0, "TTAACCGGTTACGATGCAGCTAGCTAGGATCCTTAA")
    c = v.add_vertex("c", 50.0, "AAGGATCCTTAACCGGACGTACGGTTACGATCGACG")
    t = v.add_vertex("t", 5.0, seq_a)  # spurious tip, same seq as a
    v.add_edge(a, b, 2)
    v.add_edge(b, c, 2)
    v.add_edge(c, a, 2)
    v.add_edge(t, b, 2)
    contig_dict = {"1": [["t", "b"], 10, 5.0]}
    tip_removal_s(v, contig_dict, _LOG)
    assert "t" not in v.nodes
    # a absorbed the tip's depth
    assert v.nodes["a"].dp == 55.0
    # contig through the removed tip was split
    assert "1" not in contig_dict
    assert contig_dict["1^0"][0] == ["b"]


def test_map_ref_to_graph_exact_substring(tmp_path):
    ref = tmp_path / "ref.fasta"
    hap1 = "ACGTACGGTTACGATCGATCGGCTAGCTAACCGGTTAAGGATCC"
    hap2 = "TTGCACGGTTACGATCGTACGGCTAGCTAACCGGCCAAGGATGG"
    ref.write_text(f">s1\n{hap1}\n>s2\n{hap2}\n")
    v = new_view()
    v.add_vertex("n1", 10.0, hap1[5:25])
    v.add_vertex("n2", 10.0, revcomp_str(hap2[10:30]))
    v.add_vertex("n3", 10.0, "T" * 20)
    m = map_ref_to_graph(str(ref), v, _LOG)
    assert m["s1"] == ["n1"]
    assert m["s2"] == ["n2"]


def test_strain_accuracy(tmp_path):
    ref = tmp_path / "ref.fasta"
    hap = ("ACGTACGGTTACGATCGATCGGCTAGCTAACCGGTTAAGGATCCGGCCTTAA"
           "GCGCGATATCGCGAT")
    ref.write_text(f">s1\n{hap}\n")
    v = new_view()
    v.add_vertex("x", 10.0, hap)
    out = strain_accuracy({"A1": [["x"], len(hap), 10.0]}, v, str(ref),
                          _LOG)
    assert out == [("A1", "s1", 1.0)]


def test_dot_export(tmp_path):
    from vstrains_tpu.evals.graphviz import write_dot
    v = new_view()
    a = v.add_vertex("a&b", 10.0, "ACGT")
    c = v.add_vertex("c*0", 20.0, "TTTT")
    v.add_edge(a, c, 2, flow=12.5)
    p = tmp_path / "g.dot"
    write_dot(v, str(p))
    text = p.read_text()
    assert '"a&b" -> "c*0"' in text
    assert "digraph assembly" in text
