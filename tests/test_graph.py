"""GraphView substrate: ordering, mutation, compaction semantics."""

import numpy as np

from vstrains_tpu.core.graph import BLACK, GRAY, new_view


def _tiny_view():
    v = new_view()
    a = v.add_vertex("a", 10.0, "AAAA")
    b = v.add_vertex("b", 20.0, "CCCC")
    c = v.add_vertex("c", 30.0, "GGGG")
    v.add_edge(a, b, overlap=2)
    v.add_edge(b, c, overlap=2)
    v.add_edge(a, c, overlap=2)
    return v


def test_adjacency_order_out_then_in():
    v = _tiny_view()
    a = v.nodes["a"]
    c = v.nodes["c"]
    assert [e.target.vid for e in a.out_edges()] == ["b", "c"]
    assert [n.vid for n in c.all_neighbors()] == ["b", "a"]  # out then in
    assert [e.source.vid for e in c.in_edges()] == ["b", "a"]


def test_remove_edge_physical():
    v = _tiny_view()
    e = v.edges[("a", "c")]
    v.graph.remove_edge(e)
    a = v.nodes["a"]
    assert [x.target.vid for x in a.out_edges()] == ["b"]
    assert v.graph.num_edges() == 2


def test_compact_drops_gray_and_preserves_order():
    v = _tiny_view()
    v.remove_vertex("b")  # grays b, stays in graph storage
    assert v.nodes.keys() == {"a", "c"}
    assert v.graph.num_vertices() == 3
    c = v.compact()
    assert list(c.nodes.keys()) == ["a", "c"]
    # edges touching b are dropped; (a,c) survives
    assert list(c.edges.keys()) == [("a", "c")]
    assert c.graph.num_vertices() == 2


def test_compact_matches_write_reload(tmp_path):
    """compact() must equal the reference's write-GFA-then-reload cycle."""
    from vstrains_tpu.core.gfa import load_flipped_gfa, write_gfa
    v = _tiny_view()
    v.remove_vertex("b")
    p = str(tmp_path / "g.gfa")
    write_gfa(v, p)
    reloaded = load_flipped_gfa(p)
    compacted = v.compact()
    assert list(reloaded.nodes.keys()) == list(compacted.nodes.keys())
    assert list(reloaded.edges.keys()) == list(compacted.edges.keys())
    for vid in reloaded.nodes:
        assert reloaded.nodes[vid].dp == compacted.nodes[vid].dp
        assert reloaded.nodes[vid].seq == compacted.nodes[vid].seq


def test_tensors_view():
    v = _tiny_view()
    t = v.tensors()
    assert t.ids == ["a", "b", "c"]
    np.testing.assert_array_equal(t.dp, [10.0, 20.0, 30.0])
    np.testing.assert_array_equal(t.edge_src, [0, 1, 0])
    np.testing.assert_array_equal(t.edge_dst, [1, 2, 2])


def test_vertex_ordering_operator():
    v = _tiny_view()
    assert v.nodes["a"] < v.nodes["b"] < v.nodes["c"]
