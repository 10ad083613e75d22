"""Canonization property fuzz: random bidirected graphs must canonize into
a consistent single-orientation digraph, including the ambiguous
keep-both-twins ('t') case."""

import logging

import numpy as np
import pytest

from vstrains_tpu.core.canon import load_gfa_canonized
from vstrains_tpu.core.gfa import load_flipped_gfa, write_gfa
from vstrains_tpu.core.seq import revcomp_str

_LOG = logging.getLogger("canonfuzz")

_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _write_random_gfa(path, rng, n_nodes=8, n_links=12):
    names = [f"n{i}" for i in range(n_nodes)]
    seqs = {}
    lines = []
    for name in names:
        seq = _BASES[rng.randint(0, 4, 30)].tobytes().decode()
        seqs[name] = seq
        lines.append(f"S\t{name}\t{seq}\tDP:f:{float(rng.randint(10, 99))}")
    def flip(o):
        return "-" if o == "+" else "+"

    seen = set()
    classes = set()
    for _ in range(n_links):
        a, b = rng.choice(n_nodes, 2, replace=False)
        oa = "+-"[rng.randint(0, 2)]
        ob = "+-"[rng.randint(0, 2)]
        key = (names[a], oa, names[b], ob)
        if key in seen:
            continue
        seen.add(key)
        # (a,oa)->(b,ob) and (b,-ob)->(a,-oa) denote the same bidirected
        # edge; canonization merges them (one canonical direction)
        classes.add(min(key, (names[b], flip(ob), names[a], flip(oa))))
        lines.append(f"L\t{names[a]}\t{oa}\t{names[b]}\t{ob}\t3M")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return names, seqs, len(classes)


@pytest.mark.parametrize("seed", range(12))
def test_random_bidirected_graphs_canonize(tmp_path, seed):
    rng = np.random.RandomState(seed)
    p = tmp_path / "g.gfa"
    names, seqs, n_links = _write_random_gfa(str(p), rng)
    view = load_gfa_canonized(str(p), _LOG)

    # every original segment survives under exactly one of its identities
    # (or both for ambiguous picks)
    for name in names:
        plus = name in view.nodes
        minus = ("-" + name) in view.nodes
        assert plus or minus, f"segment {name} lost"
        if plus:
            assert view.nodes[name].seq in (seqs[name],
                                            seqs[name].lower())
        if minus:
            assert view.nodes["-" + name].seq == revcomp_str(seqs[name])

    # one canonical edge per bidirected-edge equivalence class
    assert len(view.edges) == n_links

    # every edge connects live nodes; write+reload round-trips
    for (u, w), e in view.edges.items():
        assert u in view.nodes and w in view.nodes
    out = tmp_path / "rt.gfa"
    write_gfa(view.compact(), str(out))
    rt = load_flipped_gfa(str(out))
    assert list(rt.nodes.keys()) == [v for v in view.compact().nodes]
    assert list(rt.edges.keys()) == list(view.compact().edges.keys())


def test_ambiguous_pick_keeps_both_twins(tmp_path):
    """A segment genuinely used in both orientations survives as X and -X
    (the reference's 't' pick, VStrains_IO.py:234-263)."""
    # an orientation-flipping 2-cycle: x+ -> y+ and y+ -> x-. Flipping x
    # rewires (y+, x-) to (x+, y-); y is then picked '+' and its reversal
    # sends the edge back onto x-, which x's '+' pick cannot clear — the
    # verification keeps both twins of x.
    p = tmp_path / "g.gfa"
    p.write_text(
        "S\tx\tAAAACC\tDP:f:90.0\n"
        "S\ty\tCCGGGG\tDP:f:80.0\n"
        "L\tx\t+\ty\t+\t2M\n"
        "L\ty\t+\tx\t-\t2M\n")
    view = load_gfa_canonized(str(p), _LOG)
    assert "x" in view.nodes and "-x" in view.nodes
    assert view.nodes["-x"].seq == revcomp_str("AAAACC")
