"""Graph invariant sanitizer."""

import pytest

from vstrains_tpu.core.graph import new_view
from vstrains_tpu.utils.validate import GraphInvariantError, validate_view


def _ok_view():
    v = new_view()
    a = v.add_vertex("a", 10.0, "AAAA")
    b = v.add_vertex("b", 20.0, "CCCC")
    v.add_edge(a, b, 2)
    return v


def test_validate_clean_view():
    validate_view(_ok_view(), "test")


def test_validate_detects_gray_live_node():
    v = _ok_view()
    v.nodes["a"].color = "gray"
    with pytest.raises(GraphInvariantError):
        validate_view(v, "test")


def test_validate_detects_dangling_edge():
    v = _ok_view()
    v.nodes.pop("b")  # edge (a,b) now touches a dead node
    with pytest.raises(GraphInvariantError):
        validate_view(v, "test")


def test_validate_detects_mismatched_key():
    v = _ok_view()
    v.nodes["zz"] = v.nodes.pop("a")
    with pytest.raises(GraphInvariantError):
        validate_view(v, "test")
