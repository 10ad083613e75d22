"""graph_tool.all facade of the shim (the reference imports Graph from
here)."""

from . import Edge, Graph, PropertyMap, Vertex  # noqa: F401
from .draw import graph_draw  # noqa: F401
from .topology import all_circuits  # noqa: F401
