from .pagerank import pagerank
from .cc import connected_components
from .lpa import label_propagation
from .triangles import triangle_counts, triangle_total
from .sssp import shortest_paths

__all__ = [
    "pagerank",
    "connected_components",
    "label_propagation",
    "triangle_counts",
    "triangle_total",
    "shortest_paths",
]
