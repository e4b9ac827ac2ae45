"""linkgraph — a PySpark-native link-graph analytics engine.

A from-scratch Spark rebuild of the query/data-processing capabilities
of sigmod/asterixdb-analytics (Pregelix): PageRank, connected
components, label propagation, triangle counting, SSSP — expressed as
co-partitioned DataFrame joins + groupBy aggregates over salted
CSR-style adjacency, with per-superstep checkpoints (lineage + metrics)
and resume. See SURVEY.md for the full reference mapping.
"""

from .session import get_spark
from .derive import derive_edges, derive_files, derive_graph, derive_repo_graph
from .partitioning import build_adjacency, symmetrize
from .checkpoint import CheckpointManager
from .algorithms import (
    connected_components,
    connected_components_hashmin,
    graph_sample,
    label_propagation,
    local_maximal_cliques,
    maximum_cliques,
    graph_summary,
    maximal_independent_set,
    node2vec_walks,
    pagerank,
    random_walks,
    reachability,
    shortest_paths,
    strongly_connected_components,
    common_neighbor_scores,
    clustering_coefficients,
    ktruss,
    closeness_centrality,
    effective_diameter,
    harmonic_centrality,
    neighborhood_function,
    transitivity,
    triangle_counts,
    triangle_total,
)
from .imru import batch_gradient_descent, imru_run, kmeans
from .vertex_program import VertexProgram, run_vertex_program
from .examples import (
    degree_weighted_pagerank,
    graph_mutation_program,
    graph_mutation_vp,
    early_termination_demo,
    hits,
    kcore,
    message_overflow_demo,
    pagerank_struct_demo,
    personalized_pagerank,
    pagerank_struct_program,
    shortest_paths_vp,
    sssp_program,
    token_circulation,
    token_ring_program,
    weighted_pagerank,
)
from .mutation import add_vertices, delete_edges_of, delete_vertices
from .sources import adjacency_text_graph, ring_graph, write_vertex_text
from .streaming import (
    degree_stream,
    document_stats_stream,
    events_hourly_stream,
    stream_edges,
    run_available_now,
    stream_documents,
    stream_events,
)

__all__ = [
    "get_spark",
    "derive_edges",
    "derive_files",
    "derive_graph",
    "derive_repo_graph",
    "build_adjacency",
    "symmetrize",
    "CheckpointManager",
    "pagerank",
    "connected_components",
    "connected_components_hashmin",
    "label_propagation",
    "common_neighbor_scores",
    "clustering_coefficients",
    "ktruss",
    "closeness_centrality",
    "effective_diameter",
    "harmonic_centrality",
    "neighborhood_function",
    "transitivity",
    "triangle_counts",
    "triangle_total",
    "shortest_paths",
    "strongly_connected_components",
    "reachability",
    "graph_sample",
    "graph_summary",
    "maximal_independent_set",
    "node2vec_walks",
    "random_walks",
    "local_maximal_cliques",
    "maximum_cliques",
    "VertexProgram",
    "run_vertex_program",
    "sssp_program",
    "shortest_paths_vp",
    "degree_weighted_pagerank",
    "personalized_pagerank",
    "weighted_pagerank",
    "hits",
    "kcore",
    "token_circulation",
    "token_ring_program",
    "early_termination_demo",
    "message_overflow_demo",
    "pagerank_struct_demo",
    "pagerank_struct_program",
    "imru_run",
    "kmeans",
    "batch_gradient_descent",
    "add_vertices",
    "delete_vertices",
    "delete_edges_of",
    "graph_mutation_program",
    "graph_mutation_vp",
    "adjacency_text_graph",
    "ring_graph",
    "write_vertex_text",
    "stream_documents",
    "stream_events",
    "stream_edges",
    "degree_stream",
    "document_stats_stream",
    "events_hourly_stream",
    "run_available_now",
]
