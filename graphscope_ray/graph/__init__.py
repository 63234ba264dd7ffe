"""Partitioned link-graph engine: fragments, supersteps, analytical apps.

Model (mirrors GRAPE's fragment/PIE design, re-expressed for Ray):

- vertices get dense int64 vids ``0..N-1``; partition ``p = vid % P``,
  local index ``l = vid // P`` (the analogue of the reference's gid =
  (fid, offset) packing, ``arrow_projected_vertex_map.h:110-155``, without
  bit packing).
- each of the P ``FragmentActor``s owns the out-edges of its vertices
  (edge-cut by source, so out-degree is locally exact) as a CSR over
  numpy arrays, plus precomputed per-target-partition message indexes.
- algorithms run as BSP supersteps: scatter (per-edge values, pre-combined
  per destination partition — GRAPE's message combiner), object-store
  message exchange, gather/apply, driver-side reduction of global scalars
  (residual, dangling mass) — the PIE PEval/IncEval loop
  (``grape_instance.cc:314-347``, ``programming_model_pie.md``).
"""

from graphscope_ray.graph.build import Graph, build_graph, build_graph_from_oids
from graphscope_ray.graph import algorithms

__all__ = ["Graph", "build_graph", "build_graph_from_oids", "algorithms"]
