from graphscope_ray.stages.ingest import with_sha256, lineage
from graphscope_ray.stages.mine import (
    ImportMiner,
    mine_imports,
    build_exports,
    resolve_edges,
    resolve_edges_join,
)

__all__ = [
    "with_sha256",
    "lineage",
    "ImportMiner",
    "mine_imports",
    "build_exports",
    "resolve_edges",
    "resolve_edges_join",
]
