"""graphscope_ray — a Ray-Data-native link-graph analytics engine.

A from-scratch reimplementation of the capabilities of GraphScope's GRAPE
analytical engine (reference: /root/reference, zhanglei1949/GraphScope) built
on ray.data Datasets, Arrow batches and Ray actor pools:

- ``sources``   : deterministic synthetic repo-corpus generator + readers
- ``stages``    : ingestion (sha256 lineage) and import-mining stages
- ``graph``     : partitioned fragment actors + PIE-style superstep driver
                  and the analytical apps (PageRank, WCC, CDLP, triangles,
                  SSSP, BFS, HITS, k-core, LCC, degree/eigenvector/Katz)
- ``functions`` : training-data ops (dedup family, similarity search,
                  text analysis, multimodal stubs)
- ``pipelines`` : end-to-end pipelines over the repo corpus and the
                  driver-provided testdata tables

Nothing in this package calls ``ray.init``/``ray.shutdown``; sessions are
owned by the caller (tests, bench.py, the driver).
"""

__version__ = "0.1.0"
