"""Graph build (partition routing → FragmentActors) and the superstep driver.

Build mirrors the reference's CREATE_GRAPH path (`dag_utils.py:114-231` →
`core/loader/arrow_fragment_loader.h`): read edges as a Dataset, dedup /
symmetrize per the requested view, hash-route every edge to the partition of
its source vertex (`partitioner.h:43-54` hash(oid)%fnum analogue), and build
per-partition CSR inside long-lived actors.  The driver loop is the PIE
PEval/IncEval fixpoint (`programming_model_pie.md:9-31`): supersteps with a
barrier, pre-combined message exchange through the object store, and global
scalar reduction on the driver.

Scale notes (100 TB / multi-node):
- edge routing is ONE range shuffle on an int key (sort by part) — the only
  all-to-all in the build; blocks stream through the object store.
- vertex encoding collects only the *distinct* vertex ids (repos, not files)
  to the driver to assign dense ranks; for vertex sets too large for that,
  swap in the hash-join path (zip_with_index + two Dataset joins) — the
  engine only needs vids dense in [0, N).
- messages per superstep are sized by boundary vertices per partition pair,
  not edges (combiner at the sender), the same reduction GRAPE's message
  strategies perform.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from graphscope_ray.graph.fragment import FragmentActor
from graphscope_ray.graph.programs import PROGRAMS, ProgramSpec


def _to_dataset(edges) -> ray.data.Dataset:
    if isinstance(edges, ray.data.Dataset):
        return edges
    if isinstance(edges, pa.Table):
        return ray.data.from_arrow(edges)
    if isinstance(edges, pd.DataFrame):
        return ray.data.from_pandas(edges)
    raise TypeError(f"unsupported edge input: {type(edges)}")


def _reverse_batch(t: pa.Table) -> pa.Table:
    cols = {"src": t["dst"], "dst": t["src"]}
    for c in t.column_names:
        if c not in ("src", "dst"):
            cols[c] = t[c]
    return pa.table(cols)


def _distinct_src_dst(ds: ray.data.Dataset) -> ray.data.Dataset:
    return (
        ds.groupby(["src", "dst"])
        .count()
        .select_columns(["src", "dst"])
    )


@dataclass
class RunResult:
    name: str
    rounds: int
    glob: dict
    metrics: list = field(default_factory=list)

    def state(self, graph: "Graph") -> ray.data.Dataset:
        return graph.program_state(self.name)


class Graph:
    """A partitioned, loaded graph: P FragmentActors + metadata."""

    def __init__(self, actors, P, N, num_edges, view, has_in, vertices_ds=None, p2p_messages=False):
        self.actors = actors
        self.P = P
        self.N = N
        self.num_edges = num_edges
        self.view = view
        self.has_in = has_in
        self.vertices_ds = vertices_ds  # optional (oid, vid) mapping Dataset
        self.p2p_messages = p2p_messages
        # p2p wire granularity: fragments per *node group*.  1 = one object
        # per (sender, target fragment) — P² objects/round, minimal bytes to
        # any single target but pure overhead when fragments share a node.
        # g>1 = one object per (sender, target NODE of g fragments) — P·⌈P/g⌉
        # objects/round; each object travels once to the target node and all
        # g fragments there read their slice zero-copy (the layout a real
        # multi-node cluster wants: set g = fragments-per-node).
        self.p2p_group = 1

    # ---- exports ---------------------------------------------------------

    def degrees(self) -> ray.data.Dataset:
        @ray.remote
        def _deg(actor):
            out_deg, in_deg = ray.get(actor.degrees.remote())
            vids = ray.get(actor.owned_vids.remote())
            cols = {"vid": pa.array(vids), "out_deg": pa.array(out_deg)}
            if in_deg is not None:
                cols["in_deg"] = pa.array(in_deg)
            return pa.table(cols)

        return ray.data.from_arrow_refs([_deg.remote(a) for a in self.actors])

    def program_state(self, name: str) -> ray.data.Dataset:
        return ray.data.from_arrow_refs([a.p_state.remote(name) for a in self.actors])

    def memory_report(self) -> dict:
        """Resident adjacency+index bytes per fragment (and totals) — the
        measurement surface for the ``compact`` build option."""
        parts = ray.get([a.resident_bytes.remote() for a in self.actors])
        total = sum(sum(v for k, v in p.items() if k != "compact") for p in parts)
        return {
            "total_bytes": int(total),
            "bytes_per_edge": (total / self.num_edges) if self.num_edges else 0.0,
            "compact": bool(parts[0]["compact"]) if parts else False,
            "fragments": parts,
        }

    # ---- REPORT_GRAPH point queries (core/fragment/fragment_reporter.h:
    # 96-200; grape_instance.cc reportGraph) — vid-addressed; graphs built
    # from oids translate through vertices_ds driver-side if needed ---------

    def has_node(self, vid: int) -> bool:
        """HAS_NODE: dense-vid layout → existence is a range check."""
        return 0 <= vid < self.N

    def _owner(self, vid: int):
        if not self.has_node(vid):
            raise KeyError(f"vid {vid} not in graph (N={self.N})")
        return self.actors[vid % self.P]

    def successors(self, vid: int) -> np.ndarray:
        """SUCCS_BY_NODE: one RPC to the owning fragment (plus the hub
        shards when the vertex is a split hub)."""
        succs = ray.get(self._owner(vid).point_succs.remote(vid))
        if self._is_split_hub(vid):
            shard = ray.get([a.point_hub_shard_succs.remote(vid) for a in self.actors])
            succs = np.sort(np.concatenate([succs, *shard]))
        return succs

    def predecessors(self, vid: int) -> np.ndarray:
        """PREDS_BY_NODE (needs store_in_edges=True)."""
        assert self.has_in, "predecessors need build_graph(store_in_edges=True)"
        return ray.get(self._owner(vid).point_preds.remote(vid))

    def has_edge(self, u: int, v: int) -> bool:
        if not (self.has_node(u) and self.has_node(v)):
            return False
        if ray.get(self.actors[u % self.P].point_has_edge.remote(u, v)):
            return True
        if self._is_split_hub(u):
            return bool(
                ray.get(self.actors[v % self.P].point_hub_shard_has_edge.remote(u, v))
            )
        return False

    def edge_data(self, u: int, v: int) -> float | None:
        """EDGE_DATA: the (u,v) weight, 1.0 when unweighted, None if absent."""
        self._owner(u), self._owner(v)  # range checks
        w = ray.get(self.actors[u % self.P].point_edge_data.remote(u, v))
        if w is None and self._is_split_hub(u):
            w = ray.get(self.actors[v % self.P].point_hub_shard_edge_data.remote(u, v))
        return w

    def num_selfloops(self) -> int:
        """SELFLOOPS_NUM (fragment_reporter.h:87-95)."""
        return sum(ray.get([a.selfloops_num.remote() for a in self.actors]))

    def _is_split_hub(self, vid: int) -> bool:
        if not getattr(self, "_hub_vid_cache", None):
            hubs = ray.get(self.actors[0].hub_tables.remote())[0] if self.actors else None
            self._hub_vid_cache = (
                set(int(v) for v in hubs) if hubs is not None else set()
            ) or {-1}
        return vid in self._hub_vid_cache

    # ---- the PIE superstep loop -----------------------------------------

    def run_program(
        self,
        algo: str,
        name: str | None = None,
        max_rounds: int | None = None,
        checkpoint_dir: str | None = None,
        checkpoint_every: int = 1,
        resume: bool = False,
        pipeline: int = 1,
        program: "ProgramSpec | None" = None,
        **params,
    ) -> RunResult:
        """pipeline > 1: submit that many supersteps without a driver
        round-trip — actors reduce global scalars themselves; convergence is
        only tested at sync points, so a tol-based run may execute up to
        pipeline-1 extra (refining) rounds.  Use for fixed-round runs and
        benchmarks; incompatible with prestep programs and checkpointing.

        ``program``: the USER-EXTENSION path (the reference's UDF surface,
        `@pie`/`@pregel` decorators compiled to gar archives,
        python/graphscope/analytical/udf/decorators.py:51,124) — pass a
        ``ProgramSpec`` whose ``cls`` is any ``VertexProgram`` subclass; the
        class itself ships to the fragment actors via Ray's serializer (no
        registry entry, no codegen).  ``algo`` then only names the run."""
        if program is not None:
            spec = program
            params["__program_cls__"] = program.cls
        else:
            spec = PROGRAMS[algo]
        name = name or algo
        P = self.P
        if max_rounds is None:
            max_rounds = params.pop("max_rounds", spec.default_max_rounds)
        else:
            params.pop("max_rounds", None)
        glob: dict = {}
        start_step = 0
        metrics: list[dict] = []
        if resume and checkpoint_dir and _latest_complete_step(checkpoint_dir) is not None:
            start_step, glob = self._restore(algo, name, params, checkpoint_dir)
            with open(os.path.join(checkpoint_dir, "manifest.json")) as _f:
                _man = json.load(_f)
            if _man.get("done"):
                # the checkpointed run already CONVERGED at start_step-1; the
                # state parts are pre-finalize (checkpoint happens before
                # p_finalize), so finalize once and return — re-running any
                # refining round would perturb the converged scores.
                ray.get([a.p_finalize.remote(name, glob) for a in self.actors])
                return RunResult(name, start_step, glob, metrics)
        else:
            init_stats = ray.get([a.p_init.remote(name, algo, params) for a in self.actors])
            glob.update(_reduce(init_stats))

        has_prestep = getattr(spec.cls, "has_prestep", True)
        if pipeline > 1 and not has_prestep and checkpoint_dir is None and P > 1:
            return self._run_pipelined(
                spec, name, start_step, max_rounds, glob, params, pipeline, metrics
            )
        for step in range(start_step, max_rounds):
            t0 = time.perf_counter()
            if has_prestep:
                pre = ray.get([a.p_prestep.remote(name, step, glob) for a in self.actors])
                glob.update(_reduce(pre))
            t1 = time.perf_counter()
            if self.p2p_messages and P > 1:
                # p2p: one object per (sender, target node-group) — the
                # multi-node wire format (see Graph.p2p_group)
                gsz = max(1, min(self.p2p_group, P))
                G = (P + gsz - 1) // gsz
                msg_refs = [
                    a.p_scatter_grp.options(num_returns=G).remote(name, step, glob, gsz)
                    for a in self.actors
                ]
                if G == 1:
                    msg_refs = [[r] for r in msg_refs]
                stats = ray.get(
                    [
                        self.actors[q].p_gather_grp.remote(
                            name, step, glob, gsz, *[msg_refs[p][q // gsz] for p in range(P)]
                        )
                        for q in range(P)
                    ]
                )
            else:
                # shared-scatter: ONE object per sender; receivers read their
                # slice zero-copy from the shared object store (single-node:
                # free; multi-node: trades P× object count for node-level
                # broadcast — flip p2p_messages=True there)
                msg_refs = [a.p_scatter_all.remote(name, step, glob) for a in self.actors]
                stats = ray.get(
                    [
                        self.actors[q].p_gather_shared.remote(name, step, glob, *msg_refs)
                        for q in range(P)
                    ]
                )
            glob.update(_reduce(stats))
            t2 = time.perf_counter()
            metrics.append(
                {
                    "step": step,
                    "t_prestep": t1 - t0,
                    "t_exchange": t2 - t1,
                    **{k: v for k, v in glob.items() if isinstance(v, (int, float))},
                }
            )
            done = spec.converged(glob, params, self.N, step)
            if checkpoint_dir and (done or (step + 1) % checkpoint_every == 0):
                self._checkpoint(name, checkpoint_dir, step, glob, metrics, done=done)
            if done:
                ray.get([a.p_finalize.remote(name, glob) for a in self.actors])
                return RunResult(name, step + 1, glob, metrics)
        ray.get([a.p_finalize.remote(name, glob) for a in self.actors])
        return RunResult(name, max_rounds, glob, metrics)

    def _run_pipelined(self, spec, name, start_step, max_rounds, glob, params, K, metrics):
        acts = self.actors
        P = self.P
        # seed every actor's local glob with the (unreduced) init/restore stats
        prev_stats = [ray.put(glob)] if glob else []
        last_step = start_step
        t0 = time.perf_counter()
        for step in range(start_step, max_rounds):
            if self.p2p_messages and P > 1:
                gsz = max(1, min(self.p2p_group, P))
                G = (P + gsz - 1) // gsz
                scat = [
                    a.p_scatter_pipe_p2p.options(num_returns=G).remote(
                        name, step, gsz, *prev_stats
                    )
                    for a in acts
                ]
                if G == 1:
                    scat = [[r] for r in scat]
                prev_stats = [
                    acts[q].p_gather_pipe_p2p.remote(
                        name, step, gsz, *[scat[p][q // gsz] for p in range(P)]
                    )
                    for q in range(P)
                ]
                last_step = step
                if (step + 1 - start_step) % K == 0 or step == max_rounds - 1:
                    stats = _reduce(ray.get(prev_stats))
                    glob.update(stats)
                    metrics.append(
                        {
                            "step": step,
                            "t_exchange": time.perf_counter() - t0,
                            **{k: v for k, v in glob.items() if isinstance(v, (int, float))},
                        }
                    )
                    t0 = time.perf_counter()
                    if spec.converged(glob, params, self.N, step):
                        break
                continue
            scat = [a.p_scatter_pipe.remote(name, step, *prev_stats) for a in acts]
            prev_stats = [q.p_gather_pipe.remote(name, step, *scat) for q in acts]
            last_step = step
            if (step + 1 - start_step) % K == 0 or step == max_rounds - 1:
                stats = _reduce(ray.get(prev_stats))
                glob.update(stats)
                metrics.append(
                    {
                        "step": step,
                        "t_exchange": time.perf_counter() - t0,
                        **{k: v for k, v in glob.items() if isinstance(v, (int, float))},
                    }
                )
                t0 = time.perf_counter()
                if spec.converged(glob, params, self.N, step):
                    break
        ray.get([a.p_finalize.remote(name, glob) for a in acts])
        return RunResult(name, last_step + 1, glob, metrics)

    # ---- checkpoint / resume (per-superstep per-partition Parquet + manifest) ---

    def _checkpoint(self, name, ckpt_dir, step, glob, metrics, done=False):
        step_dir = os.path.join(ckpt_dir, f"step={step}")
        os.makedirs(step_dir, exist_ok=True)

        @ray.remote
        def _write(table: pa.Table, path: str):
            tmp = path + ".tmp"
            pq.write_table(table, tmp)
            os.replace(tmp, path)  # atomic within a filesystem
            return True

        refs = [
            _write.remote(a.p_state.remote(name), os.path.join(step_dir, f"part={p}.parquet"))
            for p, a in enumerate(self.actors)
        ]
        ray.get(refs)
        pa.Table.from_pylist(metrics).to_pandas().to_parquet(
            os.path.join(ckpt_dir, "metrics.parquet")
        )
        manifest = {
            "name": name,
            "step": step,
            "glob": {k: v for k, v in glob.items() if isinstance(v, (int, float))},
            "num_partitions": self.P,
            "num_vertices": self.N,
            "parts": [f"step={step}/part={p}.parquet" for p in range(self.P)],
            "done": bool(done),
        }
        tmp = os.path.join(ckpt_dir, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(ckpt_dir, "manifest.json"))

    def _restore(self, algo, name, params, ckpt_dir):
        with open(os.path.join(ckpt_dir, "manifest.json")) as f:
            manifest = json.load(f)
        assert manifest["num_partitions"] == self.P, "resume requires same partition count"
        step = manifest["step"]

        @ray.remote
        def _read(path: str) -> pa.Table:
            return pq.read_table(path)

        refs = [_read.remote(os.path.join(ckpt_dir, rel)) for rel in manifest["parts"]]
        resume_stats = ray.get(
            [
                a.p_load_state.remote(name, algo, params, r)
                for a, r in zip(self.actors, refs)
            ]
        )
        glob = dict(manifest["glob"])
        glob.update(_reduce([s for s in resume_stats if s]))
        return step + 1, glob

    # ---- triangle counting driver ---------------------------------------

    def triangles(self, dense_threshold: int = 16384) -> tuple[int, ray.data.Dataset]:
        """Global + per-vertex triangle counts (degree-ordered forward algorithm,
        apps/clustering/triangles.h:43-158).  Two physical plans:
        - N ≤ dense_threshold: broadcast the oriented adjacency as a bitset
          matrix (≤ 32 MB) and count via AND+popcount — dense graphs generate
          quadratically many wedges, the bitset path sidesteps them entirely.
        - otherwise: ship dedup'd wedge queries to the pivot owner (the
          scalable sparse path)."""
        P = self.P
        acts = self.actors
        # hub-split graphs route hub out-edges by destination, so the local
        # undirected merge (ucsr) would silently miss hub adjacency — guard
        # like p_init/save_graph do (ADVICE r1)
        assert not (acts and ray.get(acts[0].has_hub_shard.remote())), (
            "triangles/lcc/transitivity on hub-split graphs not supported — "
            "build without hub_threshold"
        )
        reqs = ray.get([a.deg_requests.remote() for a in acts])
        replies = [
            [acts[q].deg_reply.remote(reqs[p][q]) for q in range(P)] for p in range(P)
        ]
        ray.get([acts[p].tri_orient.remote(*replies[p]) for p in range(P)])
        if self.N <= dense_threshold:
            row_refs = [a.tri_rows.remote() for a in acts]
            if P == 1:
                inc_refs = [[acts[0].tri_dense.remote(*row_refs)]]
            else:
                inc_refs = [
                    a.tri_dense.options(num_returns=P).remote(*row_refs) for a in acts
                ]
            totals = ray.get(
                [
                    acts[q].tri_dense_apply.remote(*[inc_refs[p][q] for p in range(P)])
                    for q in range(P)
                ]
            )
            per_vertex = ray.data.from_arrow_refs([a.tri_state.remote() for a in acts])
            return int(sum(totals)) // 3, per_vertex
        # phase 1: dedup'd wedge queries p→owner(v)=q
        if P == 1:
            wedge_refs = [[acts[0].tri_wedges.remote()]]
        else:
            wedge_refs = [a.tri_wedges.options(num_returns=P).remote() for a in acts]
        # phase 2: owners check membership, count v corners, reply found bitmaps
        if P == 1:
            check_refs = [[acts[0].tri_check.remote(wedge_refs[0][0])]]
        else:
            check_refs = [
                acts[q].tri_check.options(num_returns=P).remote(
                    *[wedge_refs[p][q] for p in range(P)]
                )
                for q in range(P)
            ]
        # phase 3: senders apply u corners, route w-corner increments
        if P == 1:
            u_refs = [[acts[0].tri_u_apply.remote(check_refs[0][0])]]
        else:
            u_refs = [
                acts[p].tri_u_apply.options(num_returns=P).remote(
                    *[check_refs[q][p] for q in range(P)]
                )
                for p in range(P)
            ]
        # phase 4: owners apply w corners
        totals = ray.get(
            [
                acts[q].tri_w_apply.remote(*[u_refs[p][q] for p in range(P)])
                for q in range(P)
            ]
        )
        per_vertex = ray.data.from_arrow_refs([a.tri_state.remote() for a in acts])
        return int(sum(totals)) // 3, per_vertex


from graphscope_ray.graph.fragment import reduce_stats as _reduce


def _latest_complete_step(ckpt_dir: str):
    path = os.path.join(ckpt_dir, "manifest.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        m = json.load(f)
    for rel in m["parts"]:
        if not os.path.exists(os.path.join(ckpt_dir, rel)):
            return None
    return m["step"]


# --------------------------------------------------------------------------


def build_graph(
    edges,
    *,
    num_partitions: int = 8,
    view: str = "directed",
    store_in_edges: bool = False,
    num_vertices: int | None = None,
    weight: bool = False,
    actor_cpus: float = 0,
    dedup_edges: bool = False,
    hub_threshold: int | None = None,
    p2p_messages: bool = False,
    compact: bool = False,
) -> Graph:
    """Route edges (int64 ``src``/``dst`` vids in [0, N)) to P FragmentActors.

    view: 'directed' | 'undirected' (symmetrized + distinct — WCC, k-core,
    triangles) | 'undirected_multi' (both directions, duplicates kept — CDLP's
    LDBC neighbor multiset).

    compact=True stores each fragment's primary adjacency as a varint+delta
    blob (the reference's ``compact_edges`` memory option,
    arrow_projected_fragment.h:727-735) — bit-identical algorithm results,
    ~3-6× smaller resident dst arrays, point/triangle kernels decode on
    demand.  ``Graph.memory_report()`` measures it.
    """
    ds = _to_dataset(edges)
    cols = ["src", "dst"] + (["weight"] if weight else [])
    ds = ds.select_columns(cols)
    # The edge table usually feeds several consumers (symmetrize, max,
    # routing) — pin it once so the upstream pipeline (parquet read, mining,
    # dedup groupby) doesn't re-execute per consumer.  This IS the loaded
    # graph (the reference holds it in vineyard similarly); blocks spill to
    # disk under memory pressure.  EXCEPTION: a directed build with a known
    # vertex count and no hub split has exactly ONE consumer (the routing
    # exchange), so the pin would only add a full extra pass — stream the
    # upstream straight into the exchange instead.
    single_consumer = (
        view == "directed" and num_vertices is not None and hub_threshold is None
    )
    if not single_consumer:
        ds = ds.materialize()
    if view == "undirected":
        ds = _distinct_src_dst(ds.select_columns(["src", "dst"]).union(
            ds.map_batches(_reverse_batch, batch_format="pyarrow").select_columns(["src", "dst"])
        ))
    elif view == "undirected_multi":
        ds = ds.union(ds.map_batches(_reverse_batch, batch_format="pyarrow"))
    elif view != "directed":
        raise ValueError(view)
    if view != "directed":
        ds = ds.materialize()

    if num_vertices is None:
        mx = ds.max(["src", "dst"])
        num_vertices = (
            int(max(mx["max(src)"], mx["max(dst)"])) + 1 if mx is not None else 0
        )
    P = max(1, num_partitions)

    # degree-skew hub splitting (the north rule's explicit requirement):
    # a vertex whose out-edges exceed hub_threshold would concentrate its
    # entire adjacency on one fragment.  Its edges are instead routed by
    # DESTINATION — each fragment holds the hub→local-dst shard, and per
    # superstep the (few) hub scores travel in the reduced global dict, so
    # hub traffic needs NO message exchange at all (apply is fragment-local).
    hub_vids = hub_deg = None
    hub_splits = None
    if hub_threshold is not None and view == "directed":
        # hub out-degrees are counted over the rows as given — feed a
        # pre-deduplicated edge table when combining with dedup_edges
        assert not dedup_edges, (
            "hub_threshold counts raw rows; dedup the edge table before the "
            "build instead of using dedup_edges"
        )
        from graphscope_ray.utils import hash_groupby_sum

        degs = hash_groupby_sum(
            ds.select_columns(["src"]), ["src"], None, "d", num_partitions=P
        ).to_pandas()
        hubs = degs[degs["d"] > hub_threshold].sort_values("src")
        if len(hubs):
            hub_vids = hubs["src"].to_numpy(np.int64)
            hub_deg = hubs["d"].to_numpy(np.int64)
            href = ray.put(hub_vids)

            def _split_hub(t: pa.Table, want_hub: bool) -> pa.Table:
                hv = ray.get(href)
                src = t["src"].to_numpy(zero_copy_only=False)
                pos = np.searchsorted(hv, src)
                is_hub = hv[np.minimum(pos, len(hv) - 1)] == src
                return t.filter(pa.array(is_hub if want_hub else ~is_hub))

            hub_ds = ds.map_batches(
                lambda t: _split_hub(t, True), batch_format="pyarrow"
            ).materialize()
            ds = ds.map_batches(
                lambda t: _split_hub(t, False), batch_format="pyarrow"
            ).materialize()
            hub_splits = _route(hub_ds, P, by="dst")

    if store_in_edges and hub_splits is None:
        # one exchange task per block routes by BOTH endpoints (2P returns)
        # instead of two passes — halves task launches and block reads
        out_splits, in_splits = _route_both(ds, P)
    else:
        out_splits = _route(ds, P, by="src")
        in_splits = _route(ds, P, by="dst") if store_in_edges else None

    # num_cpus=0 + SPREAD: all P fragments co-schedule (supersteps run in
    # lockstep, one numpy thread each); on a multi-node cluster SPREAD places
    # one fragment per node first, like one MPI worker per host.
    actors = [
        FragmentActor.options(num_cpus=actor_cpus, scheduling_strategy="SPREAD").remote(
            p,
            P,
            num_vertices,
            out_splits[p],
            in_splits[p] if in_splits is not None else None,
            dedup_edges,
            hub_splits[p] if hub_splits is not None else None,
            hub_vids,
            hub_deg,
            compact,
        )
        for p in range(P)
    ]
    num_edges = sum(ray.get([a.num_edges.remote() for a in actors]))
    return Graph(
        actors, P, num_vertices, num_edges, view, store_in_edges,
        p2p_messages=p2p_messages,
    )


@ray.remote
def _split_block(t: pa.Table, P: int, by: str):
    """Partition one Arrow block by owner(key) = key % P → P sub-tables
    (zero-copy slices of one take).  The direct all-to-all exchange: no
    global sort, each fragment later concats its slices from every block."""
    if by not in t.column_names or t.num_rows == 0:
        empty = pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        return tuple(empty for _ in range(P))
    key = t[by].to_numpy(zero_copy_only=False)
    part = key % P
    order = np.argsort(part, kind="stable")
    sorted_t = t.take(order)
    counts = np.bincount(part, minlength=P)
    bounds = np.concatenate([[0], np.cumsum(counts)])
    return tuple(sorted_t.slice(int(bounds[p]), int(counts[p])) for p in range(P))


@ray.remote
def _split_block_bidir(t: pa.Table, P: int):
    """One exchange task per block for graphs that store BOTH edge
    directions: returns 2P tables — slices routed by src (first P) then by
    dst (last P).  Each direction is one stable argsort + take, exactly like
    _split_block, but the block is shipped to a worker once instead of
    twice."""
    if "src" not in t.column_names or t.num_rows == 0:
        empty = pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        return tuple(empty for _ in range(2 * P))
    out = []
    for by in ("src", "dst"):
        key = t[by].to_numpy(zero_copy_only=False)
        part = key % P
        order = np.argsort(part, kind="stable")
        sorted_t = t.take(order)
        counts = np.bincount(part, minlength=P)
        bounds = np.concatenate([[0], np.cumsum(counts)])
        out.extend(sorted_t.slice(int(bounds[p]), int(counts[p])) for p in range(P))
    return tuple(out)


def _route_both(ds: ray.data.Dataset, P: int) -> tuple[list[list], list[list]]:
    """Hash-route by src AND dst in a single pass over the blocks."""
    blocks = ds.to_arrow_refs()
    if P == 1:
        return [blocks], [blocks]
    refs = [_split_block_bidir.options(num_returns=2 * P).remote(b, P) for b in blocks]
    out = [[r[p] for r in refs] for p in range(P)]
    ins = [[r[P + p] for r in refs] for p in range(P)]
    return out, ins


def _route(ds: ray.data.Dataset, P: int, by: str) -> list[list]:
    """Hash-route edges to their owner partition: one split task per block,
    refs exchanged actor-to-actor through the object store (the analogue of
    the loader's all-to-all in arrow_fragment_loader.h)."""
    blocks = ds.to_arrow_refs()
    if P == 1:
        return [blocks]
    split_refs = [
        _split_block.options(num_returns=P).remote(b, P, by) for b in blocks
    ]
    return [[split_refs[i][p] for i in range(len(blocks))] for p in range(P)]


def save_graph(g: Graph, path: str) -> str:
    """SERIALIZE_GRAPH parity (dag_utils.py:1115-1166): write the loaded
    graph as per-partition Parquet (edges pre-partitioned by owner, vertices,
    meta.json manifest) — reload skips the routing shuffle entirely.
    Hub-split graphs additionally serialize each partition's hub shard (the
    hub edges routed by destination) plus the hub id/degree tables, so the
    reload restores the exact split layout."""
    has_hubs = ray.get(g.actors[0].has_hub_shard.remote()) if g.actors else False
    os.makedirs(os.path.join(path, "edges"), exist_ok=True)

    @ray.remote
    def _write(table: pa.Table, p: str):
        tmp = p + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, p)
        return True

    ray.get(
        [
            _write.remote(a.edges_table.remote(), os.path.join(path, "edges", f"part={p}.parquet"))
            for p, a in enumerate(g.actors)
        ]
    )
    if has_hubs:
        os.makedirs(os.path.join(path, "hub_edges"), exist_ok=True)
        ray.get(
            [
                _write.remote(
                    a.hub_edges_table.remote(),
                    os.path.join(path, "hub_edges", f"part={p}.parquet"),
                )
                for p, a in enumerate(g.actors)
            ]
        )
        hub_vids, hub_deg = ray.get(g.actors[0].hub_tables.remote())
        pq.write_table(
            pa.table({"hub_vid": pa.array(hub_vids), "hub_deg": pa.array(hub_deg)}),
            os.path.join(path, "hubs.parquet"),
        )
    if g.vertices_ds is not None:
        pq.write_table(
            pa.Table.from_pandas(g.vertices_ds.to_pandas(), preserve_index=False),
            os.path.join(path, "vertices.parquet"),
        )
    meta = {
        "num_partitions": g.P,
        "num_vertices": g.N,
        "num_edges": g.num_edges,
        "view": g.view,
        "has_in": g.has_in,
        "has_vertices": g.vertices_ds is not None,
        "has_hubs": bool(has_hubs),
    }
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    return path


def load_graph(path: str, store_in_edges: bool | None = None) -> Graph:
    """DESERIALIZE_GRAPH: rebuild FragmentActors from a save_graph layout.
    Edges are already partitioned by source owner — each actor reads only its
    own file; in-edges (if requested) still need the one routing exchange."""
    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    P, N = meta["num_partitions"], meta["num_vertices"]
    has_in = meta["has_in"] if store_in_edges is None else store_in_edges

    @ray.remote
    def _read(p: str) -> pa.Table:
        return pq.read_table(p)

    out_refs = [[_read.remote(os.path.join(path, "edges", f"part={p}.parquet"))] for p in range(P)]
    in_splits = None
    if has_in:
        ds = ray.data.read_parquet(os.path.join(path, "edges"))
        cols = ["src", "dst"] + (["weight"] if "weight" in ds.schema().names else [])
        in_splits = _route(ds.select_columns(cols).materialize(), P, by="dst")
    hub_refs = None
    hub_vids = hub_deg = None
    if meta.get("has_hubs"):
        hub_refs = [
            [_read.remote(os.path.join(path, "hub_edges", f"part={p}.parquet"))]
            for p in range(P)
        ]
        hubs = pq.read_table(os.path.join(path, "hubs.parquet"))
        hub_vids = hubs["hub_vid"].to_numpy()
        hub_deg = hubs["hub_deg"].to_numpy()
    actors = [
        FragmentActor.options(num_cpus=0, scheduling_strategy="SPREAD").remote(
            p,
            P,
            N,
            out_refs[p],
            in_splits[p] if in_splits is not None else None,
            False,
            hub_refs[p] if hub_refs is not None else None,
            hub_vids,
            hub_deg,
        )
        for p in range(P)
    ]
    vertices_ds = None
    if meta.get("has_vertices") and os.path.exists(os.path.join(path, "vertices.parquet")):
        vertices_ds = ray.data.read_parquet(os.path.join(path, "vertices.parquet"))
    g = Graph(actors, P, N, meta["num_edges"], meta["view"], has_in, vertices_ds)
    return g


def build_graph_from_oids(
    edges: ray.data.Dataset,
    src_col: str = "src_oid",
    dst_col: str = "dst_oid",
    encode: str = "auto",
    broadcast_limit: int = 20_000_000,
    vertices: ray.data.Dataset | None = None,
    use_perfect_hash: bool = False,
    partitioner: str = "hash",
    partitioner_rounds: int = 2,
    **kwargs,
) -> Graph:
    """Encode arbitrary (string/int) vertex oids to dense vids, then build.

    vid = rank of oid in sorted order (order-preserving, so min-vid component
    labels correspond to min-oid — matching the reference's canonical
    relabeling convention for WCC comparison).

    encode: ``"broadcast"`` collects the distinct-oid array to the driver and
    broadcasts it via ``ray.put`` for a searchsorted lookup inside
    ``map_batches`` — right for small vertex sets (repos, not files).
    ``"join"`` never materializes the vertex set anywhere: the oid→vid
    mapping is built distributed (``zip_with_index`` over the sorted
    distinct oids — same rank-order vids) and attached to the edges with two
    ``hash_join`` exchanges — the >100M-vertex scale path.  ``"auto"``
    counts the distinct oids and picks (≤ ``broadcast_limit`` → broadcast).

    ``vertices``: optional one-column ('oid') Dataset declaring the vertex
    universe explicitly — oids absent from the edge table stay in the graph
    as isolated vertices (the property-graph project_to_simple contract:
    the label's whole vertex table is the universe, ref graph.py:816-869).

    ``partitioner="affinity"`` (broadcast encode path only): route vertices
    by the neighbor-affinity locality partitioner (graph/partition.py)
    instead of hash — rank-order (= segmented) init, ``partitioner_rounds``
    LP refinement rounds, identical algorithm results after decode.

    ``use_perfect_hash``: replace the broadcast sorted-oid array (8 B/vertex
    in every node's object store) with a BBHash minimal perfect hash
    (~0.7 B/vertex; graph/phash.py) — the reference's ``use_perfect_hash``
    loader knob (``python/graphscope/framework/graph_builder.py:62``).
    vids become an arbitrary bijection instead of oid rank order, so
    order-canonical outputs (WCC min-label = min-oid) must relabel through
    decoded oids.  int64 oids only; ignored on the distributed-join path
    (which broadcasts nothing to begin with).
    """
    edges = edges.materialize()  # consumed 2× (distinct-id scan, encode)

    # local combiner as RAW per-block tasks over the pinned blocks (no extra
    # Dataset execution): each task returns (n_unique, unique_array); the
    # driver checks the Σ-per-block-unique UPPER BOUND from the small ints
    # alone before fetching a single id array.
    @ray.remote(num_returns=2)
    def _block_unique(t: pa.Table):
        if src_col not in t.column_names or t.num_rows == 0:
            return 0, np.empty(0, dtype=np.int64)
        u = np.unique(
            np.concatenate(
                [
                    t[src_col].to_numpy(zero_copy_only=False),
                    t[dst_col].to_numpy(zero_copy_only=False),
                ]
            )
        )
        return len(u), u

    uniq_refs = [_block_unique.remote(b) for b in edges.to_arrow_refs()]
    if vertices is not None:
        vertices = vertices.select_columns(["oid"]).materialize()

        @ray.remote(num_returns=2)
        def _vblock_unique(t: pa.Table):
            if "oid" not in t.column_names or t.num_rows == 0:
                return 0, np.empty(0, dtype=np.int64)
            u = np.unique(t["oid"].to_numpy(zero_copy_only=False))
            return len(u), u

        uniq_refs += [_vblock_unique.remote(b) for b in vertices.to_arrow_refs()]
    upper_bound = sum(ray.get([r[0] for r in uniq_refs]))
    # Σ per-block uniques ≥ true distinct count: when even that upper bound
    # fits the driver, skip the global distinct shuffle entirely and finish
    # with one local np.unique — saves a whole Ray groupby (~seconds of
    # fixed cost) on every small/medium build.
    if encode in ("auto", "broadcast") and upper_bound <= broadcast_limit:
        parts = ray.get([r[1] for r in uniq_refs])
        parts = [p for p in parts if len(p)]
        oid_arr = np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)
    else:
        # >broadcast_limit vertices: distinct via the Dataset groupby path
        del uniq_refs
        ids = edges.select_columns([src_col]).rename_columns({src_col: "oid"}).union(
            edges.select_columns([dst_col]).rename_columns({dst_col: "oid"})
        )
        if vertices is not None:
            ids = ids.union(vertices)
        ids = ids.map_batches(
            lambda t: pa.table(
                {"oid": pa.array(np.unique(t["oid"].to_numpy(zero_copy_only=False)))}
            ),
            batch_format="pyarrow",
        )
        distinct = ids.groupby("oid").count().select_columns(["oid"]).materialize()
        if encode == "auto":
            encode = "broadcast" if distinct.count() <= broadcast_limit else "join"
        if encode == "join":
            if partitioner != "hash":
                raise NotImplementedError(
                    "partitioner='affinity' on the distributed-join encode "
                    "path: compute the assignment with "
                    "partition.affinity_assignment and relabel explicitly"
                )
            return _build_from_oids_join(edges, distinct, src_col, dst_col, **kwargs)
        oid_arr = np.sort(distinct.to_pandas()["oid"].to_numpy())

    if use_perfect_hash:
        if not np.issubdtype(oid_arr.dtype, np.integer):
            raise ValueError("use_perfect_hash requires int64 oids")
        from graphscope_ray.graph.phash import MinimalPerfectHash

        mph = MinimalPerfectHash.build(oid_arr.astype(np.int64))
        mph_ref = ray.put(mph)

        def _encode(t: pa.Table) -> pa.Table:
            m = ray.get(mph_ref)
            src = m.lookup(t[src_col].to_numpy(zero_copy_only=False))
            dst = m.lookup(t[dst_col].to_numpy(zero_copy_only=False))
            cols = {"src": pa.array(src), "dst": pa.array(dst)}
            for c in t.column_names:
                if c not in (src_col, dst_col):
                    cols[c] = t[c]
            return pa.table(cols)

        vids = mph.lookup(oid_arr)
    else:
        oid_ref = ray.put(oid_arr)

        def _encode(t: pa.Table) -> pa.Table:
            arr = ray.get(oid_ref)
            src = np.searchsorted(arr, t[src_col].to_numpy(zero_copy_only=False))
            dst = np.searchsorted(arr, t[dst_col].to_numpy(zero_copy_only=False))
            cols = {"src": pa.array(src.astype(np.int64)), "dst": pa.array(dst.astype(np.int64))}
            for c in t.column_names:
                if c not in (src_col, dst_col):
                    cols[c] = t[c]
            return pa.table(cols)

        vids = np.arange(len(oid_arr), dtype=np.int64)

    enc = edges.map_batches(_encode, batch_format="pyarrow")
    if partitioner == "affinity":
        # locality-aware layout (partition.py): the rank-encoded vids are
        # re-permuted by the neighbor-affinity assignment; vertices_ds
        # composes both maps so decode still lands on the original oids.
        # Rank-order init == "segmented" when oids carry locality.
        from graphscope_ray.graph.partition import build_graph_locality

        g = build_graph_locality(
            enc.select_columns(
                ["src", "dst"] + ([c for c in ("weight",) if kwargs.get("weight")])
            ),
            num_partitions=kwargs.pop("num_partitions", 8),
            num_vertices=len(oid_arr),
            rounds=partitioner_rounds,
            init="segmented",
            **{k: v for k, v in kwargs.items() if k != "num_vertices"},
        )
        inner = g.vertices_ds.to_pandas()  # (oid = rank vid, vid = locality vid)
        perm = np.empty(len(oid_arr), dtype=np.int64)
        perm[inner["oid"].to_numpy(np.int64)] = inner["vid"].to_numpy(np.int64)
        g.vertices_ds = ray.data.from_arrow(
            pa.table({"oid": pa.array(oid_arr), "vid": pa.array(perm[vids])})
        )
        return g
    elif partitioner != "hash":
        raise ValueError(f"unknown partitioner {partitioner!r}")
    g = build_graph(enc, num_vertices=len(oid_arr), **kwargs)
    g.vertices_ds = ray.data.from_arrow(
        pa.table({"oid": pa.array(oid_arr), "vid": pa.array(vids)})
    )
    return g


def _build_from_oids_join(
    edges: ray.data.Dataset,
    distinct: ray.data.Dataset,
    src_col: str,
    dst_col: str,
    **kwargs,
) -> Graph:
    """Distributed oid→vid encode: no vertex array ever touches the driver
    or a single broadcast object.  The mapping is range-ranked by
    ``zip_with_index`` (vid = sorted rank, identical to the broadcast path)
    and shipped to the edges with two hash-partitioned join exchanges."""
    from graphscope_ray.utils import hash_join, zip_with_index

    mapping = zip_with_index(distinct, "oid", "vid").materialize()
    n_vertices = mapping.count()
    K = max(8, edges.num_blocks() // 4)

    def _fix(name_from, name_to, drop):
        def _f(t: pa.Table) -> pa.Table:
            t = t.drop_columns([c for c in drop if c in t.column_names])
            names = [name_to if c == name_from else c for c in t.column_names]
            return t.rename_columns(names)

        return _f

    e1 = hash_join(edges, mapping, src_col, "oid", num_partitions=K)
    e1 = e1.map_batches(_fix("vid", "src", [src_col, "oid"]), batch_format="pyarrow")
    e2 = hash_join(e1, mapping, dst_col, "oid", num_partitions=K)
    e2 = e2.map_batches(_fix("vid", "dst", [dst_col, "oid"]), batch_format="pyarrow")
    g = build_graph(e2, num_vertices=n_vertices, **kwargs)
    g.vertices_ds = mapping
    return g
