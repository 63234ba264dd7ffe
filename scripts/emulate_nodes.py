"""Round-5 multi-node-shaped exchange evidence (VERDICT r4 "Next round"
#8): does the ENGINE'S EXCHANGE PATH itself scale with node count?

Single-box emulation: P=32 fragments are grouped into n_nodes "nodes" of
g = P/n_nodes fragments; the p2p wire format ships ONE object per
(sender, target node) per superstep — exactly the multi-node layout
(each object would cross the network once; member fragments read their
slice zero-copy).  Two measurements per emulated node count:

1. STATIC cross-node wire bytes/round for the pre-combined PageRank
   message format (12 B/entry: int64 dst + float64 value packed
   columnar): Σ distinct (sender fragment, dst) pairs whose dst-owner
   lives on a DIFFERENT emulated node.  This is the traffic a real
   cluster would put on the network.
2. DYNAMIC superstep throughput: fixed pipelined PageRank rounds on the
   48M-edge bench graph under that p2p grouping, in a FRESH Ray session
   per node count (same protocol as bench.py --scaling).

Reading: if wire bytes grow only mildly with node count while per-object
count grows ∝ n_nodes, and measured superstep time stays flat, the
exchange format itself is not the scaling limiter — the single-box DRAM
wall is (BASELINE.md round-3/4 sections).

Usage: python scripts/emulate_nodes.py            # full (several minutes)
       python scripts/emulate_nodes.py --child N  # internal
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

V, E, P = 4_000_000, 48_000_000, 32
ROUNDS, PIPE = 10, 5


def edges_np():
    rng = np.random.RandomState(7)  # bench.py _scale_edges, same seed
    return rng.randint(0, V, E, dtype=np.int64), rng.randint(0, V, E, dtype=np.int64)


def static_wire_bytes():
    """Distinct (sender fragment, dst) pairs → per-node-count cross bytes."""
    src, dst = edges_np()
    sf = src % P
    key = sf * np.int64(V) + dst
    uniq = np.unique(key)
    usf = (uniq // V).astype(np.int64)
    udst = (uniq % V).astype(np.int64)
    df = udst % P  # owner fragment of dst
    out = {}
    for n_nodes in (1, 2, 4, 8):
        g = P // n_nodes
        cross = (usf // g) != (df // g)
        n_entries = int(cross.sum())
        out[n_nodes] = {
            "cross_node_entries_per_round": n_entries,
            "cross_node_mb_per_round": round(n_entries * 12 / 1e6, 1),
            "objects_per_round": P * n_nodes,
        }
    return out


def child(n_nodes: int):
    os.environ.setdefault("RAY_DEDUP_LOGS", "0")
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    import pyarrow as pa

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from graphscope_ray.graph import algorithms as alg
    from graphscope_ray.graph.build import build_graph

    src, dst = edges_np()
    tbl = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    g = build_graph(tbl, num_partitions=P, num_vertices=V,
                    p2p_messages=(n_nodes > 1))
    g.p2p_group = P // n_nodes
    # warm-up + best-of-2 fixed-round pipelined runs
    alg.pagerank(g, tol=0.0, max_rounds=2, pipeline=2)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        alg.pagerank(g, tol=0.0, max_rounds=ROUNDS, pipeline=PIPE)
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({
        "n_nodes": n_nodes,
        "p2p_group": g.p2p_group,
        "t_per_superstep_s": round(best / ROUNDS, 4),
        "edges_per_s_per_superstep": round(E * ROUNDS / best / 1e6, 1),
    }), flush=True)
    ray.shutdown()


def main():
    stat = static_wire_bytes()
    print(json.dumps({"static": {str(k): v for k, v in stat.items()}}), flush=True)
    dyn = {}
    for n in (1, 2, 4, 8):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(n)],
            capture_output=True, text=True,
        )
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        if line:
            dyn[str(n)] = json.loads(line[-1])
            print(line[-1], flush=True)
        else:
            print(json.dumps({"n_nodes": n, "error": r.stderr[-400:]}), flush=True)
    print(json.dumps({"static": {str(k): v for k, v in stat.items()}, "dynamic": dyn}))


if __name__ == "__main__":
    if "--child" in sys.argv:
        child(int(sys.argv[sys.argv.index("--child") + 1]))
    else:
        main()
