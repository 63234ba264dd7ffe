"""Round-5 boundary-growth counter-measurement (VERDICT r4 "Next round"
#1): per-superstep pre-combined message entries at P=32, hash partitioning
vs the neighbor-affinity partitioner (graph/partition.py), on

  (a) the bench's 48M-edge UNIFORM-random scaling graph (V=4M) — the
      topology behind the measured ×1.61 8→32 boundary-growth bound; no
      partitioner can beat the P·V·(1−e^(−E/(P·V))) formula here (there is
      no locality to find), so the expected reduction is ≈0: the control
      that shows the bound is topology-, not engine-, shaped;
  (b) a COMMUNITY-structured graph at the same scale (V=4M, E≈48M, 4000
      communities of 1000, 85% intra edges — the shape of a real repo
      link graph, where imports cluster in ecosystems) — the case the
      partitioner exists for.

Usage: python scripts/measure_partition.py [--quick]
Prints one JSON line; paste the numbers into BASELINE.md.
"""

import json
import sys
import time

import numpy as np
import pyarrow as pa

QUICK = "--quick" in sys.argv
V = 1_000_000 if QUICK else 4_000_000
E = 12_000_000 if QUICK else 48_000_000
P = 32
COMM = 1000  # community size


def uniform_edges():
    rng = np.random.RandomState(7)
    return pa.table(
        {
            "src": pa.array(rng.randint(0, V, E, dtype=np.int64)),
            "dst": pa.array(rng.randint(0, V, E, dtype=np.int64)),
        }
    )


def community_edges(intra=0.85, seed=11):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, V, E, dtype=np.int64)
    is_intra = rng.random_sample(E) < intra
    base = (src // COMM) * COMM
    dst_in = base + rng.randint(0, COMM, E, dtype=np.int64)
    dst_out = rng.randint(0, V, E, dtype=np.int64)
    dst = np.where(is_intra, dst_in, dst_out)
    return pa.table({"src": pa.array(src), "dst": pa.array(dst)})


def main():
    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from graphscope_ray.graph.partition import (
        affinity_assignment,
        boundary_message_entries,
        locality_mapping,
    )

    out = {"V": V, "E": E, "P": P}
    for name, tbl, init, rounds in (
        ("uniform", uniform_edges(), "hash", 2),
        ("community", community_edges(), "segmented", 2),
        ("community_hashinit", None, "hash", 5),
    ):
        if tbl is None:
            tbl = community_edges()
        ds = ray.data.from_arrow(tbl).repartition(64).materialize()
        del tbl
        t0 = time.perf_counter()
        base = boundary_message_entries(ds, P)
        t_base = time.perf_counter() - t0
        t0 = time.perf_counter()
        asg = affinity_assignment(ds, V, P, rounds=rounds, init=init)
        m = locality_mapping(asg, P).materialize()
        t_part = time.perf_counter() - t0
        t0 = time.perf_counter()
        loc = boundary_message_entries(ds, P, mapping=m)
        t_loc = time.perf_counter() - t0
        out[name] = {
            "init": init,
            "rounds": rounds,
            "hash_entries": base["entries"],
            "affinity_entries": loc["entries"],
            "entry_reduction": round(1 - loc["entries"] / max(base["entries"], 1), 4),
            "hash_cross_arcs": base["cross_arcs"],
            "affinity_cross_arcs": loc["cross_arcs"],
            "t_partition_s": round(t_part, 1),
            "t_measure_s": round(t_base + t_loc, 1),
        }
        print(json.dumps({name: out[name]}), flush=True)
        del ds, asg, m
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
