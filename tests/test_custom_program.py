"""User-extension surface: a custom VertexProgram defined OUTSIDE the engine
(the reference's @pie/@pregel UDF parity — python/graphscope/analytical/udf/
decorators.py) runs through `run_program(program=ProgramSpec(...))` with the
class shipped to the fragment actors by Ray's serializer — no registry entry,
no codegen."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from graphscope_ray.graph.build import ProgramSpec, build_graph
from graphscope_ray.graph.fragment import acc_min
from graphscope_ray.graph.programs import VertexProgram, _wrap


class MaxProp(VertexProgram):
    """Max-label propagation over out-edges to fixpoint: every vertex ends
    with the largest vid that reaches it (the mirror image of WCC's
    min-label rule), pushed as min-of-negatives — deliberately NOT a
    built-in program."""

    def __init__(self, frag):
        super().__init__(frag)

    def init(self):
        f = self.frag
        self.lab = f.owned_vids().astype(np.float64)
        self.active = np.ones(f.n_local, dtype=bool)
        return {}

    def scatter(self, step, glob):
        return _wrap(self.frag.out.push_reduce_masked(-self.lab, self.active, "min"))

    def gather(self, step, glob, msgs):
        best = -acc_min(self.frag.n_local, msgs)  # -inf where no message
        changed = best > self.lab
        self.lab = np.where(changed, best, self.lab)
        self.active = changed
        return {"changed": int(changed.sum())}

    def state_columns(self):
        return {"lab": self.lab.astype(np.int64)}


def _graph(edges, n):
    t = pa.table(
        {
            "src": pa.array(np.array(edges)[:, 0].astype(np.int64)),
            "dst": pa.array(np.array(edges)[:, 1].astype(np.int64)),
        }
    )
    return build_graph(ray.data.from_arrow(t), num_partitions=3, num_vertices=n)


def _oracle_maxprop(edges, n):
    lab = np.arange(n, dtype=np.int64)
    for _ in range(n):
        new = lab.copy()
        for s, d in edges:
            new[d] = max(new[d], lab[s])
        if (new == lab).all():
            break
        lab = new
    return lab


@pytest.mark.parametrize("seed", [0, 3])
def test_custom_program_runs_unregistered(seed):
    rng = np.random.default_rng(seed)
    n = 40
    edges = [(int(a), int(b)) for a, b in rng.integers(0, n, (120, 2)) if a != b]
    g = _graph(edges, n)
    spec = ProgramSpec(
        MaxProp, lambda glob, p, N, s: glob.get("changed", 1) == 0, 10_000
    )
    res = g.run_program("maxprop_custom", program=spec)
    out = g.program_state("maxprop_custom").to_pandas().sort_values("vid")
    np.testing.assert_array_equal(out["lab"].to_numpy(), _oracle_maxprop(edges, n))
    assert res.rounds < 10_000
