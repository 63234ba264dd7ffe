"""lpa_u2i vs a direct single-process transcription of the reference
iteration (apps/lpa/lpa_u2i.h IncEval steps 2..max_round)."""

import numpy as np
import pyarrow as pa

import graphscope_ray.graph.algorithms as alg
from graphscope_ray.graph.build import build_graph


def _ref_lpa_u2i(src, dst, w, user_labels, n_users, n_items, max_round=20):
    """Reference semantics, dense numpy: u2i at even steps, i2u at odd
    steps >= 3, step counter 2..max_round (lpa_u2i.h:119-246)."""
    lab_u = user_labels.astype(np.float64).copy()
    prop = lab_u.shape[1]
    lab_i = np.zeros((n_items, prop))
    out_deg = np.bincount(src, minlength=n_users).astype(np.float64)
    in_deg = np.bincount(dst, minlength=n_items).astype(np.float64)
    s_sum = np.zeros(n_users)
    np.add.at(s_sum, src, in_deg[dst])
    for step in range(2, max_round + 1):
        if step % 2 == 0:  # u2i
            lab_i = np.zeros((n_items, prop))
            np.add.at(lab_i, dst, lab_u[src] * w[:, None])
        else:  # i2u
            tmp = np.zeros((n_users, prop))
            np.add.at(tmp, src, lab_i[dst] * w[:, None])
            denom = s_sum - out_deg
            safe = np.where(denom == 0, 1.0, denom)[:, None]
            upd = (tmp - out_deg[:, None] * lab_u) / safe
            upd = np.where((denom == 0)[:, None], lab_u, upd)
            pinned = (lab_u == 0.0) | (lab_u == 1.0)
            lab_u = np.where(pinned, lab_u, upd)
    return lab_u


def _bipartite(seed=7, n_users=60, n_items=40, n_edges=500, weighted=False):
    rng = np.random.RandomState(seed)
    u = rng.randint(0, n_users, n_edges)
    i = rng.randint(0, n_items, n_edges)
    keep = np.unique(u.astype(np.int64) * 10_000 + i, return_index=True)[1]
    u, i = u[keep], i[keep]
    w = rng.uniform(0.5, 2.0, len(u)) if weighted else np.ones(len(u))
    # labels: some pinned 0/1 seeds, some fractional
    lab = rng.uniform(0.05, 0.95, (n_users, 2))
    seeds = rng.choice(n_users, n_users // 4, replace=False)
    lab[seeds] = rng.randint(0, 2, (len(seeds), 2)).astype(float)
    return u, i, w, lab


def _run_engine(u, i, w, lab, n_users, n_items, max_round, weighted, P=3):
    cols = {
        "src": pa.array(u.astype(np.int64)),
        "dst": pa.array(i.astype(np.int64) + n_users),
    }
    if weighted:
        cols["weight"] = pa.array(w)
    g = build_graph(
        pa.table(cols),
        num_partitions=P,
        num_vertices=n_users + n_items,
        store_in_edges=True,
        weight=weighted,
    )
    got, _ = alg.lpa_u2i(g, lab, max_round=max_round)
    df = got.to_pandas().sort_values("vid")
    return df[["label_0", "label_1"]].to_numpy()


def test_lpa_u2i_unweighted_matches_reference():
    u, i, w, lab = _bipartite()
    want = _ref_lpa_u2i(u, i, w, lab, 60, 40, max_round=20)
    got = _run_engine(u, i, w, lab, 60, 40, 20, weighted=False)
    assert np.allclose(got, want, atol=1e-10)


def test_lpa_u2i_weighted_matches_reference():
    u, i, w, lab = _bipartite(seed=11, weighted=True)
    want = _ref_lpa_u2i(u, i, w, lab, 60, 40, max_round=21)
    got = _run_engine(u, i, w, lab, 60, 40, 21, weighted=True)
    assert np.allclose(got, want, atol=1e-10)


def test_lpa_u2i_pinned_seeds_stay():
    u, i, w, lab = _bipartite(seed=3)
    got = _run_engine(u, i, w, lab, 60, 40, 20, weighted=False)
    pin = (lab == 0.0) | (lab == 1.0)
    assert np.array_equal(got[pin], lab[pin])


def test_lpa_u2i_parallelism_invariant():
    u, i, w, lab = _bipartite(seed=5, weighted=True)
    a = _run_engine(u, i, w, lab, 60, 40, 20, weighted=True, P=1)
    b = _run_engine(u, i, w, lab, 60, 40, 20, weighted=True, P=4)
    assert np.allclose(a, b, atol=1e-12)
