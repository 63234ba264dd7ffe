"""Deterministic, resumable epoch iteration — the training hand-off.

Reference semantics: the GLE learning engine feeds TF/PyTorch trainers
through epoch-wise dataset iterators with a shuffle-per-epoch contract and
``iter_*`` endpoints (ref learning_engine/graph-learn: the Dataset /
generator API python/data/dataset.py and the sampler `get_*` loops); this
module is that last mile on Ray Data: a :class:`EpochIterator` over any
keyed ``ray.data.Dataset`` plus the two concrete feeders a trainer needs
(packed-sequence batches for causal-LM pretraining, k-hop subgraph batches
for GNN minibatch training).

Contracts (all pytest-enforced, tests/test_epoch.py):

- **Deterministic**: the batch stream is a pure function of
  (dataset contents, key column, seed, epoch) — NOT of block layout,
  partitioning or actor scheduling.  Implemented as a per-row
  ``hash_u64(key, salt=seed ^ epoch)`` shuffle key + a distributed range
  sort; same inputs → bit-identical stream, different epochs → different
  permutations.
- **Streaming**: batches come from ``Dataset.iter_batches`` over the
  sorted plan — blocks stream driver-side one batch at a time; nothing
  dataset-sized is materialized in driver heap.
- **Resumable**: ``epoch(e, start_batch=k)`` reproduces exactly the
  stream of ``epoch(e)`` with the first ``k`` batches dropped — the skip
  is an order-preserving ``split_at_indices`` on the distributed sorted
  dataset, so restarting a killed trainer at batch k does not replay (or
  re-ship) the consumed prefix.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from graphscope_ray.functions.sampling import hash_u64


def shuffled_epoch(
    ds: ray.data.Dataset, key: str, seed: int = 0, epoch: int = 0
) -> ray.data.Dataset:
    """The dataset in this epoch's deterministic global order: rows sorted
    by ``hash_u64(key, seed ^ (epoch * C))`` (full 64-bit resolution, ties
    broken by the key itself so duplicate-key datasets still get a total
    order).  A lazy plan — one range-sort exchange when consumed."""
    salt = (int(seed) & 0x7FFFFFFF) ^ ((int(epoch) + 1) * 0x9E3779B1)

    def _key(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key not in t.column_names:
            return t.append_column("__shuf", pa.array([], pa.int64()))
        k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "__shuf", pa.array(hash_u64(k, salt=salt).view(np.int64))
        )

    keyed = ds.map_batches(_key, batch_format="pyarrow")
    out = keyed.sort(["__shuf", key])

    def _drop(t: pa.Table) -> pa.Table:
        return t.drop_columns([c for c in ("__shuf",) if c in t.column_names])

    return out.map_batches(_drop, batch_format="pyarrow")


class EpochIterator:
    """Epoch-wise deterministic batch stream over a keyed Dataset.

    ``key`` must be an int64 column; duplicate keys are allowed (ties are
    broken by key, so equal rows are interchangeable anyway).  Batches are
    ``dict[str, np.ndarray]`` (list columns arrive as object arrays).
    """

    def __init__(
        self,
        ds: ray.data.Dataset,
        key: str,
        batch_size: int,
        seed: int = 0,
        drop_last: bool = False,
    ):
        if batch_size <= 0:
            raise ValueError("batch_size must be positive")
        self._ds = ds
        self._key = key
        self._B = int(batch_size)
        self._seed = int(seed)
        self._drop_last = drop_last

    def epoch(self, epoch: int = 0, start_batch: int = 0) -> Iterator[dict]:
        """Yield this epoch's batches from ``start_batch`` on.  The stream
        equals ``epoch(e)`` with the first ``start_batch`` batches dropped
        (exact-resume contract)."""
        shuffled = shuffled_epoch(self._ds, self._key, self._seed, epoch)
        if start_batch > 0:
            skip = start_batch * self._B
            parts = shuffled.split_at_indices([skip])
            shuffled = parts[1]
        # the streaming executor may emit blocks out of order unless asked
        # not to — determinism is the whole contract here
        ctx = ray.data.DataContext.get_current()
        prev = ctx.execution_options.preserve_order
        ctx.execution_options.preserve_order = True
        try:
            yield from shuffled.iter_batches(
                batch_size=self._B,
                batch_format="numpy",
                drop_last=self._drop_last,
            )
        finally:
            ctx.execution_options.preserve_order = prev

    def epochs(self, n_epochs: int, start_epoch: int = 0) -> Iterator[tuple[int, dict]]:
        """(epoch, batch) pairs across ``n_epochs`` — the GLE training-loop
        shape (`for e in range(E): for batch in ds:`)."""
        for e in range(start_epoch, start_epoch + n_epochs):
            for b in self.epoch(e):
                yield e, b


def iter_packed_batches(
    docs: ray.data.Dataset,
    seq_len: int,
    batch_size: int,
    seed: int = 0,
    epoch: int = 0,
    start_batch: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Iterator[dict]:
    """Causal-LM pretraining feeder: :func:`mlprep.pack_sequences` lays the
    corpus out into fixed ``seq_len``-token sequences; this groups the doc
    spans per sequence (one row per training sequence with list columns
    ``doc_ids`` / ``offsets`` / ``n_tokens``), then streams deterministic
    shuffled batches of ``batch_size`` sequences via :class:`EpochIterator`.

    Yields dicts with keys ``seq_id, doc_ids, offsets, n_tokens`` — the
    index structure a tokenizing data-loader needs to assemble the actual
    token tensor for each sequence (token ids themselves are produced by
    the trainer's tokenizer; this engine ships the layout, exactly like a
    deterministic webdataset index)."""
    from graphscope_ray.functions.mlprep import pack_sequences

    packed = pack_sequences(docs, seq_len=seq_len, id_col=id_col, text_col=text_col)

    def _per_seq(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("seq_offset")
        return pd.DataFrame(
            {
                "seq_id": [np.int64(df["seq_id"].iloc[0])],
                "doc_ids": [df[id_col].to_numpy(np.int64)],
                "offsets": [df["seq_offset"].to_numpy(np.int64)],
                "n_tokens": [df["n_tokens"].to_numpy(np.int64)],
            }
        )

    seqs = packed.groupby("seq_id").map_groups(_per_seq, batch_format="pandas")
    it = EpochIterator(seqs, key="seq_id", batch_size=batch_size, seed=seed)
    yield from it.epoch(epoch, start_batch)


def iter_khop_batches(
    edges: ray.data.Dataset,
    seeds: np.ndarray,
    fanouts: list[int],
    batch_size: int,
    seed: int = 0,
    epoch: int = 0,
    start_batch: int = 0,
) -> Iterator[dict]:
    """GNN minibatch feeder (GLE's neighborhood-sampling ``iter`` endpoint):
    the seed set is deterministically permuted per (seed, epoch), chunked
    into ``batch_size`` groups, and each chunk's layered fanout subgraph is
    sampled lazily (one :func:`minibatch.khop_sample` per yielded batch —
    skipped chunks on resume cost nothing).

    Yields dicts ``{"seeds": (B,), "layer": (E,), "src": (E,), "dst":
    (E,)}``.  The seed array is minibatch-scale driver state (the trainer
    owns it anyway); edges stay distributed."""
    from graphscope_ray.graph.minibatch import khop_sample

    s = np.unique(np.asarray(seeds, dtype=np.int64))
    salt = (int(seed) & 0x7FFFFFFF) ^ ((int(epoch) + 1) * 0x9E3779B1)
    order = np.lexsort((s, hash_u64(s, salt=salt)))
    s = s[order]
    n_batches = (len(s) + batch_size - 1) // batch_size
    for bi in range(start_batch, n_batches):
        chunk = s[bi * batch_size : (bi + 1) * batch_size]
        sub = khop_sample(edges, chunk, fanouts, salt=seed + epoch)
        df = sub.to_pandas() if sub.count() else pd.DataFrame(
            {"layer": [], "src": [], "dst": []}
        )
        df = df.sort_values(["layer", "src", "dst"]).reset_index(drop=True)
        yield {
            "seeds": chunk,
            "layer": df["layer"].to_numpy(np.int64),
            "src": df["src"].to_numpy(np.int64),
            "dst": df["dst"].to_numpy(np.int64),
        }
