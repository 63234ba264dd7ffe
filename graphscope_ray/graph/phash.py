"""Minimal perfect hash vertex maps (the reference's ``use_perfect_hash``
graph-build knob, ``python/graphscope/client/utils.py`` loader option and
vineyard perfect-hash vertex map behind
``analytical_engine/core/fragment/arrow_projected_fragment.h``'s vertex-map
template parameter).

The broadcast oid→vid encode ships a sorted int64 array — 8 bytes/vertex
pinned in every node's object store.  At 10^9 vertices that is an 8 GB
broadcast; the BBHash-style minimal perfect hash below (Limasset et al.,
"Fast and scalable minimal perfect hashing for massive key sets", SEA 2017 —
public algorithm, implemented from the paper) replaces it with ~1 byte/key
of bitmaps + rank tables while still mapping every oid to a distinct slot
in [0, n).

Pure numpy, fully vectorized: build is a per-level ``bincount`` over mixed
keys; lookup is a per-level gather + SWAR popcount rank.  Slots are an
arbitrary bijection (NOT rank order) — callers that need order-canonical
output must relabel through the decoded oids (see lg_wcc_phash).
"""

from __future__ import annotations

import numpy as np

_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)

_M1 = np.uint64(0x5555555555555555)
_M2 = np.uint64(0x3333333333333333)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_H01 = np.uint64(0x0101010101010101)


def _mix(x: np.ndarray, seed: int) -> np.ndarray:
    """splitmix64 finalizer with a seed offset (wrapping uint64 numpy ops)."""
    x = x + np.uint64((seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(30)
    x *= _C1
    x ^= x >> np.uint64(27)
    x *= _C2
    x ^= x >> np.uint64(31)
    return x


def _popcount64(w: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount of a uint64 array."""
    w = w - ((w >> np.uint64(1)) & _M1)
    w = (w & _M2) + ((w >> np.uint64(2)) & _M2)
    w = (w + (w >> np.uint64(4))) & _M4
    return (w * _H01) >> np.uint64(56)


class MinimalPerfectHash:
    """BBHash-style MPHF over a set of distinct int64 keys.

    ``lookup(keys)`` maps each key of the build set to a distinct slot in
    ``[0, n)``.  Keys outside the build set return arbitrary slots — the
    structure is a perfect hash, not a membership filter (same contract as
    the reference's vineyard perfect-hash vertex map).
    """

    def __init__(self, levels, resid: np.ndarray, n: int, nbytes: int, seed: int):
        # levels: list of (bitmap uint64[], rank_prefix uint32[], m, offset)
        self.levels = levels
        self.resid = resid  # sorted residual keys placed after the last level
        self.resid_offset = n - len(resid)
        self.n = n
        self.nbytes = nbytes
        self.seed = seed

    @classmethod
    def build(cls, keys: np.ndarray, gamma: float = 2.0, max_levels: int = 32,
              seed: int = 1) -> "MinimalPerfectHash":
        if len(np.unique(keys)) != len(keys):
            raise ValueError("perfect hash build requires distinct keys")
        rem = np.ascontiguousarray(keys).astype(np.int64).view(np.uint64)
        n = len(rem)
        levels, nbytes, offset = [], 0, 0
        for lvl in range(max_levels):
            if len(rem) == 0:
                break
            m = max(64, int(np.ceil(gamma * len(rem) / 64.0)) * 64)
            h = (_mix(rem, seed + lvl) % np.uint64(m)).astype(np.int64)
            cnt = np.bincount(h, minlength=m)
            ok = cnt[h] == 1
            pos = h[ok]
            bitmap = np.zeros(m // 64, dtype=np.uint64)
            np.bitwise_or.at(bitmap, pos >> 6, np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63)))
            pc = _popcount64(bitmap)
            rank = np.zeros(len(bitmap), dtype=np.uint32)
            np.cumsum(pc[:-1], out=rank[1:])  # exclusive word-rank prefix
            levels.append((bitmap, rank, m, offset))
            nbytes += bitmap.nbytes + rank.nbytes
            offset += len(pos)
            rem = rem[~ok]
        resid = np.sort(rem)
        nbytes += resid.nbytes
        return cls(levels, resid, n, nbytes, seed)

    def lookup(self, keys: np.ndarray) -> np.ndarray:
        k = np.ascontiguousarray(keys).astype(np.int64).view(np.uint64)
        out = np.empty(len(k), dtype=np.int64)
        idx = np.arange(len(k))
        seed = self.seed
        for lvl, (bitmap, rank, m, offset) in enumerate(self.levels):
            if len(idx) == 0:
                break
            h = (_mix(k[idx], seed + lvl) % np.uint64(m)).astype(np.int64)
            w = h >> 6
            bit = h.astype(np.uint64) & np.uint64(63)
            words = bitmap[w]
            hit = (words >> bit) & np.uint64(1) == 1
            hw, hb = w[hit], bit[hit]
            below = bitmap[hw] & ((np.uint64(1) << hb) - np.uint64(1))
            out[idx[hit]] = offset + rank[hw].astype(np.int64) + _popcount64(below).astype(np.int64)
            idx = idx[~hit]
        if len(idx):
            out[idx] = self.resid_offset + np.searchsorted(self.resid, k[idx])
        return out
