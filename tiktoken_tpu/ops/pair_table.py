"""Vocabulary compilation: the (left, right) -> rank pair table.

The reference looks up candidate merges by hashing the *concatenated
bytes* of the pair (reference: src/lib.rs:145-150), valid because rank
order equals merge priority. On device, byte-string keys are awkward; we
exploit the same invariant differently: every token the merge loop ever
holds is itself a vocabulary token, so a pair is fully identified by its
two token ids. The table enumerates, offline, every (a, b) id pair whose
concatenated bytes form a vocabulary token, mapping it to that token's
rank — which is simultaneously the merge priority AND the merged token id.

Device side it is an open-addressing hash table (linear probing, bounded
probe length verified at build) laid out as three flat uint32 arrays, a
few MB in HBM, shared read-only by every block and replicated per chip.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

RANK_MAX = np.uint32(0xFFFFFFFF)
EMPTY_KEY = np.uint32(0xFFFFFFFF)


def _mix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Cheap uint32 pair hash; identical semantics in numpy and jax."""
    a = a.astype(np.uint32)
    b = b.astype(np.uint32)
    h = a * np.uint32(0x9E3779B1) ^ (b + np.uint32(0x85EBCA6B) + (a << np.uint32(6)))
    h ^= h >> np.uint32(15)
    h *= np.uint32(0x2C1B3C6D)
    h ^= h >> np.uint32(12)
    return h


@dataclass
class PairTable:
    keys_a: np.ndarray  # [size] uint32, EMPTY_KEY = free slot
    keys_b: np.ndarray  # [size] uint32
    vals: np.ndarray  # [size] uint32 rank (== merged token id)
    size: int  # power of two
    max_probes: int  # longest probe sequence, verified at build
    n_pairs: int
    byte_to_rank: np.ndarray  # [256] uint32: rank of each single-byte token
    n_vocab: int


def enumerate_pairs(mergeable_ranks: dict[bytes, int]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All (a, b) token-id pairs whose concatenation is a vocab token."""
    get = mergeable_ranks.get
    la: list[int] = []
    lb: list[int] = []
    lv: list[int] = []
    for token, rank in mergeable_ranks.items():
        n = len(token)
        if n < 2:
            continue
        for i in range(1, n):
            left = get(token[:i])
            if left is None:
                continue
            right = get(token[i:])
            if right is None:
                continue
            la.append(left)
            lb.append(right)
            lv.append(rank)
    return (
        np.asarray(la, dtype=np.uint32),
        np.asarray(lb, dtype=np.uint32),
        np.asarray(lv, dtype=np.uint32),
    )


def build_pair_table(
    mergeable_ranks: dict[bytes, int], *, load_factor: float = 0.5
) -> PairTable:
    byte_to_rank = np.full(256, RANK_MAX, dtype=np.uint32)
    for b in range(256):
        rank = mergeable_ranks.get(bytes([b]))
        if rank is None:
            raise ValueError(
                f"vocabulary is missing single-byte token {b:#04x}; the device "
                "merge path requires all 256 byte tokens"
            )
        byte_to_rank[b] = rank

    ka, kb, kv = enumerate_pairs(mergeable_ranks)
    n = len(ka)
    size = 1
    while size < max(16, int(n / load_factor)):
        size *= 2
    mask = np.uint32(size - 1)

    keys_a = np.full(size, EMPTY_KEY, dtype=np.uint32)
    keys_b = np.full(size, EMPTY_KEY, dtype=np.uint32)
    vals = np.full(size, RANK_MAX, dtype=np.uint32)

    # Vectorized cohort insertion: attempt slot h+probe for all remaining
    # keys at once; first writer (by np scatter order) wins the slot.
    idx = np.arange(n)
    h = _mix(ka, kb) & mask
    probe = np.zeros(n, dtype=np.uint32)
    remaining = idx
    max_probes = 0
    while len(remaining):
        slots = (h[remaining] + probe[remaining]) & mask
        free = keys_a[slots] == EMPTY_KEY
        # Among keys targeting the same free slot, keep the first.
        cand = remaining[free]
        cand_slots = slots[free]
        order = np.argsort(cand_slots, kind="stable")
        cand = cand[order]
        cand_slots = cand_slots[order]
        first = np.ones(len(cand), dtype=bool)
        first[1:] = cand_slots[1:] != cand_slots[:-1]
        winners = cand[first]
        win_slots = cand_slots[first]
        keys_a[win_slots] = ka[winners]
        keys_b[win_slots] = kb[winners]
        vals[win_slots] = kv[winners]
        placed = np.zeros(n, dtype=bool)
        placed[winners] = True
        still = remaining[~placed[remaining]]
        probe[still] += 1
        if len(still) and probe[still].max() > 64:
            raise RuntimeError("pair table probe length exploded; bad hash?")
        max_probes = max(max_probes, int(probe[remaining].max(initial=0)) + 1)
        remaining = still

    return PairTable(
        keys_a=keys_a,
        keys_b=keys_b,
        vals=vals,
        size=size,
        max_probes=max_probes,
        n_pairs=n,
        byte_to_rank=byte_to_rank,
        n_vocab=len(mergeable_ranks),
    )


def lookup_numpy(table: PairTable, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Reference lookup (numpy): rank of concat(bytes(a), bytes(b)) or
    RANK_MAX. The jax version in ops/merge.py mirrors this exactly."""
    mask = np.uint32(table.size - 1)
    h = _mix(a, b) & mask
    out = np.full(a.shape, RANK_MAX, dtype=np.uint32)
    found = np.zeros(a.shape, dtype=bool)
    for p in range(table.max_probes):
        slot = (h + np.uint32(p)) & mask
        hit = (~found) & (table.keys_a[slot] == a) & (table.keys_b[slot] == b)
        out = np.where(hit, table.vals[slot], out)
        found |= hit
    return out
