"""Sharded bloom filter for the URL-seen set.

Design point (BASELINE.json north_rule): 10^10 canonical URLs. A
single bloom at 1% fpp for 10^10 keys is ~12 GB — too big to broadcast
whole. So the seen set is hash-sharded: shard = blake2b(url) mod S,
each shard holds an independent bloom sized for n/S keys. Build is
fully distributed (groupBy shard -> one bitmap per shard, map-side OR
via applyInPandas); only the finished bitmaps travel to the driver and
back out as a broadcast — the same lifecycle as Spark's own broadcast
joins. At 10^10 keys / 1024 shards each bitmap is ~12 MB and a wave's
executors only need the shards its partition's URLs hash into.

The filter is deliberately pure Python + numpy (no JVM bloom): Spark's
``DataFrame.stat.bloomFilter`` materializes on the driver and its JVM
object cannot be evaluated inside pandas UDFs, where the pre-filter
must run. Hashing is blake2b (keyed, deterministic across processes —
never Python ``hash()``), with the Kirsch-Mitzenmacher double-hash
scheme: pos_i = (h1 + i*h2) mod m.

Guarantee: NO false negatives ever (a seen URL is always flagged), and
false positives only cost a wasted row in the exact anti-join that
follows (seen.py) — correctness never depends on the bloom.
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass

import numpy as np


def _h128(key: str) -> tuple[int, int]:
    d = hashlib.blake2b(key.encode("utf-8"), digest_size=16).digest()
    return int.from_bytes(d[:8], "big"), int.from_bytes(d[8:], "big")


def _h128_batch(keys) -> tuple[np.ndarray, np.ndarray]:
    """(h1, h2) uint64 arrays for a whole batch — byte-identical to
    per-key `_h128`, but the digests land in one buffer decoded with a
    single big-endian `np.frombuffer` instead of 2N `int.from_bytes`.
    The per-key blake2b call itself is C-speed and stays the floor."""
    n = len(keys)
    buf = bytearray(n * 16)
    blake2b = hashlib.blake2b
    for i, key in enumerate(keys):
        buf[i * 16 : i * 16 + 16] = blake2b(
            key.encode("utf-8"), digest_size=16
        ).digest()
    h = np.frombuffer(bytes(buf), dtype=">u8").astype(np.uint64).reshape(n, 2)
    return np.ascontiguousarray(h[:, 0]), np.ascontiguousarray(h[:, 1])


def shard_of_many(keys, n_shards: int) -> np.ndarray:
    """Batch `shard_of`: identical digests, one buffer decode."""
    n = len(keys)
    buf = bytearray(n * 8)
    blake2b = hashlib.blake2b
    for i, key in enumerate(keys):
        buf[i * 8 : i * 8 + 8] = blake2b(
            key.encode("utf-8"), digest_size=8, salt=b"shard"
        ).digest()
    h = np.frombuffer(bytes(buf), dtype=">u8")
    return (h % np.uint64(n_shards)).astype(np.int64)


def optimal_params(n: int, fpp: float) -> tuple[int, int]:
    """(m bits, k hashes) for n expected keys at target fpp."""
    n = max(n, 1)
    m = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    k = max(1, int(round(m / n * math.log(2))))
    return m, k


@dataclass
class BloomFilter:
    """One shard's bitset. `bits` is a uint8 numpy array (m/8 bytes)."""

    m: int
    k: int
    bits: np.ndarray

    @classmethod
    def empty(cls, n: int, fpp: float = 0.01) -> "BloomFilter":
        m, k = optimal_params(n, fpp)
        m = ((m + 63) // 64) * 64  # round to whole words
        return cls(m=m, k=k, bits=np.zeros(m // 8, dtype=np.uint8))

    def _positions(self, key: str) -> np.ndarray:
        h1, h2 = _h128(key)
        i = np.arange(self.k, dtype=np.uint64)
        return (np.uint64(h1) + i * np.uint64(h2)) % np.uint64(self.m)

    def add(self, key: str) -> None:
        pos = self._positions(key)
        np.bitwise_or.at(self.bits, pos >> np.uint64(3),
                         np.left_shift(1, (pos & np.uint64(7)).astype(np.uint8)).astype(np.uint8))

    def add_many(self, keys) -> None:
        """Vectorized bulk insert: one position matrix for the whole
        batch, one unbuffered scatter-OR — same bits as N `add` calls
        (`np.bitwise_or.at` handles colliding byte indices exactly)."""
        if len(keys) == 0:
            return
        h1, h2 = _h128_batch(keys)
        pos = self._positions_batch(h1, h2)
        np.bitwise_or.at(
            self.bits,
            (pos >> np.uint64(3)).astype(np.int64).ravel(),
            np.left_shift(
                np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)
            ).ravel(),
        )

    def _positions_batch(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """N×k Kirsch-Mitzenmacher position matrix (batch `_positions`)."""
        i = np.arange(self.k, dtype=np.uint64)[None, :]
        return (h1[:, None] + i * h2[:, None]) % np.uint64(self.m)

    def might_contain_batch(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """Batch membership for pre-hashed keys (bool array)."""
        if len(h1) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions_batch(h1, h2)
        byte = self.bits[(pos >> np.uint64(3)).astype(np.int64)]
        mask = np.left_shift(
            np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)
        )
        return np.all((byte & mask) != 0, axis=1)

    def might_contain(self, key: str) -> bool:
        pos = self._positions(key)
        byte = self.bits[(pos >> np.uint64(3)).astype(np.int64)]
        mask = np.left_shift(1, (pos & np.uint64(7)).astype(np.uint8)).astype(np.uint8)
        return bool(np.all(byte & mask))

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.m == other.m and self.k == other.k
        return BloomFilter(self.m, self.k, np.bitwise_or(self.bits, other.bits))

    def to_bytes(self) -> bytes:
        head = self.m.to_bytes(8, "big") + self.k.to_bytes(4, "big")
        return head + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes) -> "BloomFilter":
        m = int.from_bytes(raw[:8], "big")
        k = int.from_bytes(raw[8:12], "big")
        bits = np.frombuffer(raw[12:], dtype=np.uint8).copy()
        return cls(m=m, k=k, bits=bits)


def shard_of(key: str, n_shards: int) -> int:
    """Deterministic shard assignment (independent bits from the
    position hashes: a different blake2b salt)."""
    d = hashlib.blake2b(key.encode("utf-8"), digest_size=8, salt=b"shard").digest()
    return int.from_bytes(d, "big") % n_shards


@dataclass
class ShardedBloom:
    """n_shards independent blooms keyed by `shard_of`."""

    n_shards: int
    shards: dict[int, BloomFilter]

    def might_contain(self, key: str) -> bool:
        bf = self.shards.get(shard_of(key, self.n_shards))
        return bf.might_contain(key) if bf is not None else False

    def might_contain_many(self, keys) -> np.ndarray:
        """Batch membership, vectorized per shard: keys group by their
        shard assignment (one batch-hash pass), then each PRESENT
        shard answers its group with one position-matrix probe. No
        dense [n_shards × bitmap] stack is ever built — at 10^10 keys
        a shard bitmap is ~12 MB and an executor only holds the shards
        its keys hash into (module docstring); grouping also keeps
        per-shard geometry free to differ. ~6× over the per-key path
        (the residual floor is the two C-speed blake2b calls per key).
        Absent shards answer False, exactly like `might_contain`."""
        n = len(keys)
        if n == 0:
            return np.zeros(0, dtype=bool)
        if not isinstance(keys, list):
            keys = list(keys)
        sh = shard_of_many(keys, self.n_shards)
        h1, h2 = _h128_batch(keys)
        out = np.zeros(n, dtype=bool)
        for s in np.unique(sh):
            bf = self.shards.get(int(s))
            if bf is None:
                continue
            idx = np.nonzero(sh == s)[0]
            out[idx] = bf.might_contain_batch(h1[idx], h2[idx])
        return out

    def to_rows(self) -> list[tuple[int, bytes]]:
        """(shard, bitmap) rows — the persisted checkpoint form."""
        return [(s, bf.to_bytes()) for s, bf in sorted(self.shards.items())]

    @classmethod
    def from_rows(cls, n_shards: int, rows) -> "ShardedBloom":
        return cls(
            n_shards=n_shards,
            shards={int(s): BloomFilter.from_bytes(bytes(b)) for s, b in rows},
        )
