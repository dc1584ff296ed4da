"""Cuckoo filter: the deletable alternative to the bloom URL-seen.

Why offer both (north rule: "bloom/cuckoo URL-seen filter"):
- bloom: smaller per key at equal fpp, trivially mergeable (bitwise
  OR) — ideal for the rebuild-per-wave path (seen.py);
- cuckoo: supports DELETE, which matters when the filter itself is the
  persisted state at 10^10 keys (rebuilding from the seen table every
  wave would scan 10^10 rows): `requeue_failed` can remove the failed
  URLs from the persisted filter instead of rebuilding it.

Standard design (Fan et al., CoNLL'14, public): buckets of 4 slots of
16-bit fingerprints; candidate buckets i1 = H(x), i2 = i1 xor H(fp)
(partial-key cuckoo hashing, so i1 is recoverable from (i2, fp));
insertion evicts a random-ish victim for up to MAX_KICKS displacements.
All hashing is blake2b-derived (deterministic across processes, like
bloom.py). Fingerprint 0 is reserved for "empty" (fingerprints are
mapped into [1, 2^16-1]).

False-positive rate ≈ 2b / 2^f ≈ 0.012% at b=4, f=16 — and like the
bloom, a false positive only costs a wasted row in the exact anti-join
downstream; false negatives cannot happen for inserted keys unless an
insert FAILED (signalled, never silent).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np

SLOTS = 4
MAX_KICKS = 500


def _h64(key: str, salt: bytes = b"") -> int:
    return int.from_bytes(
        hashlib.blake2b(key.encode("utf-8"), digest_size=8, salt=salt.ljust(16, b"\0")).digest(),
        "big",
    )


def _fingerprint(key: str) -> int:
    fp = _h64(key, b"fp") & 0xFFFF
    return fp or 1  # 0 means empty


def _fp_hash(fp: int) -> int:
    return int.from_bytes(
        hashlib.blake2b(fp.to_bytes(2, "big"), digest_size=8).digest(), "big"
    )


@dataclass
class CuckooFilter:
    n_buckets: int
    table: np.ndarray  # shape (n_buckets, SLOTS), uint16
    n_items: int = 0

    @classmethod
    def empty(cls, capacity: int) -> "CuckooFilter":
        # 95% max load factor at b=4; round buckets to a power of two
        # so bucket indexing is a mask (keeps i1 ^ h(fp) in range)
        need = max(8, int(capacity / (SLOTS * 0.95)) + 1)
        n = 1 << (need - 1).bit_length()
        return cls(n_buckets=n, table=np.zeros((n, SLOTS), dtype=np.uint16))

    def _buckets_for(self, key: str) -> tuple[int, int, int]:
        fp = _fingerprint(key)
        i1 = _h64(key) & (self.n_buckets - 1)
        i2 = (i1 ^ _fp_hash(fp)) & (self.n_buckets - 1)
        return fp, i1, i2

    def _try_put(self, i: int, fp: int) -> bool:
        row = self.table[i]
        empty = np.where(row == 0)[0]
        if len(empty):
            row[empty[0]] = fp
            return True
        return False

    def add(self, key: str) -> bool:
        """False = table full (insert failed after MAX_KICKS); callers
        must grow/flush — never ignore."""
        fp, i1, i2 = self._buckets_for(key)
        if fp in self.table[i1] or fp in self.table[i2]:
            self.n_items += 1  # counting duplicates is fine for load
            return True
        if self._try_put(i1, fp) or self._try_put(i2, fp):
            self.n_items += 1
            return True
        # evict: bounded displacement chain, deterministic victim
        i = i2
        for kick in range(MAX_KICKS):
            slot = (fp + kick) % SLOTS
            victim = int(self.table[i][slot])
            self.table[i][slot] = fp
            fp = victim
            i = (i ^ _fp_hash(fp)) & (self.n_buckets - 1)
            if self._try_put(i, fp):
                self.n_items += 1
                return True
        return False

    def might_contain(self, key: str) -> bool:
        fp, i1, i2 = self._buckets_for(key)
        return bool(fp in self.table[i1] or fp in self.table[i2])

    def delete(self, key: str) -> bool:
        """Remove one copy of key's fingerprint; True if found."""
        fp, i1, i2 = self._buckets_for(key)
        for i in (i1, i2):
            idx = np.where(self.table[i] == fp)[0]
            if len(idx):
                self.table[i][idx[0]] = 0
                self.n_items = max(0, self.n_items - 1)
                return True
        return False

    def merge(self, other: "CuckooFilter") -> "CuckooFilter":
        """Re-insert the other's fingerprints (partial-key hashing
        makes fingerprints relocatable without the original keys —
        i_alt = i xor h(fp))."""
        assert self.n_buckets == other.n_buckets
        for i in range(other.n_buckets):
            for fp in other.table[i]:
                fp = int(fp)
                if fp == 0:
                    continue
                if not self._put_fp(i, fp):
                    raise OverflowError("cuckoo merge overflow; grow the filter")
        return self

    def _put_fp(self, i1: int, fp: int) -> bool:
        i2 = (i1 ^ _fp_hash(fp)) & (self.n_buckets - 1)
        if self._try_put(i1, fp) or self._try_put(i2, fp):
            self.n_items += 1
            return True
        i = i2
        for kick in range(MAX_KICKS):
            slot = (fp + kick) % SLOTS
            victim = int(self.table[i][slot])
            self.table[i][slot] = fp
            fp = victim
            i = (i ^ _fp_hash(fp)) & (self.n_buckets - 1)
            if self._try_put(i, fp):
                self.n_items += 1
                return True
        return False

    def to_bytes(self) -> bytes:
        return self.n_buckets.to_bytes(8, "big") + self.table.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes) -> "CuckooFilter":
        n = int.from_bytes(raw[:8], "big")
        table = np.frombuffer(raw[8:], dtype=np.uint16).reshape(n, SLOTS).copy()
        return cls(n_buckets=n, table=table)


@dataclass
class ShardedCuckoo:
    """Shard-parallel cuckoo (same sharding fn as ShardedBloom, so the
    two are drop-in interchangeable for seen.py)."""

    n_shards: int
    shards: dict[int, CuckooFilter]

    def might_contain(self, key: str) -> bool:
        from .bloom import shard_of  # noqa: PLC0415

        cf = self.shards.get(shard_of(key, self.n_shards))
        return cf.might_contain(key) if cf is not None else False

    def might_contain_many(self, keys) -> np.ndarray:
        return np.fromiter(
            (self.might_contain(k) for k in keys), dtype=bool, count=len(keys)
        )

    def delete(self, key: str) -> bool:
        from .bloom import shard_of  # noqa: PLC0415

        cf = self.shards.get(shard_of(key, self.n_shards))
        return cf.delete(key) if cf is not None else False

    def to_rows(self) -> list[tuple[int, bytes]]:
        return [(s, cf.to_bytes()) for s, cf in sorted(self.shards.items())]

    @classmethod
    def from_rows(cls, n_shards: int, rows) -> "ShardedCuckoo":
        return cls(
            n_shards=n_shards,
            shards={int(s): CuckooFilter.from_bytes(bytes(b)) for s, b in rows},
        )
