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


_FP_TAB: np.ndarray | None = None


def _fp_table() -> np.ndarray:
    """All 2^16 `_fp_hash` values as one uint64 array (lazy, ~512 KB,
    built once per process in ~50 ms). Fingerprints are 16-bit, so the
    alternate-bucket hash is a table lookup instead of a per-key
    blake2b — byte-identical values (pinned by tests)."""
    global _FP_TAB  # noqa: PLW0603
    if _FP_TAB is None:
        buf = bytearray(65536 * 8)
        blake2b = hashlib.blake2b
        for fp in range(65536):
            buf[fp * 8 : fp * 8 + 8] = blake2b(
                fp.to_bytes(2, "big"), digest_size=8
            ).digest()
        _FP_TAB = np.frombuffer(bytes(buf), dtype=">u8").astype(np.uint64)
    return _FP_TAB


def hash_batch(keys) -> tuple[np.ndarray, np.ndarray]:
    """(h64, fingerprint) arrays for a whole batch — byte-identical to
    per-key `_h64(key)` / `_fingerprint(key)`, but the digests land in
    two buffers decoded with single big-endian `np.frombuffer` calls
    (the bloom `_h128_batch` pattern). The two C-speed blake2b calls
    per key remain the floor."""
    n = len(keys)
    buf_h = bytearray(n * 8)
    buf_f = bytearray(n * 8)
    blake2b = hashlib.blake2b
    salt0 = b"\0" * 16
    salt_fp = b"fp".ljust(16, b"\0")
    for i, key in enumerate(keys):
        enc = key.encode("utf-8")
        buf_h[i * 8 : i * 8 + 8] = blake2b(
            enc, digest_size=8, salt=salt0
        ).digest()
        buf_f[i * 8 : i * 8 + 8] = blake2b(
            enc, digest_size=8, salt=salt_fp
        ).digest()
    h = np.frombuffer(bytes(buf_h), dtype=">u8").astype(np.uint64)
    fp = (
        np.frombuffer(bytes(buf_f), dtype=">u8") & np.uint64(0xFFFF)
    ).astype(np.uint16)
    fp[fp == 0] = 1  # 0 means empty, exactly like _fingerprint
    return h, fp


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
        return self._add_hashed(fp, i1, i2)

    def _add_hashed(self, fp: int, i1: int, i2: int) -> bool:
        """`add` past the hashing: identical control flow, with the
        eviction chain's alternate-bucket hash served by `_fp_table`
        (same values as `_fp_hash`, no per-victim blake2b)."""
        if fp in self.table[i1] or fp in self.table[i2]:
            self.n_items += 1  # counting duplicates is fine for load
            return True
        if self._try_put(i1, fp) or self._try_put(i2, fp):
            self.n_items += 1
            return True
        # evict: bounded displacement chain, deterministic victim
        tab = _fp_table()
        i = i2
        for kick in range(MAX_KICKS):
            slot = (fp + kick) % SLOTS
            victim = int(self.table[i][slot])
            self.table[i][slot] = fp
            fp = victim
            i = (i ^ int(tab[fp])) & (self.n_buckets - 1)
            if self._try_put(i, fp):
                self.n_items += 1
                return True
        return False

    def add_many(self, keys) -> bool:
        """Bulk insert with batch hashing (the slot/eviction logic is
        inherently sequential — the win is one buffer decode + the fp
        table instead of ~4 blake2b per key). Table contents are
        IDENTICAL to N `add` calls in the same order. False = some
        insert failed (table full); callers must grow/flush."""
        if len(keys) == 0:
            return True
        h, fps = hash_batch(keys)
        mask = self.n_buckets - 1
        i1s = (h & np.uint64(mask)).astype(np.int64)
        i2s = ((i1s.astype(np.uint64) ^ _fp_table()[fps]) & np.uint64(mask)).astype(np.int64)
        ok = True
        for fp, i1, i2 in zip(fps.tolist(), i1s.tolist(), i2s.tolist()):
            ok = self._add_hashed(fp, i1, i2) and ok
        return ok

    def might_contain(self, key: str) -> bool:
        fp, i1, i2 = self._buckets_for(key)
        return bool(fp in self.table[i1] or fp in self.table[i2])

    def might_contain_batch(self, h: np.ndarray, fps: np.ndarray) -> np.ndarray:
        """Batch membership for pre-hashed keys (bool array): both
        candidate rows gathered per key, one vectorized compare — same
        answers as `might_contain` (pinned by tests)."""
        if len(h) == 0:
            return np.zeros(0, dtype=bool)
        mask = np.uint64(self.n_buckets - 1)
        i1 = (h & mask).astype(np.int64)
        i2 = ((i1.astype(np.uint64) ^ _fp_table()[fps]) & mask).astype(np.int64)
        want = fps.astype(np.uint16)[:, None]
        return np.any(self.table[i1] == want, axis=1) | np.any(
            self.table[i2] == want, axis=1
        )

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
        """Batch membership, vectorized per shard — the cuckoo twin of
        `ShardedBloom.might_contain_many`: one batch shard-assignment
        pass, one batch hash pass, then each PRESENT shard answers its
        group with one gathered-row compare. No dense per-shard stack;
        per-shard geometry stays free to differ; absent shards answer
        False, exactly like `might_contain`."""
        from .bloom import shard_of_many  # noqa: PLC0415

        n = len(keys)
        if n == 0:
            return np.zeros(0, dtype=bool)
        if not isinstance(keys, list):
            keys = list(keys)
        sh = shard_of_many(keys, self.n_shards)
        h, fps = hash_batch(keys)
        out = np.zeros(n, dtype=bool)
        for s in np.unique(sh):
            cf = self.shards.get(int(s))
            if cf is None:
                continue
            idx = np.nonzero(sh == s)[0]
            out[idx] = cf.might_contain_batch(h[idx], fps[idx])
        return out

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
