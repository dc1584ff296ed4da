"""Cuckoo filter tests: the deletable URL-seen variant."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from edgar_crawler_spark.frontier.cuckoo import CuckooFilter, ShardedCuckoo
from edgar_crawler_spark.frontier.seen import build_sharded_cuckoo, filter_unseen
from tests.test_frontier import _frontier_df


class TestCuckooCore:
    def test_add_contains_delete(self):
        cf = CuckooFilter.empty(5000)
        keys = [f"https://www.sec.gov/Archives/{i}.txt" for i in range(5000)]
        assert all(cf.add(k) for k in keys)
        assert all(cf.might_contain(k) for k in keys)
        # fpp bound: b=4, f=16 → ~0.1%
        probes = [f"https://other/{i}" for i in range(20000)]
        fp = sum(cf.might_contain(p) for p in probes) / len(probes)
        assert fp < 0.005
        # delete really removes (no residual positives beyond fpp)
        removed = keys[::10]
        for k in removed:
            assert cf.delete(k)
        still = sum(cf.might_contain(k) for k in removed) / len(removed)
        assert still < 0.01
        # untouched keys unaffected
        kept = [k for k in keys if k not in set(removed)]
        assert all(cf.might_contain(k) for k in kept)

    def test_high_load_eviction(self):
        cf = CuckooFilter.empty(1000)
        keys = [f"k{i}" for i in range(950)]
        assert all(cf.add(k) for k in keys)  # ~93% of slots: evictions happen
        assert all(cf.might_contain(k) for k in keys)

    def test_roundtrip_and_merge(self):
        a, b = CuckooFilter.empty(2000), CuckooFilter.empty(2000)
        ka = [f"a{i}" for i in range(500)]
        kb = [f"b{i}" for i in range(500)]
        for k in ka:
            a.add(k)
        for k in kb:
            b.add(k)
        a2 = CuckooFilter.from_bytes(a.to_bytes())
        a2.merge(b)
        assert all(a2.might_contain(k) for k in ka + kb)

    @given(st.lists(st.text(min_size=1, max_size=30), min_size=1, max_size=100,
                    unique=True))
    @settings(max_examples=50, deadline=None)
    def test_never_false_negative(self, keys):
        cf = CuckooFilter.empty(max(len(keys) * 2, 64))
        for k in keys:
            assert cf.add(k)
        assert all(cf.might_contain(k) for k in keys)

    def test_vectorized_paths_bit_identical(self):
        """add_many / might_contain_many are vectorized (batch blake2b
        decode + the 2^16 fp-hash table); they must be BIT-identical to
        the per-key add / might_contain loops — including eviction
        chains under high load, duplicate keys inside one batch, absent
        shards (answer False), and shards with different geometry."""
        import numpy as np

        from edgar_crawler_spark.frontier.bloom import shard_of
        from edgar_crawler_spark.frontier.cuckoo import (
            _fingerprint,
            _fp_hash,
            _fp_table,
            _h64,
            hash_batch,
        )

        # the fp-hash table IS _fp_hash, for every 16-bit value class
        tab = _fp_table()
        for fp in (0, 1, 2, 7, 255, 256, 32767, 65535, 12345):
            assert int(tab[fp]) == _fp_hash(fp)

        # batch hashing == per-key hashing (incl. empty/unicode/long)
        keys = [f"https://host{i % 7}.example/p/{i}" for i in range(3000)]
        keys += ["", "é∆-unicode", "a" * 500, keys[0], keys[1]]  # dups too
        h, fps = hash_batch(keys)
        for i in (0, 1, 2999, 3000, 3001, 3002, 3003, 3004):
            assert int(h[i]) == _h64(keys[i])
            assert int(fps[i]) == _fingerprint(keys[i])

        # bulk insert == sequential insert, same order, with evictions
        # (~93% load) — table bytes identical
        cf_loop = CuckooFilter.empty(3200)
        cf_vec = CuckooFilter.empty(3200)
        for k in keys:
            assert cf_loop.add(k)
        assert cf_vec.add_many(keys)
        assert np.array_equal(cf_loop.table, cf_vec.table)
        assert cf_loop.n_items == cf_vec.n_items

        # sharded batch membership == per-key, absent shard answers False
        shards: dict[int, CuckooFilter] = {}
        for k in keys:
            shards.setdefault(shard_of(k, 16), CuckooFilter.empty(600)).add(k)
        del shards[sorted(shards)[3]]
        sc = ShardedCuckoo(16, shards)
        probe = keys + [f"unseen-{i}" for i in range(3000)]
        assert sc.might_contain_many(probe).tolist() == [
            sc.might_contain(k) for k in probe
        ]
        assert sc.might_contain_many([]).shape == (0,)

        # heterogeneous shard geometry
        het = ShardedCuckoo(
            4, {0: CuckooFilter.empty(64), 1: CuckooFilter.empty(9999)}
        )
        het.shards[0].add("x")
        het.shards[1].add("y")
        pr = ["x", "y", "z", "w"]
        assert het.might_contain_many(pr).tolist() == [
            het.might_contain(k) for k in pr
        ]
        assert CuckooFilter.empty(64).add_many([])  # empty batch no-op


class TestCuckooSpark:
    def test_distributed_build_and_filter(self, spark):
        frontier = _frontier_df(spark, 300, seed=2)
        seen = frontier.sample(0.4, seed=9).select("url").cache()
        ck = build_sharded_cuckoo(seen.repartition(5), n_shards=4)
        got = sorted(
            r.url for r in filter_unseen(frontier, seen, ck).select("url").collect()
        )
        want = sorted(
            r.url
            for r in frontier.join(seen, "url", "left_anti").select("url").collect()
        )
        assert got == want

    def test_requeue_delete_path(self, spark):
        """The persisted-filter requeue story: deleting failed urls
        from the cuckoo re-opens them without a rebuild."""
        frontier = _frontier_df(spark, 100, seed=6)
        urls = [r.url for r in frontier.select("url").collect()]
        ck = build_sharded_cuckoo(frontier.select("url"), n_shards=4)
        assert all(ck.might_contain(u) for u in urls)
        failed = urls[:10]
        for u in failed:
            assert ck.delete(u)
        # deleted urls pre-filter as unseen again (≤ fpp residue)...
        assert sum(ck.might_contain(u) for u in failed) <= 1
        # ...while every other url still pre-filters as seen
        assert all(ck.might_contain(u) for u in urls[10:])
