"""Property-based tests (hypothesis) for the pure frontier kernels.

These hold for ANY input, not just the synthetic corpus — the
invariants the distributed design leans on:
- canonicalization is idempotent (a canonical url re-canonicalizes to
  itself, so the URL-seen key is stable across rounds),
- the bloom filter NEVER false-negatives (a dropped frontier row would
  be an unfetched filing — the one unacceptable failure),
- shard assignment is total and stable,
- the token bucket never exceeds its rate over any window,
- n-gram/jaccard column semantics match their python definitions.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from edgar_crawler_spark.frontier.bloom import BloomFilter, shard_of
from edgar_crawler_spark.frontier.canon import canonicalize_url_py
from edgar_crawler_spark.frontier.politeness import TokenBucket

url_st = st.from_regex(
    r"https?://[A-Za-z0-9.\-]{1,20}(:\d{1,5})?/[A-Za-z0-9/._\-]{0,40}(\?[A-Za-z0-9=&]{0,20})?(#[A-Za-z0-9]{0,10})?",
    fullmatch=True,
)


class TestCanonProperties:
    @given(url_st)
    @settings(max_examples=300, deadline=None)
    def test_idempotent(self, url):
        once = canonicalize_url_py(url)
        assert canonicalize_url_py(once) == once

    @given(url_st)
    @settings(max_examples=300, deadline=None)
    def test_no_fragment_and_lower_host(self, url):
        c = canonicalize_url_py(url)
        assert "#" not in c
        host = c.split("://", 1)[-1].split("/", 1)[0]
        assert host == host.lower()


class TestBloomProperties:
    @given(st.lists(st.text(min_size=1, max_size=40), min_size=1, max_size=200))
    @settings(max_examples=50, deadline=None)
    def test_never_false_negative(self, keys):
        bf = BloomFilter.empty(len(keys), fpp=0.05)
        bf.add_many(keys)
        assert all(bf.might_contain(k) for k in keys)

    @given(st.text(min_size=1, max_size=60), st.integers(min_value=1, max_value=64))
    @settings(max_examples=200, deadline=None)
    def test_shard_total_and_stable(self, key, n):
        s = shard_of(key, n)
        assert 0 <= s < n
        assert shard_of(key, n) == s


class TestTokenBucketProperties:
    @given(
        st.floats(min_value=0.1, max_value=100.0),
        st.integers(min_value=2, max_value=200),
    )
    @settings(max_examples=50, deadline=None)
    def test_rate_never_exceeded(self, rate, n):
        tb = TokenBucket(rate=rate, burst=1.0)
        times = [tb.acquire() for _ in range(n)]
        assert times == sorted(times)
        # over any window, sends <= burst + rate * window
        for i in range(len(times)):
            for j in range(i + 1, len(times)):
                window = times[j] - times[i]
                sends = j - i + 1
                assert sends <= 1.0 + rate * window + 1e-6


class TestTopKMergeProperties:
    """The streaming frontier top-k state kernel
    (streaming/stateful.py:_topk_merge). The operator's exactly-right
    semantics rest on one algebraic fact: folding batches through a
    k-bounded state equals one global pass — otherwise a restart or a
    different micro-batch slicing would change the dispatch order."""

    pairs_st = st.lists(
        st.tuples(
            st.sampled_from([f"u{i}" for i in range(8)]),  # force dups
            st.integers(min_value=-50, max_value=50).map(float),
        ),
        max_size=40,
    )

    @given(pairs_st, st.integers(min_value=1, max_value=5))
    @settings(max_examples=200, deadline=None)
    def test_bounded_sorted_keep_best(self, pairs, k):
        from edgar_crawler_spark.streaming.stateful import _topk_merge

        best = _topk_merge(list(pairs), k)
        assert len(best) <= k
        assert len({u for u, _ in best}) == len(best)  # unique urls
        assert best == sorted(best, key=lambda t: (-t[1], t[0]))
        mx = {}
        for u, p in pairs:
            mx[u] = max(mx.get(u, p), p)
        for u, p in best:
            assert p == mx[u]  # keep-best per url
        # exactly the k best of the deduped set
        want = sorted(mx.items(), key=lambda t: (-t[1], t[0]))[:k]
        assert best == want

    @given(pairs_st, pairs_st, st.integers(min_value=1, max_value=5))
    @settings(max_examples=200, deadline=None)
    def test_incremental_merge_equals_global(self, a, b, k):
        from edgar_crawler_spark.streaming.stateful import _topk_merge

        incremental = _topk_merge(_topk_merge(list(a), k) + list(b), k)
        assert incremental == _topk_merge(list(a) + list(b), k)


class TestRecrawlFoldLaws:
    """Pure-kernel laws for the streaming re-crawl estimator
    (streaming/stateful.py:_recrawl_fold)."""

    @given(
        obs=st.lists(
            st.integers(min_value=0, max_value=10**9), min_size=0,
            max_size=60,
        ),
        cuts=st.lists(
            st.integers(min_value=0, max_value=60), min_size=0, max_size=4
        ),
    )
    @settings(max_examples=200, deadline=None)
    def test_any_micro_batch_slicing_equals_global_fold(self, obs, cuts):
        from edgar_crawler_spark.streaming.stateful import _recrawl_fold

        obs = sorted(obs)  # the operator sorts within batch; order is
        # guaranteed ACROSS batches by the time-ordered source
        whole = _recrawl_fold(obs, (0, 0, None, None, 0))
        bounds = sorted({min(c, len(obs)) for c in cuts} | {0, len(obs)})
        st_acc = (0, 0, None, None, 0)
        for a, b in zip(bounds, bounds[1:]):
            st_acc = _recrawl_fold(obs[a:b], st_acc)
        assert st_acc == whole

    @given(
        obs=st.lists(
            st.integers(min_value=0, max_value=10**9), min_size=2,
            max_size=60, unique=True,
        )
    )
    @settings(max_examples=200, deadline=None)
    def test_statistics_invariants(self, obs):
        from edgar_crawler_spark.streaming.stateful import _recrawl_fold

        obs = sorted(obs)
        n, x, last_v, last_sec, sum_gap = _recrawl_fold(
            obs, (0, 0, None, None, 0)
        )
        assert n == len(obs) - 1
        assert 0 <= x <= n
        assert sum_gap == obs[-1] - obs[0]
        assert last_sec == obs[-1] and last_v == obs[-1] // 86400
        # change count equals the day-boundary crossings exactly
        days = [s // 86400 for s in obs]
        assert x == sum(1 for a, b in zip(days, days[1:]) if a != b)
