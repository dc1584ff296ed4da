"""Mergeable sketches: HyperLogLog distinct counting.

Built from first principles (Flajolet et al. 2007) so that any two
engines — or any two PARTITIONS — derive bit-identical registers from
the same values:

  h      = 60-bit md5 prefix of the value (15 hex chars, fits BIGINT)
  bucket = h mod m          (m = 2^p registers)
  rho    = leading-zero rank of the remaining 51 bits + 1, computed
           INTEGER-EXACTLY as 52 - bitlen(h div m) via the length of
           the base-2 string (never float log2, whose edge cases at
           powers of two differ across libms)
  M[b]   = max(rho) over values in bucket b

Registers are the mergeable state: max() is associative/commutative/
idempotent, so partial registers combine map-side and ACROSS datasets
— union-then-sketch equals sketch-then-max-merge (property-tested).
The indicator sum for the estimate stays in integer space (each term
2^(52-rho) is an exact BIGINT), making the estimate independent of
partition order; the only float ops are the final division and the
small-range ln correction.

At 100 TB: the register table is m rows regardless of corpus size —
a shuffle of KBs — which is how distinct URLs are counted on a
10^10-URL frontier where exact distinct is a full shuffle of the key
space.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_P = 9                 # registers = 2^9 = 512
HLL_M = 1 << HLL_P
# alpha_m for m >= 128; computed once in Python so the double constant
# is identical wherever it is re-used (decimal SQL literals parse as
# DECIMAL with engine-specific scales — see queries.py).
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def hll_registers(values: DataFrame, col: str = "t") -> DataFrame:
    """(bucket, reg) registers of the HLL sketch of `values[col]`.
    Map-side partial max; at most HLL_M rows out."""
    h = F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    # exact integer h // m: `/` goes through DOUBLE, and for h >= 2^53
    # (half the 60-bit hash space) the rounded quotient can truncate to
    # h//m + 1 when w crosses a bit-length boundary — breaking the
    # bit-identical register contract vs hll_registers_py / DuckDB.
    w = F.shiftright(F.col("h"), HLL_P)  # h // 2^p, h >= 0
    bitlen = F.length(F.conv(w.cast("string"), 10, 2))
    rho = F.when(w == 0, F.lit(52)).otherwise(F.lit(52) - bitlen)
    hashed = values.select(h.alias("h")).select(
        (F.col("h") % HLL_M).alias("bucket"), rho.alias("rho")
    )
    return hashed.groupBy("bucket").agg(F.max("rho").alias("reg"))


def hll_registers_by(
    values: DataFrame, group_cols: list[str], col: str = "t"
) -> DataFrame:
    """Grouped registers: one HLL sketch PER group key — at most
    |groups| x HLL_M rows out (register-table-sized per group, never
    corpus-sized). The per-group sketches merge across partitions
    map-side exactly like the global one."""
    h = F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    w = F.shiftright(F.col("_h"), HLL_P)
    bitlen = F.length(F.conv(w.cast("string"), 10, 2))
    rho = F.when(w == 0, F.lit(52)).otherwise(F.lit(52) - bitlen)
    hashed = values.select(*group_cols, h.alias("_h")).select(
        *group_cols, (F.col("_h") % HLL_M).alias("bucket"), rho.alias("rho")
    )
    return hashed.groupBy(*group_cols, "bucket").agg(F.max("rho").alias("reg"))


def hll_estimate_by(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Per-group (v_zero, s_int, raw_est, est) from grouped registers
    (same integer-exact indicator sum as hll_estimate_cols)."""
    term = F.pow(F.lit(2.0), F.lit(52) - F.col("reg")).cast("long")
    s = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(term).alias("sum_present"),
    ).select(
        *group_cols,
        (F.col("sum_present")
         + (F.lit(HLL_M) - F.col("n_present")) * F.lit(1 << 52)).alias("s_int"),
        (F.lit(HLL_M) - F.col("n_present")).alias("v_zero"),
    )
    raw = (
        F.lit(HLL_ALPHA) * HLL_M * HLL_M * F.lit(float(1 << 52)) / F.col("s_int")
    )
    est = F.when(
        (raw <= 2.5 * HLL_M) & (F.col("v_zero") > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("v_zero")),
    ).otherwise(raw)
    return s.select(
        *group_cols,
        F.col("v_zero").cast("long").alias("v_zero"),
        "s_int",
        F.round(raw, 4).alias("raw_est"),
        F.round(est, 4).alias("est"),
    )


def hll_merge(*register_sets: DataFrame) -> DataFrame:
    """Max-merge register tables — the sketch of the UNION of the
    underlying datasets, without revisiting them."""
    out = register_sets[0]
    for r in register_sets[1:]:
        out = out.unionByName(r)
    return out.groupBy("bucket").agg(F.max("reg").alias("reg"))


def hll_estimate_cols(regs: DataFrame) -> DataFrame:
    """One row: (v_zero, s_int, raw_est, est) from a register table.
    s_int is the integer indicator sum scaled by 2^52 (exact)."""
    term = F.pow(F.lit(2.0), F.lit(52) - F.col("reg")).cast("long")
    s = regs.agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(term).alias("sum_present"),
    ).select(
        (F.col("sum_present")
         + (F.lit(HLL_M) - F.col("n_present")) * F.lit(1 << 52)).alias("s_int"),
        (F.lit(HLL_M) - F.col("n_present")).alias("v_zero"),
    )
    raw = (
        F.lit(HLL_ALPHA) * HLL_M * HLL_M * F.lit(float(1 << 52)) / F.col("s_int")
    )
    est = F.when(
        (raw <= 2.5 * HLL_M) & (F.col("v_zero") > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("v_zero")),
    ).otherwise(raw)
    return s.select(
        F.col("v_zero").cast("long").alias("v_zero"),
        "s_int",
        F.round(raw, 4).alias("raw_est"),
        F.round(est, 4).alias("est"),
    )


def hll_registers_py(values: list[str]) -> dict[int, int]:
    """Pure-Python mirror of hll_registers — the in-process oracle for
    property tests."""
    import hashlib

    regs: dict[int, int] = {}
    for v in values:
        h = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
        bucket, w = h % HLL_M, h // HLL_M
        rho = 52 if w == 0 else 52 - w.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005): mergeable frequency
# counters. The dual of HLL above — HLL answers "how many distinct",
# CMS answers "how often does THIS key occur" with one-sided error
# (never under, over by at most eps*N with prob 1-delta). Same
# cross-engine hash contract: row-i hash of value v is the 60-bit md5
# prefix of "i:v", bucket = h mod CMS_W, so DuckDB derives
# bit-identical counters from the same stream.
#
# At 100 TB: counters are CMS_D x CMS_W BIGINTs regardless of stream
# size, sums combine map-side and ACROSS shards/days (sketch of a
# union = elementwise sum of sketches) — how per-token / per-host
# frequencies are tracked on a 10^10-URL frontier where an exact
# count table IS the shuffle you are trying to avoid.
# ---------------------------------------------------------------------------

CMS_D = 4     # hash rows (delta = e^-4 ~ 1.8%)
CMS_W = 256   # buckets per row (eps = e/256 ~ 1.1% of stream mass)

# Kirsch-Mitzenmacher double hashing: ONE strong hash per occurrence,
# row-i bucket = (h1 + i*h2) mod W with h1 = low 30 bits and h2 = high
# 30 bits forced odd. KM 2006 prove the scheme preserves the
# asymptotic error bounds of i independent hash functions (stated for
# Bloom filters; the same argument covers CMS rows). The first cut of
# this sketch hashed md5("i:" + v) per row — 4 full md5+concat
# evaluations per occurrence — and the 100x probe clocked it at 39x
# (209s): the hash, not the aggregate, was the whole bill. One md5 +
# three adds costs the same as the HLL path and keeps the cross-engine
# contract (pure integer arithmetic both engines; all intermediates
# < 2^32, far from BIGINT overflow — which DuckDB raises on and Java
# silently wraps, so staying small is a correctness matter, not style).


def _cms_buckets(col) -> Column:
    """Array of CMS_D bucket ids for one value (KM double hashing)."""
    h = F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    h1 = h % F.lit(1 << 30)
    h2 = F.shiftright(h, 30).bitwiseOR(F.lit(1))
    return F.array(*[
        ((h1 + F.lit(i) * h2) % CMS_W) for i in range(CMS_D)
    ])


def cms_counters(values: DataFrame, col: str = "t") -> DataFrame:
    """(row, bucket, cnt) counters of the CMS of the `values[col]`
    stream (with multiplicity). Each occurrence increments one bucket
    per hash row; the groupBy combines map-side, so the shuffled state
    is at most CMS_D x CMS_W rows per partition."""
    occ = values.select(
        F.posexplode(_cms_buckets(F.col(col))).alias("row", "bucket")
    )
    return occ.groupBy("row", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_merge(*counter_sets: DataFrame) -> DataFrame:
    """Elementwise sum — the sketch of the concatenated streams."""
    out = counter_sets[0]
    for c in counter_sets[1:]:
        out = out.unionByName(c)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(counters: DataFrame, probes: DataFrame,
                 col: str = "t") -> DataFrame:
    """Point-query estimates: per probe value, min over the CMS_D
    counters it hashes into (absent bucket = 0). `counters` is
    sketch-sized (<= CMS_D*CMS_W rows) and broadcasts; the probe set
    never shuffles on a data-sized key."""
    pb = probes.select(
        F.col(col),
        F.posexplode(_cms_buckets(F.col(col))).alias("row", "bucket"),
    )
    joined = pb.join(F.broadcast(counters), ["row", "bucket"], "left")
    return joined.groupBy(col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_cnt")
    )


def cms_counters_py(values: list[str]) -> dict[tuple[int, int], int]:
    """Pure-Python mirror of cms_counters for property tests."""
    import hashlib

    cnt: dict[tuple[int, int], int] = {}
    for v in values:
        h = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
        h1, h2 = h % (1 << 30), (h >> 30) | 1
        for i in range(CMS_D):
            key = (i, (h1 + i * h2) % CMS_W)
            cnt[key] = cnt.get(key, 0) + 1
    return cnt


# ---------------------------------------------------------------------------
# Moments sketch (Gan et al., VLDB 2018): mergeable quantile summaries.
# The third mergeable family beside HLL (distinct) and CMS (frequency):
# state per group is the power sums (n, Sx, Sx2, Sx3) of the
# LOG-transformed value — the paper's variant for long-tailed data,
# which also keeps every intermediate O(10^1) so double arithmetic is
# far from the 2^53 exactness cliff (raw char-count 4th powers are not).
# Power sums ADD across partitions/shards/days; quantiles come out of
# the moments via a Cornish-Fisher expansion (z + (z^2-1)*skew/6),
# back-transformed with exp. The paper solves a maximum-entropy
# problem instead; Cornish-Fisher is the closed-form deterministic
# stand-in that keeps the cross-engine contract trivial.
# ---------------------------------------------------------------------------

Z90 = 1.2815515655446004  # Phi^-1(0.9), scipy.stats.norm.ppf reference


def moment_sums_by(
    values: DataFrame, group_cols: list[str], col: str = "x"
) -> DataFrame:
    """Per-group power sums of ln(1+value): (n, s1, s2, s3) — the
    whole mergeable state, 4 doubles per group."""
    x = F.log(F.lit(1.0) + F.col(col))
    return values.select(*group_cols, x.alias("_x")).groupBy(
        *group_cols
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("s1"),
        F.sum(F.col("_x") * F.col("_x")).alias("s2"),
        F.sum(F.col("_x") * F.col("_x") * F.col("_x")).alias("s3"),
    )


def moment_merge(*sum_sets: DataFrame) -> DataFrame:
    """Elementwise sums — the sketch of the union of the datasets."""
    out = sum_sets[0]
    for s in sum_sets[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c not in ("n", "s1", "s2", "s3")]
    return out.groupBy(*keys).agg(
        F.sum("n").alias("n"), F.sum("s1").alias("s1"),
        F.sum("s2").alias("s2"), F.sum("s3").alias("s3"),
    )


def moment_quantile_cols(z: float) -> "Column":
    """Cornish-Fisher quantile of the ORIGINAL value from log-moments
    columns (n, s1, s2, s3): exp(mu + sigma*(z + (z^2-1)*skew/6)) - 1.
    Callers round; identical arithmetic runs in the SQL oracle."""
    mu = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n") - mu * mu
    m3 = (
        F.col("s3") / F.col("n")
        - F.lit(3.0) * mu * (F.col("s2") / F.col("n"))
        + F.lit(2.0) * mu * mu * mu
    )
    sd = F.sqrt(m2)
    skew = m3 / (sd * sd * sd)
    zc = F.lit(z) + (F.lit(z * z) - F.lit(1.0)) * skew / F.lit(6.0)
    return F.exp(mu + sd * zc) - F.lit(1.0)
