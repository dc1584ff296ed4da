"""Custom Python DataSource (Spark 4 API): EDGAR index connector with
partition planning + filter pushdown (sources/pyds.py)."""

from __future__ import annotations

import io
import random
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from edgar_crawler_spark.sources.pyds import EdgarIndexDataSource


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(EdgarIndexDataSource)
    return spark


def _load(spark, quarters="2020Q1,2020Q2", n=200, seed=7):
    return (
        spark.read.format("edgar_index")
        .option("seed", seed)
        .option("rows_per_quarter", n)
        .option("quarters", quarters)
        .load()
    )


class TestEdgarIndexDataSource:
    def test_deterministic_rows_and_partitioning(self, registered):
        spark = registered
        df = _load(spark, "2020Q1,2020Q2,2021Q1", n=150)
        assert df.count() == 450
        # one input split per quarter
        assert df.rdd.getNumPartitions() == 3
        # deterministic: same options -> identical content
        a = sorted(map(tuple, df.collect()))
        b = sorted(map(tuple, _load(spark, "2020Q1,2020Q2,2021Q1", n=150).collect()))
        assert a == b
        # reference link semantics: html_index = .txt -> -index.html
        r = df.first()
        assert r.complete_text_file_link.startswith(
            "https://www.sec.gov/Archives/edgar/data/"
        )
        assert r.html_index == r.complete_text_file_link[: -len(".txt")] + "-index.html"

    def test_filter_pushdown_type(self, registered):
        spark = registered
        df = _load(spark).filter(F.col("type") == "8-K")
        rows = df.collect()
        assert rows and all(r.type == "8-K" for r in rows)
        # the python mirror of the generator agrees exactly
        want = 0
        for y, q in [(2020, 1), (2020, 2)]:
            rng = random.Random(7 * 10_000 + y * 10 + q)
            for i in range(200):
                rng.randint(1000, 9999999)
                form = rng.choice(["8-K", "10-K", "10-Q", "4", "S-1"])
                rng.randint(1, 28)
                rng.randint(1, 3)
                if form == "8-K":
                    want += 1
        assert len(rows) == want

    def test_quarter_pruning_drops_partitions(self, registered):
        spark = registered
        df = _load(spark, "2020Q1,2020Q2,2021Q1", n=100).filter(
            (F.col("year") == 2020) & (F.col("quarter") == 2)
        )
        assert df.count() == 100
        assert set((r.year, r.quarter) for r in df.collect()) == {(2020, 2)}
        # pruning is REAL: the pushed year+quarter predicates drop the
        # other two splits at planning time (content-only checks would
        # also pass if pushFilters silently yielded everything back)
        assert df.rdd.getNumPartitions() == 1

    def test_unsupported_filter_still_correct(self, registered):
        spark = registered
        # company LIKE is not pushed; Spark must evaluate it post-scan
        df = _load(spark).filter(F.col("company").startswith("COMPANY 1"))
        rows = df.collect()
        assert all(r.company.startswith("COMPANY 1") for r in rows)
        total = _load(spark).count()
        assert 0 < len(rows) < total


class TestPushFilterConjunction:
    """ADVICE r02: conjunctive predicates on the same column must
    INTERSECT, not overwrite — the earlier filter is consumed (never
    yielded back to Spark), so dropping it returns wrong rows."""

    def _reader(self):
        from edgar_crawler_spark.sources.pyds import EdgarIndexReader

        return EdgarIndexReader(
            {"seed": "7", "rows_per_quarter": "50", "quarters": "2020Q1"}
        )

    def test_equalto_then_in_intersects(self):
        from pyspark.sql.datasource import EqualTo, In

        r = self._reader()
        leftover = list(
            r.pushFilters(
                [EqualTo(("type",), "10-K"), In(("type",), ("10-K", "8-K"))]
            )
        )
        assert leftover == []  # both consumed
        assert r._type_pred == {"10-K"}  # intersection, not the In set

    def test_in_then_equalto_intersects(self):
        from pyspark.sql.datasource import EqualTo, In

        r = self._reader()
        list(r.pushFilters([In(("cik",), ("1", "2")), EqualTo(("cik",), "2")]))
        assert r._cik_pred == {"2"}

    def test_disjoint_conjunction_yields_empty_scan(self):
        from pyspark.sql.datasource import EqualTo

        r = self._reader()
        list(r.pushFilters([EqualTo(("type",), "10-K"), EqualTo(("type",), "8-K")]))
        assert r._type_pred == set()
        assert not list(r.read(r.partitions()[0]))

    def test_end_to_end_two_filters_same_column(self, registered):
        spark = registered
        # chained .filter calls -> conjunctive predicates over `type`
        df = (
            _load(spark)
            .filter(F.col("type") == "10-K")
            .filter(F.col("type").isin("10-K", "8-K"))
        )
        rows = df.collect()
        assert rows and all(r.type == "10-K" for r in rows)
        # and matches the un-pushed evaluation exactly
        base = [
            r for r in _load(spark).collect()
            if r.type == "10-K" and r.type in ("10-K", "8-K")
        ]
        assert sorted(map(tuple, rows)) == sorted(map(tuple, base))

    def test_in_filter_pushdown_isin(self, registered):
        spark = registered
        # regression: In.value (not .values) — .isin() pushed as In
        df = _load(spark).filter(F.col("type").isin("10-K", "8-K"))
        rows = df.collect()
        assert rows and all(r.type in ("10-K", "8-K") for r in rows)
        total = _load(spark).count()
        assert len(rows) < total
