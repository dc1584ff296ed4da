"""EDGAR master-index as a first-class Spark data source.

Spark 4's Python DataSource API lets a connector participate in query
planning — partition planning (one input split per EDGAR quarter, so
a year/quarter predicate prunes whole splits before any work) and
filter pushdown (`pushFilters`: Type/CIK equality evaluates inside
the source, Spark never sees the dropped rows). Register once per
session, then:

    spark.dataSource.register(EdgarIndexDataSource)
    df = (spark.read.format("edgar_index")
          .option("seed", 7).option("rows_per_quarter", 1000)
          .option("quarters", "2020Q1,2020Q2,2021Q1")
          .load())

Rows mirror the reference's trimmed `master.idx` semantics
(/root/reference/download_filings.py:226-307): 5 physical columns
plus the synthesized `html_index` (.txt -> -index.html), both link
columns already `https://www.sec.gov/Archives/`-prefixed, and
(year, quarter) as explicit partition-provenance columns. The
generator is the same deterministic scheme as
`edgar_index.write_synthetic_index` (no network in this sandbox; on
a real deployment `read()` would fetch+trim its quarter's file —
one HTTP fetch per input split, the natural unit of retry).
"""

from __future__ import annotations

import random
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
)

INDEX_DS_SCHEMA = (
    "cik string, company string, type string, date string, "
    "complete_text_file_link string, html_index string, "
    "year int, quarter int"
)

_ARCHIVE_PREFIX = "https://www.sec.gov/Archives/"
_FORMS = ["8-K", "10-K", "10-Q", "4", "S-1"]


class QuarterPartition(InputPartition):
    def __init__(self, year: int, quarter: int, seed: int, n: int):
        self.year = year
        self.quarter = quarter
        self.seed = seed
        self.n = n


class EdgarIndexReader(DataSourceReader):
    def __init__(self, options):
        self.seed = int(options.get("seed", 7))
        self.n = int(options.get("rows_per_quarter", 100))
        quarters = options.get("quarters", "2020Q1")
        self.quarters = []
        for q in quarters.split(","):
            y, qq = q.strip().upper().split("Q")
            self.quarters.append((int(y), int(qq)))
        # filters accepted by pushFilters, applied inside read()
        self._type_pred = None   # set of allowed form types
        self._cik_pred = None    # set of allowed ciks

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Accept Type/CIK equality+IN and (year, quarter) equality —
        the latter by dropping whole partitions, the EDGAR analog of
        partition pruning."""
        def narrow(cur: set | None, new: set) -> set:
            # conjunctive semantics: a second predicate on the same
            # column INTERSECTS the first (EqualTo('10-K') then
            # In('10-K','8-K') must keep only '10-K'); overwriting would
            # silently drop the consumed earlier filter and return rows
            # that violate it.
            return new if cur is None else cur & new

        for f in filters:
            col = f.attribute[0] if isinstance(f.attribute, tuple) else f.attribute
            if isinstance(f, EqualTo) and col == "type":
                self._type_pred = narrow(self._type_pred, {f.value})
            elif isinstance(f, In) and col == "type":
                # In.value is the tuple of values (there is no .values
                # attribute on the dataclass)
                self._type_pred = narrow(self._type_pred, set(f.value))
            elif isinstance(f, EqualTo) and col == "cik":
                self._cik_pred = narrow(self._cik_pred, {f.value})
            elif isinstance(f, In) and col == "cik":
                self._cik_pred = narrow(self._cik_pred, set(f.value))
            elif isinstance(f, EqualTo) and col == "year":
                self.quarters = [q for q in self.quarters if q[0] == f.value]
            elif isinstance(f, EqualTo) and col == "quarter":
                self.quarters = [q for q in self.quarters if q[1] == f.value]
            else:
                yield f  # unsupported: Spark evaluates it post-scan

    def partitions(self) -> list[QuarterPartition]:
        return [
            QuarterPartition(y, q, self.seed, self.n) for y, q in self.quarters
        ]

    def read(self, part: QuarterPartition):
        # same deterministic scheme as edgar_index.write_synthetic_index
        rng = random.Random(part.seed * 10_000 + part.year * 10 + part.quarter)
        for i in range(part.n):
            cik = str(rng.randint(1000, 9999999))
            form = rng.choice(_FORMS)
            day = rng.randint(1, 28)
            month = 3 * (part.quarter - 1) + rng.randint(1, 3)
            date = f"{part.year}-{month:02d}-{day:02d}"
            acc = f"{int(cik):010d}-{part.year % 100:02d}-{i:06d}"
            txt = f"edgar/data/{cik}/{acc}.txt"
            row = (
                cik,
                f"COMPANY {cik}",
                form,
                date,
                _ARCHIVE_PREFIX + txt,
                _ARCHIVE_PREFIX + txt[: -len(".txt")] + "-index.html",
                part.year,
                part.quarter,
            )
            if self._type_pred is not None and row[2] not in self._type_pred:
                continue
            if self._cik_pred is not None and row[0] not in self._cik_pred:
                continue
            yield row


class EdgarIndexDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "edgar_index"

    def schema(self) -> str:
        return INDEX_DS_SCHEMA

    def reader(self, schema) -> EdgarIndexReader:
        return EdgarIndexReader(self.options)
