"""Extraction correctness: unit semantics, golden-fixture parity
(sampled for speed; the full 553-file run lives in tools/parity_8k.py),
and Spark-vs-in-process oracle equality."""

from __future__ import annotations

import csv
import json
import os
import zipfile

import pytest

from edgar_crawler_spark.extraction import ExtractionOptions, extract_filing
from edgar_crawler_spark.extraction.items import (
    ITEMS_8K,
    ITEMS_8K_OBSOLETE,
    catalog_for,
)
from edgar_crawler_spark.extraction.special import find_amounts, find_footnotes
from edgar_crawler_spark.extraction.textprep import (
    collapse_lines,
    flatten_html,
    normalize_text,
    style_property,
)

FIX = "/root/reference/tests/fixtures"
WORK = "/tmp/ecs_fixtures_t"


# ---------------------------------------------------------------------------
# unit: text prep
# ---------------------------------------------------------------------------

def test_flatten_injects_breaks():
    assert flatten_html("<div>a</div><p>b</p>") == "a\n\nb\n\n"
    assert flatten_html("<td>x</td><td>y</td>") == "x  y  "
    assert flatten_html("a<br>b") == "a\n\nb"


def test_collapse_lines():
    assert collapse_lines("a\n\n\nb\nc") == "a\nb c"
    assert collapse_lines("a    b") == "a b"


def test_normalize_header_repair():
    # letters re-joined; the original separator run is preserved
    assert normalize_text("\nI T E M  7 follows") == "\nITEM  7 follows"
    assert normalize_text("\n P A R T  II x") == "\n PART  II x"
    # page-number line removal
    assert normalize_text("\na\n 42 \nb") == "\na\nb"


def test_style_property():
    assert style_property("background: #cceeff; color: red", "background") == "#cceeff"
    assert style_property("background: #bgcolor#", "background") is None  # invalid
    assert style_property("background-color:rgb(255,255,255, 0.0)", "background-color") is None
    assert style_property("BACKGROUND: White !important", "background") == "White"


def test_amounts_and_footnotes():
    amts = find_amounts("charges of $125.3 million and ($23.5) losses plus 450 million")
    values = {a["value"] for a in amts}
    assert 125.3 in values and -23.5 in values and 450.0 in values
    notes = find_footnotes("See Note 12 for details (4)")
    assert {"12", "4"} <= {n["note_id"] for n in notes}


def test_catalog_cutoff():
    assert catalog_for("8-K", "2004-08-23") == ITEMS_8K_OBSOLETE
    assert catalog_for("8-K", "2004-08-24") == ITEMS_8K
    with pytest.raises(ValueError):
        catalog_for("S-1", "2020-01-01")


# ---------------------------------------------------------------------------
# golden parity (sampled)
# ---------------------------------------------------------------------------

def _fixture_rows(n: int):
    os.makedirs(WORK, exist_ok=True)
    for zp in (f"{FIX}/RAW_FILINGS/8-K.zip", f"{FIX}/EXTRACTED_FILINGS/8-K.zip"):
        with zipfile.ZipFile(zp) as z:
            z.extractall(WORK)
    with open(f"{FIX}/FILINGS_METADATA_TEST.csv", newline="") as f:
        rows = [r for r in csv.DictReader(f) if r["Type"] == "8-K"]
    for r in rows:
        for k, v in r.items():
            if v == "":
                r[k] = None
    # deterministic spread across the corpus
    return rows[:: max(1, len(rows) // n)][:n]


@pytest.mark.parametrize("idx", range(5))
def test_golden_parity_sample(idx):
    rows = _fixture_rows(5)
    md = rows[idx]
    raw_path = os.path.join(WORK, "8-K", md["filename"])
    gold_path = os.path.join(
        WORK, "8-K", md["filename"].rsplit(".", 1)[0] + ".json"
    )
    if not (os.path.exists(raw_path) and os.path.exists(gold_path)):
        pytest.skip("fixture blob missing")
    items = ITEMS_8K if (md["Date"] or "") > "2004-08-23" else ITEMS_8K_OBSOLETE
    wanted = [i for i in items if i != "SIGNATURE"]
    with open(raw_path, "rb") as f:
        got = extract_filing(
            f.read(), md, ExtractionOptions(items_to_extract=wanted)
        )
    gold = json.load(open(gold_path))
    for item in wanted:
        key = f"item_{item}"
        assert (got or {}).get(key, "") == gold.get(key, ""), key


# ---------------------------------------------------------------------------
# Spark job == in-process oracle, byte for byte
# ---------------------------------------------------------------------------

def test_spark_extract_matches_oracle(spark):
    from edgar_crawler_spark.operators.extract_job import extract_items_job
    from edgar_crawler_spark.synth import make_pages, pages_df

    n = 40
    df = pages_df(spark, seed=7, n=n)
    result = {r["url"]: r for r in extract_items_job(df).collect()}
    assert len(result) == n

    opts = ExtractionOptions()
    for page in make_pages(seed=7, n=n):
        md = {
            "CIK": page["cik"], "Company": page["company"],
            "Type": page["form_type"], "Date": page["filing_date"],
            "filename": page["filename"], "Period of Report": None,
            "SIC": None, "State of Inc": None, "State location": None,
            "Fiscal Year End": None, "html_index": None,
            "htm_file_link": None, "complete_text_file_link": None,
        }
        expected = extract_filing(page["html"], md, opts)
        got = result[page["url"]]
        if expected is None:
            assert got["payload_json"] is None
            continue
        exp_json = json.dumps(expected, indent=4, ensure_ascii=False)
        assert got["payload_json"] == exp_json, page["filename"]
        assert got["n_items"] > 0
