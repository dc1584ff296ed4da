"""10-K boundary-behavior parity against golden extracted filings
(VERDICT r01 next-round #6).

The checkout has no RAW 10-K fixtures (.MISSING_LARGE_BLOBS), but the
62 golden extracted JSONs exist. These tests RECONSTRUCT a raw HTML
filing from each golden's item bodies — one <div> per line, plus a
realistic ToC, page-number lines and a SIGNATURES tail — and assert
the extractor reproduces the golden item texts byte-for-byte. That
exercises the real 10-K boundary machinery (ToC candidate skipping,
page-marker dropping, PART III crossing, 9A→9B→10 fencing with 9C
absent, item_15 ending at SIGNATURES) on real filing text.

Also pins the reference's known ToC quirk (a ToC entry for an item
with no body section makes the previous item fall back to
tail-to-EOF — parse_item/get_last_item_section semantics,
/root/reference/extract_items.py:588-715,780-824), and property-tests
the candidate choice on fuzzed synthetic filings.
"""

from __future__ import annotations

import html
import json
import zipfile

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from edgar_crawler_spark.extraction import ExtractionOptions, extract_filing
from edgar_crawler_spark.extraction.items import catalog_for

FIX = "/root/reference/tests/fixtures/EXTRACTED_FILINGS/10-K.zip"

N_GOLDEN = 62


def _goldens(limit: int):
    out = []
    with zipfile.ZipFile(FIX) as z:
        for name in sorted(z.namelist()):
            if name.endswith(".json"):
                out.append((name, json.loads(z.read(name))))
            if len(out) >= limit:
                break
    return out


def _to_html(text: str) -> str:
    return "\n".join(
        f"<div>{html.escape(line)}</div>" for line in text.split("\n")
    )


def _reconstruct(items: dict[str, str], toc_keys=None) -> str:
    """Raw HTML filing from golden item bodies: ToC (entries for
    `toc_keys`, default = items with bodies), bodies, page-number
    lines between items, SIGNATURES tail."""
    present = [k for k, v in items.items() if v]
    toc_keys = present if toc_keys is None else toc_keys
    parts = [
        "<html><body>",
        "<div>UNITED STATES SECURITIES AND EXCHANGE COMMISSION</div>",
        "<div>ANNUAL REPORT PURSUANT TO SECTION 13</div>",
        "<div>TABLE OF CONTENTS</div>",
    ]
    for i, k in enumerate(toc_keys):
        parts.append(f"<div>Item {k[5:]}. Heading words {i + 3}</div>")
    for pageno, k in enumerate(present, start=2):
        parts.append(_to_html(items[k]))
        parts.append(f"<div>{pageno}</div>")  # page-number line, dropped
    parts.append("<div>SIGNATURES</div>")
    parts.append("<div>Pursuant to the requirements of the Securities "
                 "Exchange Act the registrant has duly signed.</div>")
    parts.append("<table><tr><td>x</td></tr></table>")  # html detection
    parts.append("</body></html>")
    return "\n".join(parts)


def _extract(body: str, d: dict) -> dict:
    md = {
        "CIK": d["cik"], "Company": d["company"], "Type": "10-K",
        "Date": d["filing_date"], "filename": None,
    }
    return extract_filing(body.encode(), md, ExtractionOptions()) or {}


def _is_reconstructible(v: str) -> bool:
    """A golden body is reconstructible iff it is a fixed point of the
    line cleaner: bodies containing whitespace-only lines or standalone
    ToC-marker lines (which in the REAL filing had adjacent content
    that kept them alive) get legitimately re-cleaned when rendered as
    one <div> per line, so byte-parity cannot be expected for them."""
    from edgar_crawler_spark.extraction.textprep import normalize_text

    if any(line.strip() == "" for line in v.split("\n")):
        return False  # whitespace-only div lines vanish in flatten_html
    framed = "\n" + v + "\n"
    return normalize_text(framed) == framed


class TestGoldenReconstruction:
    @pytest.mark.parametrize("idx", range(N_GOLDEN))
    def test_items_byte_identical(self, idx):
        name, d = _goldens(N_GOLDEN)[idx]
        items = {k: v for k, v in d.items() if k.startswith("item_")}
        res = _extract(_reconstruct(items), d)
        present = [k for k, v in items.items() if v]
        checkable = [k for k in present if _is_reconstructible(items[k])]
        # the skip-list must stay an exception, not the rule
        assert len(checkable) >= max(1, int(0.8 * len(present))), name
        mismatches = []
        for k in checkable:
            if res.get(k, "") != items[k]:
                mismatches.append(k)
        assert not mismatches, f"{name}: {mismatches}"

    def test_toc_entry_for_missing_item_pins_reference_quirk(self):
        """A ToC entry for an item with NO body section (here 9C)
        poisons the previous item's candidate search: the only 9B→9C
        span is the ToC one, it fails the positions cursor, and 9B
        falls back to tail-to-EOF — exactly the reference's
        parse_item + get_last_item_section behavior."""
        _, d = _goldens(1)[0]
        items = {k: v for k, v in d.items() if k.startswith("item_")}
        assert items.get("item_9C") == "" and items.get("item_9B")
        present = [k for k, v in items.items() if v]
        toc_with_9c = present[: present.index("item_10")] + [
            "item_9C"
        ] + present[present.index("item_10"):]
        res = _extract(_reconstruct(items, toc_keys=toc_with_9c), d)
        # 9B swallows everything from its header to EOF (the quirk)
        assert len(res.get("item_9B", "")) > len(items["item_9B"])
        assert res["item_9B"].startswith(items["item_9B"].split("\n")[0])
        # items before and after the quirk region are still correct
        assert res.get("item_9A") == items["item_9A"]
        assert res.get("item_10") == items["item_10"]


WORDS = ["alpha", "bravo", "delta", "echo", "golf", "hotel", "kilo",
         "lima", "mike", "nova", "oscar", "papa"]


def _body_for(key: str, seed: int, n: int) -> str:
    rng = (seed * 2654435761 + len(key)) % (2**31)
    lines = []
    for i in range(n):
        rng = (rng * 1103515245 + 12345) % (2**31)
        lines.append(
            " ".join(WORDS[(rng >> (3 * j)) % len(WORDS)] for j in range(6))
        )
    title = f"SECTION HEADING {key.upper()}"
    return f"ITEM {key}.\n{title}\n" + "\n".join(lines)


class TestFuzzedCandidateChoice:
    @settings(max_examples=25, deadline=None)
    @given(
        mask=st.lists(st.booleans(), min_size=23, max_size=23),
        seed=st.integers(min_value=0, max_value=2**20),
        nlines=st.integers(min_value=1, max_value=6),
    )
    def test_present_items_recovered_exactly(self, mask, seed, nlines):
        """Property (parse_item candidate choice): for any subset of
        the 10-K catalog rendered with a subset-consistent ToC, every
        present item except the last is recovered exactly, and the
        last present item runs to the SIGNATURES fence."""
        catalog = [k for k in catalog_for("10-K", "2023-06-01")
                   if k != "SIGNATURE"]
        chosen = [k for k, m in zip(catalog, mask) if m]
        if not chosen:
            return
        items = {f"item_{k}": _body_for(k, seed, nlines) for k in chosen}
        d = {"cik": "1", "company": "X", "filing_date": "2023-06-01"}
        res = _extract(_reconstruct(items), d)
        for k in chosen[:-1]:
            assert res.get(f"item_{k}", "") == items[f"item_{k}"], k
        # The last present item runs to the SIGNATURES fence. When it
        # is the ONLY item, positions is empty and the section may
        # legitimately begin at its ToC entry (reference candidate
        # semantics), so assert containment + fence, not prefix.
        last = chosen[-1]
        got = res.get(f"item_{last}", "")
        assert items[f"item_{last}"] in got
        assert "duly signed" not in got
