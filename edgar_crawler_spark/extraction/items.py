"""Item catalogs for SEC filing types.

These are public facts about SEC forms (the 10-K item structure, the
8-K item renumbering effective 2004-08-23, the 10-Q two-part layout);
the reference hard-codes the same lists at
/root/reference/item_lists.py:7-99.
"""

from __future__ import annotations

ITEMS_10K: list[str] = [
    "1", "1A", "1B", "1C", "2", "3", "4", "5", "6", "7", "7A", "8",
    "9", "9A", "9B", "9C", "10", "11", "12", "13", "14", "15", "16",
    "SIGNATURE",
]

# Post-2004-08-23 8-K item numbering (Exchange Act Release 34-49424).
ITEMS_8K: list[str] = [
    "1.01", "1.02", "1.03", "1.04", "1.05",
    "2.01", "2.02", "2.03", "2.04", "2.05", "2.06",
    "3.01", "3.02", "3.03",
    "4.01", "4.02",
    "5.01", "5.02", "5.03", "5.04", "5.05", "5.06", "5.07", "5.08",
    "6.01", "6.02", "6.03", "6.04", "6.05",
    "7.01", "8.01", "9.01",
    "SIGNATURE",
]

# Pre-2004-08-23 8-K numbering.
ITEMS_8K_OBSOLETE: list[str] = [
    "1", "2", "3", "4", "5", "6", "7", "8", "9", "10", "11", "12",
    "SIGNATURE",
]

# 10-Q: items are scoped to PART I / PART II ("part_N__item").
ITEMS_10Q: list[str] = [
    "part_1__1", "part_1__2", "part_1__3", "part_1__4",
    "part_2__1", "part_2__1A", "part_2__2", "part_2__3", "part_2__4",
    "part_2__5", "part_2__6",
    "SIGNATURE",
]

# The 8-K item list changed on this date (reference cutoff:
# extract_items.py:176-180).
OBSOLETE_8K_CUTOFF = "2004-08-23"

ROMAN: dict[str, str] = {
    "1": "I", "2": "II", "3": "III", "4": "IV", "5": "V",
    "6": "VI", "7": "VII", "8": "VIII", "9": "IX", "10": "X",
    "11": "XI", "12": "XII", "13": "XIII", "14": "XIV", "15": "XV",
    "16": "XVI", "17": "XVII", "18": "XVIII", "19": "XIX", "20": "XX",
}


def catalog_for(filing_type: str, filing_date: str | None) -> list[str]:
    """Pick the item catalog for a filing (reference:
    extract_items.py:166-188). filing_date is an ISO-ish date string;
    8-K filings dated on or before the 2004-08-23 cutoff use the
    obsolete numbering."""
    if filing_type == "10-K":
        return list(ITEMS_10K)
    if filing_type == "10-Q":
        return list(ITEMS_10Q)
    if filing_type == "8-K":
        if filing_date is not None and _after_cutoff(filing_date):
            return list(ITEMS_8K)
        return list(ITEMS_8K_OBSOLETE)
    raise ValueError(f"unsupported filing type: {filing_type!r}")


def _after_cutoff(date_str: str) -> bool:
    """True if date_str parses strictly later than the 8-K cutoff.
    Accepts YYYY-MM-DD / YYYY/MM/DD / ISO timestamps."""
    norm = date_str.strip().replace("/", "-")[:10]
    return norm > OBSOLETE_8K_CUTOFF
