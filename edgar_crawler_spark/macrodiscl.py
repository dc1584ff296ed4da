"""MacroDiscl (Holstead et al., 2024) — full three-mode dictionary.

Re-expresses /root/reference/calculate_macro_discl.py as native Spark
expressions:

- dictionaries: EXACT_UNIGRAMS (13), SUBSTRING_UNIGRAMS (4), BIGRAMS
  (54) — calculate_macro_discl.py:64-95;
- text prep (clean_text_for_matching, :135-158): lowercase, punctuation
  `[^\\w\\s]` -> space, whitespace collapsed;
- counting (count_macro_terms, :175-213): exact unigrams with word
  boundaries, substring unigrams without, bigrams as plain substrings of
  the single-spaced text; every (non-overlapping) match counts, and each
  term is counted INDEPENDENTLY — a single alternation would be wrong
  for bigrams because one term's match may overlap another's tail
  ("foreign exchange market risk" counts foreign exchange + exchange
  market + market risk = 3, but an alternation scan finds only 2);
- score (:264): MacroDiscl = macro_count / total_words * 1000, rounded
  to 4 decimals; empty documents score 0.0 and are excluded from the
  corpus summary (:373-381).

Scale shape: every count is a JVM regexp over the already-lowercased
projection — one whole-stage-codegen'd map stage, no shuffle, no Python,
and the dictionary is compiled into the plan (no broadcast needed). The
per-document cost is O(len(text) * n_terms), exactly the reference's
findall-per-term cost, but distributed.

`(?U)` (UNICODE_CHARACTER_CLASS) makes Java's `\\w`/`\\b` match Python
`re`'s unicode semantics, which is what the reference uses.
"""

from __future__ import annotations

import re
from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

# calculate_macro_discl.py:64-70 — word-boundary exact matches
EXACT_UNIGRAMS = [
    "macro", "macroeconomic", "macroeconomics", "macroeconomy",
    "import", "importing", "imported",
    "export", "exporting", "exported",
    "gdp", "gnp", "fed",
]

# calculate_macro_discl.py:72-75 — match inside other words too
SUBSTRING_UNIGRAMS = ["inflation", "deflation", "recession", "currency"]

# calculate_macro_discl.py:77-95 — consecutive two-word phrases
BIGRAMS = [
    "economic condition", "economic environment", "economic downturn",
    "economic factor", "economic trend", "economic instability",
    "economic growth", "economic activity", "economic development",
    "economic slowdown", "economic uncertainty", "economic recovery",
    "economic climate", "economic data", "economic cycle",
    "economic crisis", "economic indicator", "economic output",
    "economic expansion",
    "capital market", "credit market", "global market",
    "international market", "exchange market", "emerging market",
    "bear market", "bull market", "market risk", "credit risk",
    "global risk", "international risk", "exchange risk", "economic risk",
    "global economy", "international economy", "emerging economy",
    "general economy", "foreign exchange", "foreign investor",
    "foreign investment", "real estate", "real property", "real growth",
    "real rate", "federal reserve", "central bank", "gross domestic",
    "gross national", "monetary policy", "fiscal policy", "interest rate",
    "discount rate", "business cycle", "global trade",
]

ALL_TERMS = EXACT_UNIGRAMS + SUBSTRING_UNIGRAMS + BIGRAMS


def processed_col(text: Column) -> Column:
    """clean_text_for_matching (:135-158) as one JVM expression chain:
    lower -> punctuation to space -> collapse whitespace -> trim."""
    c = F.lower(text)
    c = F.regexp_replace(c, r"(?U)[^\w\s]", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def token_count_col(processed: Column) -> Column:
    """count_words (:161-172): whitespace split of the processed text."""
    return (
        F.when(processed == "", F.lit(0))
        .otherwise(F.size(F.split(processed, " ")))
        .cast("long")
    )


def exact_unigram_count_col(processed: Column) -> Column:
    """Word-boundary unigrams (:191-194). A single alternation IS the
    per-term sum here: boundary matches occupy whole words, and two
    distinct single-word terms can never claim the same word."""
    alt = "|".join(EXACT_UNIGRAMS)
    return F.regexp_count(processed, F.lit(rf"(?U)\b({alt})\b")).cast("long")


def substring_count_col(processed: Column) -> Column:
    """Substring unigrams (:196-199): per-term non-overlapping counts,
    summed — mirrors findall per term."""
    cols = [F.regexp_count(processed, F.lit(t)) for t in SUBSTRING_UNIGRAMS]
    return reduce(lambda a, b: a + b, cols).cast("long")


def bigram_count_col(processed: Column) -> Column:
    """Bigrams (:201-208): plain substring counts on the single-spaced
    text, one pass per term (NOT an alternation — see module doc)."""
    cols = [F.regexp_count(processed, F.lit(t)) for t in BIGRAMS]
    return reduce(lambda a, b: a + b, cols).cast("long")


def score_col(n_macro: Column, n_tokens: Column) -> Column:
    """MacroDiscl = macro/words * 1000, round 4 (:264); 0.0 when empty."""
    return F.when(n_tokens == 0, F.lit(0.0)).otherwise(
        F.round(n_macro * 1000.0 / n_tokens, 4)
    )


# ---------------------------------------------------------------------------
# Pure-Python mirror (reference semantics, used by tests as the oracle)
# ---------------------------------------------------------------------------

def macro_counts_py(raw_text: str) -> dict:
    """Independent single-process implementation of the reference's
    clean+count pipeline (:135-213,:264) for golden-text verification."""
    t = raw_text.lower()
    t = re.sub(r"[^\w\s]", " ", t)
    t = re.sub(r"\s+", " ", t).strip()
    n_tokens = len(t.split()) if t else 0
    n_exact = sum(
        len(re.findall(rf"\b{re.escape(u)}\b", t)) for u in EXACT_UNIGRAMS
    )
    n_substr = sum(len(re.findall(re.escape(u), t)) for u in SUBSTRING_UNIGRAMS)
    n_bigram = sum(len(re.findall(re.escape(b), t)) for b in BIGRAMS)
    n_macro = n_exact + n_substr + n_bigram
    score = round(n_macro / n_tokens * 1000, 4) if n_tokens else 0.0
    return {
        "n_exact": n_exact,
        "n_substr": n_substr,
        "n_bigram": n_bigram,
        "n_macro": n_macro,
        "n_tokens": n_tokens,
        "score": score,
    }


# ---------------------------------------------------------------------------
# DuckDB oracle SQL fragments (ASCII inputs; driver correctness gate)
# ---------------------------------------------------------------------------

def oracle_processed_sql(text_expr: str) -> str:
    return (
        f"trim(regexp_replace(regexp_replace(lower({text_expr}), "
        f"'[^\\w\\s]', ' ', 'g'), '\\s+', ' ', 'g'))"
    )


def oracle_exact_sql(p: str) -> str:
    alt = "|".join(EXACT_UNIGRAMS)
    return rf"len(regexp_extract_all({p}, '\b({alt})\b'))"


def oracle_substr_sql(p: str) -> str:
    return " + ".join(
        f"len(regexp_extract_all({p}, '{t}'))" for t in SUBSTRING_UNIGRAMS
    )


def oracle_bigram_sql(p: str) -> str:
    return " + ".join(
        f"len(regexp_extract_all({p}, '{t}'))" for t in BIGRAMS
    )
