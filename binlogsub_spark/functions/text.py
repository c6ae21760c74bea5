"""Text-analysis operators for large-scale training-data pipelines.

All JVM-side column expressions (whole-stage codegen; no Python in the hot
path). Every function here has an exact ANSI-SQL twin in
``__spark_entry__.oracle_sql`` so DuckDB can replay it bit-for-bit — the
rules are deterministic by construction (integer counts, fixed rounding).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Tiny marker stoplists per language for the n-gram/wordlist heuristic.
# Deterministic and mirrored in the oracle SQL; not a trained model.
LANG_MARKERS = {
    "en": ["the", "a", "of", "and", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "la", "los", "y", "es"],
}

STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def normalize_text(col: Column) -> Column:
    """lower + trim + collapse whitespace — the canonical form every
    fingerprint/dedup operator keys on."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def tokens(col: Column) -> Column:
    return F.split(normalize_text(col), " ")


def token_count(col: Column) -> Column:
    """Whitespace tokenization count (empty text -> 0)."""
    return F.when(F.length(normalize_text(col)) == 0, F.lit(0)).otherwise(
        F.size(tokens(col))
    )


def bpe_ish_token_count(col: Column) -> Column:
    """A BPE-ish proxy: count word pieces + digit runs + punctuation marks
    (regex segmentation, the standard pre-tokenizer shape)."""
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(r"[a-z]+|[0-9]+|[^\sa-z0-9]"), 0))


def _count_matches(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0))


def stopword_count(col: Column) -> Column:
    pat = r"\b(" + "|".join(STOPWORDS) + r")\b"
    return _count_matches(normalize_text(col), pat)


def quality_features(col: Column) -> dict[str, Column]:
    """Length / punctuation / stopword ratio features + a composite score.

    Ratios are rounded to 4 decimals so any ANSI engine reproduces the
    exact values (driver correctness hashing is value-exact).
    """
    n_chars = F.length(col)
    n_toks = token_count(col)
    n_stop = stopword_count(col)
    n_punct = _count_matches(col, r"[.!?,;:]")
    n_digit = _count_matches(col, r"[0-9]")
    safe_toks = F.greatest(n_toks, F.lit(1))
    safe_chars = F.greatest(n_chars, F.lit(1))
    stop_ratio = F.round(n_stop / safe_toks, 4)
    punct_ratio = F.round(n_punct / safe_chars, 4)
    digit_ratio = F.round(n_digit / safe_chars, 4)
    mean_tok_len = F.round(n_chars / safe_toks, 4)
    # Composite score on a 0..1000 integer scale, pure integer/floor math —
    # exactly reproducible by any ANSI engine (no float-rounding boundaries):
    # 40% length (capped at 100 tokens), 30% stopword density, 30% low digit
    # density.
    score = (
        F.least(n_toks, F.lit(100)) * 4
        + F.least(F.floor(n_stop * 1500 / safe_toks), F.lit(300))
        + (F.lit(300) - F.least(F.floor(n_digit * 3000 / safe_chars), F.lit(300)))
    ).cast("long")
    return {
        "n_chars": n_chars.cast("int"),
        "n_tokens": n_toks.cast("int"),
        "stop_ratio": stop_ratio,
        "punct_ratio": punct_ratio,
        "digit_ratio": digit_ratio,
        "mean_tok_len": mean_tok_len,
        "quality_score": score,  # integer 0..1000
    }


def lang_id(col: Column) -> Column:
    """Marker-wordlist language heuristic: argmax of per-language marker
    counts, ties broken by fixed language order, zero markers -> 'und'."""
    norm = normalize_text(col)
    c = {
        lang: _count_matches(norm, r"\b(" + "|".join(words) + r")\b")
        for lang, words in LANG_MARKERS.items()
    }
    m = F.greatest(c["en"], c["de"], c["fr"], c["es"])
    # argmax with fixed priority order on ties — closed form so the ANSI
    # oracle can mirror it exactly
    return (
        F.when(m == 0, F.lit("und"))
        .when(c["en"] == m, F.lit("en"))
        .when(c["de"] == m, F.lit("de"))
        .when(c["fr"] == m, F.lit("fr"))
        .otherwise(F.lit("es"))
    )


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of the normalized text (the rolling-hash
    analog, but order-exact and engine-portable)."""
    return F.md5(normalize_text(col))


# ------------------------------------------------------------- PII scrub
# Applied IN ORDER — the order is part of the contract (the SSN shape is
# also a valid phone shape, so IDs must mask before phones; masked tokens
# contain no digits, so later rules never re-match earlier replacements).
# Patterns avoid backreferences/lookaround so Java regex (Spark) and RE2
# (DuckDB oracle) agree byte-for-byte.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<ID>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\- ]{7,}[0-9]", "<PHONE>"),
]


def pii_features(col: Column) -> dict[str, Column]:
    """PII scrubbing for training-data pipelines: masks emails, SSN-shaped
    ids, IPv4 addresses and phone-number runs with typed tokens and counts
    each category. Counts are taken on the PROGRESSIVELY-masked text
    (sequential semantics — deterministic and engine-portable), so a string
    counted as an email is never also counted as a phone.

    Pure JVM column expressions (nested regexp_replace; whole-stage
    codegen) — at 100 TB this runs inside the scan stage, no shuffle,
    no Python."""
    out: dict[str, Column] = {}
    cur = col
    for name, pat, token in PII_RULES:
        out[f"pii_{name}"] = _count_matches(cur, pat).cast("int")
        cur = F.regexp_replace(cur, pat, token)
    out["text_scrubbed"] = cur
    return out
