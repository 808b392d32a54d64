"""Text-analysis Column builders (beyond-reference operators for
training-data pipelines). Everything here is pure
``pyspark.sql.functions`` Column algebra — JVM-side, whole-stage
codegen'd, no Python UDFs — so it runs at full scan speed on 100 TB.

Hash-determinism convention: all content hashing uses ``md5`` because
DuckDB computes the identical digest, which makes every operator
oracle-checkable end-to-end (minhash mins, simhash bits, fingerprints).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish tokenizer regex: letter runs, digit runs, single non-alnum,
# non-whitespace marks — \s (not just space) so newlines/tabs are token
# SEPARATORS, not tokens (round-8 review fix; shared verbatim with the
# DuckDB oracles, so both engines move together)
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# language stopword profiles for the n-gram/stopword lang-id heuristic
LANG_PROFILES: dict[str, list[str]] = {
    "de": ["der", "und", "die", "nicht", "ist"],
    "en": ["the", "and", "of", "is", "to"],
    "es": ["el", "y", "de", "que", "la"],
    "fr": ["le", "et", "la", "les", "des"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}


def norm_text(col: str | Column) -> Column:
    """Canonical text normalization for hashing: lowercase, trimmed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(c))


def shingles(col: str | Column, n: int = 5) -> Column:
    """Distinct character n-grams of the normalized text, as an array —
    built with sequence/transform (codegen), no explode needed until the
    caller wants rows."""
    t = norm_text(col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(t) - (n - 1), F.lit(1))),
            lambda i: t.substr(i, F.lit(n)),
        )
    )


def ws_token_count(col: str | Column) -> Column:
    """Whitespace token count; empty string counts 0. Splits on \\s+
    runs (space, tab, newline — the DuckDB oracles use the identical
    RE2 class), so multi-line documents count words, not lines."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, "\\s+"))
    )


def bpe_token_count(col: str | Column) -> Column:
    """Count of BPE-ish regex tokens (letters / digits / single marks)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), F.lit(0)))


def occurrence_count(col: Column, word: str) -> Column:
    """Non-overlapping occurrences of `` word `` (space-delimited) via the
    length/replace trick — identical algorithm in the DuckDB oracle.
    Matches only space-adjacent words: run multi-line text through
    clean_text (whitespace-run collapse) first, or a word after a
    newline won't match."""
    padded = F.concat(F.lit(" "), col, F.lit(" "))
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("int")


def stopword_hits(col: Column, words: list[str]) -> Column:
    out = occurrence_count(col, words[0])
    for w in words[1:]:
        out = out + occurrence_count(col, w)
    return out


def quality_score(text_col: str | Column) -> dict[str, Column]:
    """Deterministic quality features: word count, char count, stopword
    ratio, uppercase ratio, mean word length, and a combined score."""
    raw = F.col(text_col) if isinstance(text_col, str) else text_col
    t = norm_text(raw)
    wc = ws_token_count(t)
    n_chars = F.length(raw)
    stop = stopword_hits(t, LANG_PROFILES["en"])
    # uppercase count via regexp removal (same char class in DuckDB RE2)
    upper = n_chars - F.length(F.regexp_replace(raw, "[A-Z]", ""))
    mean_wlen = F.when(wc > 0, (F.length(t) - (wc - 1)) / wc).otherwise(F.lit(0.0))
    stop_ratio = F.when(wc > 0, stop / wc).otherwise(F.lit(0.0))
    score = F.round(
        stop_ratio + F.least(wc, F.lit(100)) / 100.0 - F.when(n_chars > 0, upper / n_chars).otherwise(0.0),
        6,
    )
    return {
        "word_count": wc.cast("int"),
        "n_chars_obs": n_chars.cast("int"),
        "stop_hits": stop.cast("int"),
        "upper_count": upper.cast("int"),
        "mean_word_len": F.round(mean_wlen.cast("double"), 6),
        "quality_score": score.cast("double"),
    }


# Cleanup regexes valid in BOTH Java regex (Spark) and RE2 (DuckDB):
# \x{...} code points and \s have the same meaning in each.
CTRL_CHARS_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"  # C0 minus \t\n\r, + DEL
ZERO_WIDTH_RE = r"[\x{200B}-\x{200D}\x{FEFF}]"  # ZWSP/ZWNJ/ZWJ/BOM
WS_RUN_RE = r"[\s\x{00A0}]+"  # whitespace runs incl. NBSP


def clean_text(col: str | Column) -> Column:
    """Web-scrape text cleanup (the CCNet/RefinedWeb normalization
    stage): strip C0 control characters and DEL, delete zero-width
    code points (ZWSP/ZWNJ/ZWJ/BOM), then collapse every whitespace
    run — including NBSP — to a single space and trim. Three JVM
    regexp_replace passes, one codegen projection, no UDF; every
    pattern is written in the \\x{...} syntax both Java regex and
    DuckDB's RE2 accept, so the oracle recomputes the identical
    rewrite."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, CTRL_CHARS_RE, "")
    c = F.regexp_replace(c, ZERO_WIDTH_RE, "")
    return F.trim(F.regexp_replace(c, WS_RUN_RE, " "))
