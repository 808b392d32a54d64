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
    caller wants rows. Edge semantics (deliberate, mirrored by the
    oracles): empty/whitespace-only text yields [''] — all empty docs
    share that one shingle and similarity-match each other, which is
    correct because their normalized content IS identical (exact-dup
    territory); NULL text yields [NULL] — an all-NULL signature that
    the LSH banding step filters out (dedup._sig_bands), so NULL docs
    never enter candidate pairs."""
    t = norm_text(col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(t) - (n - 1), F.lit(1))),
            lambda i: t.substr(i, F.lit(n)),
        )
    )


def ws_token_count(col: str | Column) -> Column:
    """Whitespace token count; empty string counts 0, NULL text counts
    NULL — the isNull branch is EXPLICIT because non-ANSI Spark (3.x
    default, still in the supported range) has size(NULL) = -1
    (legacy.sizeOfNull), which would deflate every SUM over the column
    by one per NULL row (round-10 review). Splits on \\s+ runs (space,
    tab, newline — the DuckDB oracles use the identical RE2 class), so
    multi-line documents count words, not lines."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return (
        F.when(c.isNull(), F.lit(None).cast("int"))
        .when(F.length(trimmed) == 0, F.lit(0))
        .otherwise(F.size(F.split(trimmed, "\\s+")))
    )


def bpe_token_count(col: str | Column) -> Column:
    """Count of BPE-ish regex tokens (letters / digits / single marks);
    NULL text counts NULL (explicit — see ws_token_count)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull(), F.lit(None).cast("int")).otherwise(
        F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), F.lit(0)))
    )


def collapse_ws(col: str | Column) -> Column:
    """Collapse every whitespace run (space/tab/newline) to one space —
    the precondition of :func:`occurrence_count`'s space-delimited
    matching. quality_score / lang_id / gopher apply it before stop
    counting so a word after a newline still counts (round-10
    review); clean_text goes further (control chars, NBSP, zero-width)
    for the web-scrape path."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"\s+", " ")


def occurrence_count(col: Column, word: str) -> Column:
    """Occurrences of ``word`` as a space-delimited token, via the
    length/replace trick with spaces DOUBLED first: a plain
    non-overlapping replace of ' w ' consumes the shared delimiter, so
    adjacent repeats ('the the' — exactly the boilerplate runs a
    stopword ratio is meant to flag) counted 1 instead of 2 (round-10
    review); after doubling, every occurrence owns both its delimiter
    spaces. Identical algorithm in the DuckDB oracle
    (:func:`occurrence_count_sql` — ONE definition site for both
    engines). Matching is space-delimited: collapse whitespace runs
    (:func:`collapse_ws` / clean_text) first for multi-line text."""
    padded = F.concat(
        F.lit(" "), F.replace(col, F.lit(" "), F.lit("  ")), F.lit(" ")
    )
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("int")


def occurrence_count_sql(expr: str, word: str) -> str:
    """DuckDB twin of :func:`occurrence_count` — generated from the
    same module so the two engines cannot silently diverge (the three
    oracle builders previously each hand-copied the formula)."""
    padded = f"(' ' || replace({expr}, ' ', '  ') || ' ')"
    return (
        f"CAST((length({padded}) - length(replace({padded}, "
        f"' {word} ', ''))) / {len(word) + 2} AS INT)"
    )


def stopword_hits(col: Column, words: list[str]) -> Column:
    out = occurrence_count(col, words[0])
    for w in words[1:]:
        out = out + occurrence_count(col, w)
    return out


def quality_score(text_col: str | Column) -> dict[str, Column]:
    """Deterministic quality features: word count, char count, stopword
    ratio, uppercase ratio, mean word length, and a combined score.
    Stop counting and mean word length run on whitespace-COLLAPSED
    text: occurrence_count is space-delimited (a stopword after a
    newline would be missed) and the mean-length formula assumes one
    separator per word boundary (whitespace runs inflated it) —
    round-10 review; the DuckDB oracle applies the identical
    collapse."""
    raw = F.col(text_col) if isinstance(text_col, str) else text_col
    t = norm_text(raw)
    tq = collapse_ws(t)
    wc = ws_token_count(t)
    n_chars = F.length(raw)
    stop = stopword_hits(tq, LANG_PROFILES["en"])
    # uppercase count via regexp removal (same char class in DuckDB RE2)
    upper = n_chars - F.length(F.regexp_replace(raw, "[A-Z]", ""))
    # the explicit wc == 0 branch (instead of otherwise) lets NULL
    # text fall through to NULL rather than 0.0
    mean_wlen = F.when(wc > 0, (F.length(tq) - (wc - 1)) / wc).when(
        wc == 0, F.lit(0.0)
    )
    stop_ratio = F.when(wc > 0, stop / wc).when(wc == 0, F.lit(0.0))
    # NULL text scores NULL, explicitly: Spark's least() SKIPS null
    # args, so least(NULL_wc, 100) is 100 and a failed-extraction doc
    # would otherwise score a PERFECT 1.0 — every quality-gate filter
    # would then keep exactly the junk rows (round-10 second-pass
    # review; the oracle carries the same explicit NULL case)
    score = F.when(
        raw.isNull(), F.lit(None).cast("double")
    ).otherwise(
        F.round(
            stop_ratio + F.least(wc, F.lit(100)) / 100.0 - F.when(n_chars > 0, upper / n_chars).otherwise(0.0),
            6,
        )
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
