"""Text-analysis functions for the LLM-data pipeline (SURVEY.md §7
phase 4): tokenization, token counting, quality scoring, language ID,
and document fingerprinting over the ``documents`` table.

All pure ``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd,
no Python in the hot path. Each has an exact SQL twin used by the
DuckDB oracles (see queries/llmdata.py), so results are deterministic
across engines: ratios derive from integer counts with a fixed
operation order, hashes are md5.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Shared with the oracle SQL generators — keep sorted & lowercase.
EN_STOPWORDS = (
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from",
    "has", "he", "in", "is", "it", "its", "of", "on", "that", "the",
    "to", "was", "were", "will", "with",
)

# BPE-ish unit: letter runs, single digits, or single non-alnum marks.
TOKEN_REGEX = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"


def ws_tokens(text: str | Column) -> Column:
    """Whitespace tokenization (empty strings filtered)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.trim(c), " +"), lambda t: t != "")


def ws_token_count(text: str | Column) -> Column:
    return F.size(ws_tokens(text))


def bpe_token_count(text: str | Column) -> Column:
    """Sub-word-ish token count via TOKEN_REGEX (regexp_count)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(TOKEN_REGEX))


def stopword_hits(text: str | Column) -> Column:
    """Number of whitespace tokens that are English stopwords."""
    toks = ws_tokens(text)
    return F.size(F.filter(toks, lambda t: F.lower(t).isin(*EN_STOPWORDS)))


def quality_features(text: str | Column) -> dict[str, Column]:
    """Deterministic quality features: all ratios are (int count) /
    (int count) in double — same op order as the oracle SQL."""
    c = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(c)
    n_tokens = ws_token_count(c)
    n_stop = stopword_hits(c)
    n_alpha = F.length(F.regexp_replace(c, "[^A-Za-z]", ""))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": (n_chars - (n_tokens - F.lit(1)))
        .cast("double")
        / n_tokens,
        "stopword_ratio": n_stop.cast("double") / n_tokens,
        "alpha_ratio": n_alpha.cast("double") / n_chars,
    }


def lang_id_en(text: str | Column, threshold: float = 0.03) -> Column:
    """N-gram-free heuristic language ID: stopword-hit ratio over
    whitespace tokens → 'en' when above threshold, else 'unk'.
    (A tiny, deterministic stand-in for fastText-style LID; the real
    decode hook would slot into the same column contract.)"""
    c = F.col(text) if isinstance(text, str) else text
    ratio = stopword_hits(c).cast("double") / ws_token_count(c)
    return F.when(ratio > threshold, F.lit("en")).otherwise(F.lit("unk"))


def clean_text(text: str | Column) -> Column:
    """Training-corpus text normalization chain (all JVM regexps):
    strip HTML-ish tags → drop non [a-z0-9 .,!?'-] chars → lowercase →
    collapse whitespace → trim. The SQL twin lives in the oracle for
    ``x_clean_normalize`` (DuckDB needs the 'g' flag)."""
    c = F.col(text) if isinstance(text, str) else text
    c = F.regexp_replace(c, "<[^>]*>", " ")
    c = F.lower(c)
    c = F.regexp_replace(c, "[^a-z0-9 .,!?'-]", " ")
    c = F.regexp_replace(c, " +", " ")
    return F.trim(c)


# PII patterns, applied in this order (IDs before phones: an SSN-shaped
# string must not half-match the phone pattern first; separated phones
# before the bare-10-digit rule). Shared with the oracle SQL generator —
# kept to the Java-regex ∩ RE2 subset so Spark and DuckDB agree, which
# rules out lookarounds; \b word boundaries are in both.
#
# Known recall/precision limits (regexes are the contract, not an NER):
# digit runs inside longer alphanumerics are NOT redacted (the \b
# anchors trade that recall for not shredding hex ids), international
# phone layouts other than NANP-ish 3-3-4 are missed, and any dotted
# quad with in-range octets matches <IP> even when it is a version
# string — indistinguishable by shape.
_IPV4_OCTET = "(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])"
PII_RULES = (
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<ID>"),
    ("\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b", "<PHONE>"),
    ("\\b[0-9]{10}\\b", "<PHONE>"),  # unseparated NANP number
    (f"\\b{_IPV4_OCTET}(\\.{_IPV4_OCTET}){{3}}\\b", "<IP>"),
)


def redact_pii(text: str | Column) -> Column:
    """Training-corpus PII scrub: emails, SSN-shaped ids, phone numbers,
    IPv4 literals → typed placeholders. Pure JVM regexp chain (no UDF);
    the rule list is the cross-engine contract."""
    c = F.col(text) if isinstance(text, str) else text
    for pat, repl in PII_RULES:
        c = F.regexp_replace(c, pat, repl)
    return c


def repetition_features(text: str | Column) -> dict[str, Column]:
    """Repetition-based quality signals (integer-count derived, exact
    cross-engine): type-token ratio and its complement. The max-token-
    frequency variant needs a per-token groupBy — see the
    ``x_repetition`` query for that aggregation shape."""
    toks = ws_tokens(text)
    low = F.transform(toks, F.lower)
    n = F.size(low)
    n_uniq = F.size(F.array_distinct(low))
    return {
        "n_tokens": n,
        "n_unique": n_uniq,
        "type_token_ratio": n_uniq.cast("double") / n,
        "repetition_ratio": (n - n_uniq).cast("double") / n,
    }


def fingerprint(text: str | Column) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct token set (lowercased). Identical duplicates — including
    shuffled-word permutations — collide; anything else doesn't."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.array_sort(F.array_distinct(F.transform(ws_tokens(c), F.lower)))
    return F.md5(F.array_join(toks, " ").cast("binary"))
