"""Shared text-preparation constants and expressions.

Lives in ``functions/`` (non-registering, like :mod:`edgy_spark.functions.lsh`)
so operator modules never import each other at import time — registration
order in :func:`edgy_spark.catalog.load_all_registrations` stays free to
rotate without silently changing which oracle strings are available when a
module's ``@register`` decorators run.

Consumed by :mod:`edgy_spark.operators.text` (language-ID, quality scoring,
PII scrub query) and :mod:`edgy_spark.operators.pipeline` (the fused
training-data pipeline reuses the identical scrub + stopword logic so the
cleaning stage is bit-identical whether run standalone or fused).
"""

from __future__ import annotations

from pyspark.sql import functions as F

# word-boundary-matched marker vocabularies, chosen to be disjoint across
# languages, for the n-gram-heuristic language-ID operator
LANG_MARKERS = {
    "en": ["the", "and", "of", "is", "that"],
    "de": ["der", "und", "die", "ist", "nicht"],
    "fr": ["le", "et", "les", "est", "pas"],
    "es": ["el", "los", "es", "las", "una"],
    "zh": ["的", "是", "了", "在", "和"],
}

STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]

#: The BPE-ish cross-engine tokenization contract (lowercase letter runs /
#: digit runs / single non-space punctuation) shared by text_token_counts,
#: text_token_rarity_scores, text_bpe_merge_candidates and
#: pipeline_length_buckets.  ONE definition — Spark expressions and oracle
#: f-strings both read it, so a pattern change moves every operator's
#: tokenization in lockstep (syntax restricted to what Java regex and RE2/
#: DuckDB interpret identically, like the PII patterns below).
BPE_TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

# -- PII patterns -----------------------------------------------------------
# Restricted to syntax Java regex and RE2 (DuckDB) interpret identically, so
# the scrub is bit-reproducible in the oracle.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
PII_PHONE = r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b"

# SQL-embedding aliases.  The raw-string and escaped spellings are byte-
# identical (r"\b" == "\\b"), so these are ALIASES of the canonical
# patterns, not copies — a pattern fix automatically reaches both the
# Spark expressions and every oracle f-string.
PII_SQL_EMAIL = PII_EMAIL
PII_SQL_IPV4 = PII_IPV4
PII_SQL_PHONE = PII_PHONE


def scrub_pii(col):
    """Redact emails → [EMAIL], IPv4s → [IP], phone numbers → [PHONE] in a
    fixed order (email first, so an address's digits can't be half-eaten by
    the phone pattern).  Pure JVM regexp_replace — scan-speed at 100 TB."""
    out = F.regexp_replace(col, PII_EMAIL, "[EMAIL]")
    out = F.regexp_replace(out, PII_IPV4, "[IP]")
    return F.regexp_replace(out, PII_PHONE, "[PHONE]")


def scrub_pii_sql(col: str) -> str:
    """DuckDB-SQL twin of :func:`scrub_pii` (same patterns, same order)."""
    return (
        f"regexp_replace(regexp_replace(regexp_replace({col}, "
        f"'{PII_SQL_EMAIL}', '[EMAIL]', 'g'), "
        f"'{PII_SQL_IPV4}', '[IP]', 'g'), "
        f"'{PII_SQL_PHONE}', '[PHONE]', 'g')"
    )
