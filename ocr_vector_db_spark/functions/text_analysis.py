"""Text-analysis operators for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

All column builders are pure built-in expressions (split / filter / transform
/ md5) so they run JVM-side with whole-stage codegen and are exactly
SQL-expressible — the correctness oracle mirrors each one in ANSI SQL.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# A compact stopword profile per language. Deliberately tiny + deterministic:
# the point is a scalable heuristic shape (per-token profile lookup, groupBy
# argmax), not linguistic accuracy.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "les", "et", "est", "une", "pas", "pour"],
    "es": ["el", "la", "los", "y", "es", "una", "no", "por"],
    # The reference's primary language (KO/EN OCR corpus — its validators,
    # no-results detection and query optimizer are all Hangul-aware).
    # Korean particles agglutinate onto nouns, so whole-token stopword hits
    # alone under-count badly; detect_language additionally scores ko by
    # tokens CONTAINING Hangul (see _KO_HANGUL below).
    "ko": ["그리고", "그러나", "하지만", "있는", "있다", "것", "수", "그", "때", "등"],
}

# A token containing any Hangul-syllable char counts as a ko hit — an ASCII
# token never does, so ASCII corpora score ko = 0 and keep their verdicts.
_KO_HANGUL = "[가-힣]"

PUNCT_CLASS = r"""[.,;:!?'"()\[\]{}\-]"""

# ---------------------------------------------------------------- pure python


def tokenize(text: str) -> list[str]:
    text = text.strip()
    return re.split(r"\s+", text) if text else []


def token_count(text: str) -> int:
    return len(tokenize(text))


def bpe_token_estimate(text: str) -> int:
    """BPE-ish upper-bound estimate: ~1 token per 4 chars."""
    return -(-len(text) // 4)


def quality_score(text: str) -> float:
    """Length / punctuation / stopword-ratio quality heuristic in [0,1]."""
    n = len(text)
    if n == 0:
        return 0.0
    toks = tokenize(text)
    punct = len(re.findall(PUNCT_CLASS, text))
    stop = sum(1 for t in toks if t.lower() in STOPWORDS["en"])
    len_score = min(n / 500.0, 1.0)
    punct_ratio = punct / n
    stop_ratio = stop / len(toks) if toks else 0.0
    return round(0.5 * len_score + 0.3 * min(stop_ratio * 5, 1.0) + 0.2 * (1.0 - min(punct_ratio * 10, 1.0)), 6)


def detect_language(text: str) -> str:
    toks = [t.lower() for t in tokenize(text)]
    best, best_score = "unknown", 0
    for lang, words in STOPWORDS.items():
        score = sum(1 for t in toks if t in words
                    or (lang == "ko" and re.search(_KO_HANGUL, t)))
        if score > best_score:
            best, best_score = lang, score
    return best


# ------------------------------------------------------------- spark columns


def tokens_col(text: Column) -> Column:
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count_col(text: Column) -> Column:
    return F.size(tokens_col(text))


def bpe_token_estimate_col(text: Column) -> Column:
    return F.ceil(F.length(text) / F.lit(4.0)).cast("bigint")


def stopword_count_col(text: Column, lang: str = "en") -> Column:
    words = STOPWORDS[lang]
    return F.size(F.filter(tokens_col(F.lower(text)), lambda t: t.isin(*words)))


def punct_count_col(text: Column) -> Column:
    return F.length(text) - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))


def quality_score_col(text: Column) -> Column:
    n = F.length(text).cast("double")
    ntok = token_count_col(text).cast("double")
    stop = stopword_count_col(text).cast("double")
    punct = punct_count_col(text).cast("double")
    len_score = F.least(n / 500.0, F.lit(1.0))
    stop_score = F.least(stop / ntok * 5.0, F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct / n * 10.0, F.lit(1.0))
    raw = 0.5 * len_score + 0.3 * F.when(ntok > 0, stop_score).otherwise(0.0) + 0.2 * punct_score
    return F.when(n == 0, 0.0).otherwise(F.round(raw, 6))


def _hits(toks: Column, lang: str) -> Column:
    words = STOPWORDS[lang]

    def pred(t):
        hit = t.isin(*words)
        if lang == "ko":  # a token containing Hangul is a ko hit
            hit = hit | t.rlike(_KO_HANGUL)
        return hit

    return F.size(F.filter(toks, pred))


def detect_language_col(text: Column) -> Column:
    """Argmax of per-language profile hits (stopword membership; for ko
    additionally token-contains-Hangul); ties → first language in profile
    order with the max score, 'unknown' when all scores are zero."""
    toks = tokens_col(F.lower(text))
    best = F.greatest(*[_hits(toks, lang) for lang in STOPWORDS])
    expr = F.lit("unknown")
    # reverse order so earlier profiles win ties
    for lang in reversed(list(STOPWORDS)):
        expr = F.when((_hits(toks, lang) == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint_col(text: Column) -> Column:
    """md5 over lowercase whitespace-collapsed text — the exact-dedup key."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")))


def shingle_fingerprint_col(text: Column, k: int = 3) -> Column:
    """Rolling document fingerprint: min md5 over k-token shingles (a 1-hash
    MinHash / winnowing-style signature). Falls back to the full-text
    fingerprint for documents shorter than k tokens."""
    toks = tokens_col(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")))
    n = F.size(toks)
    shingle_hashes = F.transform(
        F.sequence(F.lit(1), n - F.lit(k - 1)),
        lambda i: F.md5(F.array_join(F.slice(toks, i, k), " ")),
    )
    return F.when(n >= k, F.array_min(shingle_hashes)).otherwise(fingerprint_col(text))


def repetition_ratio_col(text: Column, n: int = 3) -> Column:
    """Fraction of duplicated n-gram occurrences (C4/RefinedWeb-style quality
    signal): 1 - distinct_ngrams/total_ngrams; 0.0 for texts shorter than n
    tokens. High values flag boilerplate/spam for pipeline filtering."""
    toks = tokens_col(F.lower(text))
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + F.lit(j)) for j in range(n)]),
    )
    total = F.size(grams).cast("double")
    distinct = F.size(F.array_distinct(grams)).cast("double")
    return F.when(
        F.size(toks) >= n, F.round(F.lit(1.0) - distinct / total, 6)
    ).otherwise(F.lit(0.0))


EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"


def scrub_pii_col(text: Column) -> Column:
    """Mask emails and URLs (the minimal PII-scrub pass every training-data
    pipeline runs before publication). Pure regexp_replace — JVM-side."""
    masked = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(masked, URL_RE, "<URL>")


def pii_counts_col(text: Column):
    """(n_emails, n_urls) found in the text."""
    return (
        F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), F.lit(0))).cast("bigint"),
        F.size(F.regexp_extract_all(text, F.lit(URL_RE), F.lit(0))).cast("bigint"),
    )
