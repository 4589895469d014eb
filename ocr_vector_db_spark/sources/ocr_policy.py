"""Vision-OCR invocation policy (deterministic gate before the provider).

Port of the reference's Vision Invocation Policy
(ingestion/parsers/pymupdf_parser.py:675-759): a page/document goes to the
(expensive, rate-limited) vision OCR provider ONLY when deterministic text
extraction failed BOTH checks:

  Rule 1 — text sufficiency: total text chars >= 100 AND alnum ratio >= 0.3
           → sufficient text means vision is never invoked;
  Rule 2 — code patterns: >= 2 of the 10 code regexes match
           → code-bearing docs keep the deterministic extraction (vision
             re-typesetting code is worse than the raw text layer).

Two implementations with identical thresholds:
- plain-Python over parsed segments (the per-file parse path inside
  mapInPandas, mirroring the reference's per-document control flow);
- Column predicates (the 100 TB path): the gate becomes a `filter` on the
  asset DataFrame BEFORE `ocr_with_cache`, so the provider anti-join fans
  out only over rows the policy admits. The column alnum class is
  [A-Za-z0-9가-힣] (the reference corpus is KO/EN) — a deterministic,
  oracle-portable approximation of Python's str.isalnum().
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MIN_TOTAL_CHARS = 100
MIN_ALPHA_RATIO = 0.3
MIN_CODE_PATTERNS = 2

# the 10 code-pattern regexes (pymupdf_parser.py:718-729), verbatim —
# they define the policy's golden behavior
CODE_PATTERNS = [
    r"\bdef\s+\w+",
    r"\bclass\s+\w+",
    r"\bimport\s+\w+",
    r"\bfrom\s+\w+\s+import",
    r"\bfunction\s+\w+",
    r"\bconst\s+\w+",
    r"\blet\s+\w+",
    r"\bvar\s+\w+",
    r"\basync\s+",
    r"\bawait\s+",
]

_ALNUM_CLASS = "A-Za-z0-9가-힣"


# ------------------------------------------------------------- Python (file)


def is_text_sufficient(
    segments: list[dict],
    min_total_chars: int = MIN_TOTAL_CHARS,
    min_alpha_ratio: float = MIN_ALPHA_RATIO,
) -> bool:
    """Rule 1 over parsed segments (text kinds only)."""
    total_text = "".join(s["content"] for s in segments if s["kind"] == "text")
    if len(total_text.strip()) < min_total_chars:
        return False
    alpha = sum(1 for c in total_text if c.isalnum())
    return alpha / max(1, len(total_text)) >= min_alpha_ratio


def has_code_patterns(
    segments: list[dict], min_patterns: int = MIN_CODE_PATTERNS
) -> bool:
    """Rule 2 over parsed segments."""
    all_text = " ".join(s["content"] for s in segments if s["kind"] == "text")
    n = sum(1 for p in CODE_PATTERNS if re.search(p, all_text))
    return n >= min_patterns


def should_invoke_vision(segments: list[dict]) -> bool:
    """Vision allowed only when BOTH rules fail."""
    if is_text_sufficient(segments):
        return False
    if has_code_patterns(segments):
        return False
    return True


# ------------------------------------------------------------ Column (scale)


def alnum_ratio_col(text: Column) -> Column:
    """alnum chars / total chars; 0.0 for empty text (ANSI-safe guard)."""
    total = F.length(text)
    alnum = F.length(F.regexp_replace(text, f"[^{_ALNUM_CLASS}]", ""))
    return F.when(total > 0, alnum.cast("double") / total).otherwise(F.lit(0.0))


def text_sufficient_col(text: Column) -> Column:
    return (F.length(F.trim(text)) >= MIN_TOTAL_CHARS) & (
        alnum_ratio_col(text) >= MIN_ALPHA_RATIO
    )


def code_pattern_count_col(text: Column) -> Column:
    out = F.lit(0)
    for p in CODE_PATTERNS:
        out = out + F.when(text.rlike(p), 1).otherwise(0)
    return out


def vision_allowed_col(text: Column) -> Column:
    """The full policy as one predicate: NOT sufficient AND < 2 code hits."""
    return (~text_sufficient_col(text)) & (
        code_pattern_count_col(text) < MIN_CODE_PATTERNS
    )


def gate_assets_for_ocr(assets: DataFrame, text_col: str = "text") -> DataFrame:
    """Filter an asset DataFrame down to the rows the policy admits to the
    OCR provider — compose as `ocr_with_cache(spark, gate_assets_for_ocr(a),
    …)` so the provider fan-out (and the cache anti-join before it) only
    ever sees policy-admitted rows."""
    return assets.filter(vision_allowed_col(F.col(text_col)))
