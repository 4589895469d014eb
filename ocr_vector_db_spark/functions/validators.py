"""Embedding-eligibility validation (domain rules FRAG-LEN-001, EMBED-BAN-*).

Semantics follow the reference validator (embedding/validators.py:32-154):
- minimum 10 characters (FRAG-LEN-001)
- boilerplate rejection: copyright lines, page numbers, reference phrases,
  Korean annotation patterns, all-identical-line content (EMBED-BAN-003/004)
- pure-reference rejection: <15 chars with BOTH an action verb and a target
  object, English or Korean (EMBED-BAN-006)

Exposed both as a pure-Python predicate (unit tests, pandas UDF path) and as
a Spark Column predicate built from `rlike`/`length` so the filter stays
JVM-side and pushes into the scan where possible.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

MIN_LENGTH = 10

COPYRIGHT_PATTERNS = [
    r"^(?i:copyright|저작권)\s+©?\s*\d{4}",
    r"^(?i:all\s+rights\s+reserved|저작권\s*소유|무단\s*전재)",
]
PAGE_NUMBER_PATTERNS = [
    r"^\s*(?i:page|페이지|쪽)\s*\d+\s*$",
    r"^\s*\d+\s*(?i:page|페이지|쪽)\s*$",
    r"^\s*\d+\s*$",
]
REFERENCE_PATTERNS = [
    r"^(?i:see|refer\s+to|reference)\s+(?i:figure|table|section|chapter|appendix)\s+\d+",
    r"(그림|표|도표|사진|이미지|그래프|차트|코드)\s*\d+\s*(참조|참고|보기|확인)",
    r"(장|절)?\s*\d+\s*(장|절|항)\s*(참조|참고|보기)",
    r"(위|아래|다음|이전)\s*(장|절)?\s*(예제|예시|설명|제목|코드|그림|표)\s*(참조|참고)",
]
KOREAN_SPECIFIC_PATTERNS = [
    r"^\s*\[.*?\]\s*$",
    r"^(주|참고|(?i:note|tip|warning|caution))\s*[:]\s*.{0,20}$",
    r"^\s*(다음|위|아래)\s*(과|와)?\s*(같이|같은|처럼)\s*$",
    r"^\s*\d+\.\s*$",
]

ALL_BOILERPLATE = (
    COPYRIGHT_PATTERNS + PAGE_NUMBER_PATTERNS + REFERENCE_PATTERNS + KOREAN_SPECIFIC_PATTERNS
)
BOILERPLATE_RE = re.compile("|".join(ALL_BOILERPLATE), re.MULTILINE)

REFERENCE_VERBS_EN = ["see", "refer", "reference"]
REFERENCE_VERBS_KO = ["참조", "참고", "보기", "확인"]
REFERENCE_TARGETS_EN = ["figure", "table", "section", "chapter", "appendix"]
REFERENCE_TARGETS_KO = ["그림", "표", "도표", "장", "절", "항"]

# ---------------------------------------------------------------- pure python


def is_boilerplate(content: str) -> bool:
    if BOILERPLATE_RE.search(content):
        return True
    lines = [ln.strip() for ln in content.strip().split("\n")]
    nonempty = [ln for ln in lines if ln]
    if len(lines) > 2 and len(set(nonempty)) == 1:
        return True
    return False


def is_pure_reference(content: str) -> bool:
    stripped = content.strip()
    if len(stripped) >= 15:
        return False
    low = stripped.lower()
    if any(v in low for v in REFERENCE_VERBS_EN) and any(
        t in low for t in REFERENCE_TARGETS_EN
    ):
        return True
    if any(v in stripped for v in REFERENCE_VERBS_KO) and any(
        t in stripped for t in REFERENCE_TARGETS_KO
    ):
        return True
    return False


def is_eligible(content: str) -> bool:
    if len(content) < MIN_LENGTH:
        return False
    if is_boilerplate(content):
        return False
    if is_pure_reference(content):
        return False
    return True


# ------------------------------------------------------------- spark columns


def _java_multiline(p: str) -> str:
    """Java regex needs the MULTILINE flag inline; also keeps the per-pattern
    (?i:) groups, which Java supports natively."""
    return f"(?m)(?:{p})"


def is_boilerplate_col(content: Column) -> Column:
    pattern = "|".join(_java_multiline(p) for p in ALL_BOILERPLATE)
    hit_pattern = content.rlike(pattern)
    # all-identical-lines check: >2 lines and exactly one distinct non-empty line
    lines = F.filter(
        F.transform(F.split(F.trim(content), "\n"), F.trim), lambda x: x != ""
    )
    n_lines = F.size(F.split(F.trim(content), "\n"))
    identical = (n_lines > 2) & (F.size(F.array_distinct(lines)) == 1)
    return hit_pattern | identical


def is_pure_reference_col(content: Column) -> Column:
    stripped = F.trim(content)
    low = F.lower(stripped)
    short = F.length(stripped) < 15

    def _any(col: Column, words: list[str]) -> Column:
        cond = F.lit(False)
        for w in words:
            cond = cond | col.contains(w)
        return cond

    en = _any(low, REFERENCE_VERBS_EN) & _any(low, REFERENCE_TARGETS_EN)
    ko = _any(stripped, REFERENCE_VERBS_KO) & _any(stripped, REFERENCE_TARGETS_KO)
    return short & (en | ko)


def is_eligible_col(content: Column) -> Column:
    return (
        (F.length(content) >= MIN_LENGTH)
        & ~is_boilerplate_col(content)
        & ~is_pure_reference_col(content)
    )
