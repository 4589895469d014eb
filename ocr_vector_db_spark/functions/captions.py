"""Caption detection, header extraction, sentence-boundary truncation.

Legacy parent-builder scalar ops (app/parents.py:11-18, 94-182), exposed both
as pure Python and as Spark columns (rlike/regexp_extract — JVM-side).

- headers: markdown `#`-headings, `Chapter N`, `제 N 장`, numbered sections,
  with an uppercase-line fallback;
- captions: `Figure/Fig./Table/그림 N` lines; caption AUGMENTATION turns each
  matched line (plus a short following line) into a synthetic fragment with
  view table|figure — extra searchable rows, exactly how the reference feeds
  figure/table search;
- _first_sentences: sentence-boundary truncation to a char budget.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEADER_HINT = re.compile(
    r"^(?:#{1,3}\s+.+|Chapter\s+\d+\b|제\s*\d+\s*장|\d+\.\d+\s+.+)", re.M
)
CAPTION_HINT = re.compile(r"(?im)^(?:figure|fig\.|table|그림)\s*\d+[:\.]?\s+.+")
CAPTION_LINE_RE = re.compile(
    r"(?im)^(?P<prefix>(?:figure|fig\.|table|그림))\s*\d+[:\.]?\s+.+$"
)

HEADER_HINT_JAVA = r"(?m)^(?:#{1,3}\s+.+|Chapter\s+\d+\b|제\s*\d+\s*장|\d+\.\d+\s+.+)"
CAPTION_HINT_JAVA = r"(?mi)^(?:figure|fig\.|table|그림)\s*\d+[:\.]?\s+.+"

# ---------------------------------------------------------------- pure python


def extract_header(text: str) -> str | None:
    m = HEADER_HINT.search(text)
    if m:
        return m.group(0).strip()
    for line in text.splitlines():
        stripped = line.strip()
        if not stripped or len(stripped) > 80:
            continue
        if sum(c.isupper() for c in stripped) >= max(3, len(stripped) // 2):
            return stripped
    return None


def extract_caption(text: str) -> str | None:
    m = CAPTION_HINT.search(text)
    return m.group(0).strip() if m else None


def first_sentences(text: str, max_chars: int = 1200) -> str:
    stripped = text.strip()
    parts = re.split(r"(?<=[.!?]\s)\s+|\n+", stripped)
    out: list[str] = []
    total = 0
    for part in parts:
        if not part.strip():
            continue
        if total + len(part) + 1 > max_chars:
            break
        out.append(part.strip())
        total += len(part) + 1
        if total >= max_chars:
            break
    return " ".join(out) if out else stripped[:max_chars]


# ------------------------------------------------------------- spark columns


def header_col(text: Column) -> Column:
    """First header-like line (regexp_extract; uppercase fallback omitted —
    that branch needs per-line state and lives in the Python path)."""
    extracted = F.regexp_extract(text, HEADER_HINT_JAVA, 0)
    return F.when(extracted != "", F.trim(extracted))


def caption_col(text: Column) -> Column:
    extracted = F.regexp_extract(text, CAPTION_HINT_JAVA, 0)
    return F.when(extracted != "", F.trim(extracted))


def has_caption_col(text: Column) -> Column:
    return text.rlike(CAPTION_HINT_JAVA)


def augment_with_captions(fragments: DataFrame, text_col: str = "content") -> DataFrame:
    """Explode caption lines of text fragments into synthetic caption rows
    (view = table|figure, kind = caption) — app/parents.py:110-135 as a
    filter → explode → project chain, fully JVM-side."""
    lines = F.split(F.col(text_col), "\n")
    cap_lines = F.filter(lines, lambda ln: F.trim(ln).rlike(CAPTION_HINT_JAVA))
    exploded = (
        fragments.filter(F.col("view") == "text")
        .withColumn("__cap", F.explode(cap_lines))
        .withColumn("__cap", F.trim("__cap"))
    )
    view = F.when(
        F.lower(F.col("__cap")).rlike(r"^table"), F.lit("table")
    ).otherwise(F.lit("figure"))
    return (
        exploded.withColumn("content", F.col("__cap"))
        .withColumn("view", view)
        .withColumn("unit_role", F.lit("caption"))
        .drop("__cap")
    )
