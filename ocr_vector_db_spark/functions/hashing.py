"""Deterministic identity hashing.

Re-implements the reference's identity rules (EMBED-ID-002 and friends) as
Spark built-in expressions so identity derivation stays JVM-side:

- content_hash(pid, view, lang, content) = md5("pid|view|lang|content")
  (reference: shared/hashing.py:10-25)
- doc_id = "doc:" + content_hash   (reference: embedding/doc_id.py:9-43)
- concept_id = md5(document_id|unit_id)[:16]   (ingestion/concept_builder.py:94)
- fragment_id = f"{concept_id[:12]}-{order}-{md5(content[:200])[:8]}"
  (ingestion/concept_builder.py:213-217)
- slugify: NFKD → ascii → strip non-word → dashes (shared/hashing.py:28-39)
"""

from __future__ import annotations

import hashlib
import re
import unicodedata

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------- pure python


def content_hash(pid: str, view: str, lang: str | None, content: str) -> str:
    key = f"{pid}|{view}|{lang or ''}|{content}".encode("utf-8", errors="ignore")
    return hashlib.md5(key).hexdigest()


def compute_doc_id(pid: str, view: str, lang: str | None, content: str) -> str:
    return "doc:" + content_hash(pid, view, lang, content)


def concept_id(document_id: str, unit_id: str) -> str:
    return hashlib.md5(f"{document_id}|{unit_id}".encode()).hexdigest()[:16]


def fragment_id(cid: str, order: int, content: str) -> str:
    h = hashlib.md5(content[:200].encode("utf-8", errors="ignore")).hexdigest()[:8]
    return f"{cid[:12]}-{order}-{h}"


def document_id(source_path: str) -> str:
    """doc identity = md5(source_path) (reference: api/use_cases/ingest.py:149)."""
    return hashlib.md5(source_path.encode()).hexdigest()


def slugify(value: str) -> str:
    if not value:
        return ""
    value = unicodedata.normalize("NFKD", value)
    value = value.encode("ascii", "ignore").decode("ascii")
    value = re.sub(r"[^\w\s-]", "", value).strip().lower()
    return re.sub(r"[-\s]+", "-", value)


# ------------------------------------------------------------- spark columns


def content_hash_col(pid: Column, view: Column, lang: Column, content: Column) -> Column:
    """JVM-side md5 of the `pid|view|lang|content` key; null lang → ''."""
    return F.md5(
        F.concat_ws("|", pid, view, F.coalesce(lang, F.lit("")), content)
    )


def doc_id_col(pid: Column, view: Column, lang: Column, content: Column) -> Column:
    return F.concat(F.lit("doc:"), content_hash_col(pid, view, lang, content))


def concept_id_col(document_id: Column, unit_id: Column) -> Column:
    return F.substring(F.md5(F.concat_ws("|", document_id, unit_id)), 1, 16)


def fragment_id_col(cid: Column, order: Column, content: Column) -> Column:
    return F.concat_ws(
        "-",
        F.substring(cid, 1, 12),
        order.cast("string"),
        F.substring(F.md5(F.substring(content, 1, 200)), 1, 8),
    )


def document_id_col(source_path: Column) -> Column:
    return F.md5(source_path)
