"""Unitized segments → Concepts + Fragments (per document).

Matches the reference builder (ingestion/concept_builder.py:26-243):
- segments sharing a unit_id form one Concept with document-scoped id
  md5(document_id|unit_id)[:16]; fragment order = position within unit;
- segments without a unit_id pool into ONE orphans concept
  f"{doc[:8]}-orphans-{md5(first-5 contents[:100])[:8]}"; its text segments
  are concatenated and re-chunked 1500/0 (role chunked_text), non-text
  orphans kept individually;
- fragment id = f"{concept_id[:12]}-{order}-{md5(content[:200])[:8]}";
- kind→view mapping: text/code/image, anything else → text.

Concept order follows first-appearance of each unit in the document, with
the orphans concept last — deterministic for a given segment order.
"""

from __future__ import annotations

from typing import Any

from ocr_vector_db_spark.functions import hashing
from ocr_vector_db_spark.functions.chunking import TextChunker

Segment = dict[str, Any]

KIND_TO_VIEW = {"text": "text", "code": "code", "image": "image"}


def _fragment(concept_id: str, content: str, kind: str, language: str | None,
              order: int, unit_role: str) -> dict:
    return {
        "id": hashing.fragment_id(concept_id, order, content),
        "concept_id": concept_id,
        "content": content,
        "view": KIND_TO_VIEW.get(kind, "text"),
        "language": language,
        "order": order,
        "metadata": {"unit_role": unit_role, "original_kind": kind},
    }


def build_concepts(
    unitized: list[Segment],
    document_id: str,
    orphan_chunk_size: int = 1500,
) -> tuple[list[dict], list[dict]]:
    """Return (concepts, fragments)."""
    unit_groups: dict[str, list[Segment]] = {}
    orphans: list[Segment] = []
    for seg in unitized:
        uid = seg.get("unit_id")
        if uid:
            unit_groups.setdefault(uid, []).append(seg)
        else:
            orphans.append(seg)

    concepts: list[dict] = []
    fragments: list[dict] = []
    order = 0

    for unit_id, segs in unit_groups.items():  # dict preserves first-appearance order
        cid = hashing.concept_id(document_id, unit_id)
        concepts.append({
            "id": cid,
            "document_id": document_id,
            "order": order,
            "content": None,  # synthesized downstream (operators/parents.py)
            "metadata": {"unit_type": "semantic_unit", "original_unit_id": unit_id},
        })
        for idx, seg in enumerate(segs):
            fragments.append(
                _fragment(cid, seg["content"], seg["kind"], seg.get("language"), idx, seg["unit_role"])
            )
        order += 1

    if orphans:
        import hashlib

        key = "".join(s["content"][:100] for s in orphans[:5])
        h8 = hashlib.md5(key.encode("utf-8", errors="ignore")).hexdigest()[:8]
        cid = f"{document_id[:8]}-orphans-{h8}"
        concepts.append({
            "id": cid,
            "document_id": document_id,
            "order": order,
            "content": None,
            "metadata": {"unit_type": "orphans"},
        })
        texts = [s for s in orphans if s["kind"] == "text"]
        others = [s for s in orphans if s["kind"] != "text"]
        idx = 0
        if texts:
            combined = "\n\n".join(s["content"] for s in texts)
            for chunk in TextChunker(chunk_size=orphan_chunk_size, chunk_overlap=0).chunk(combined):
                fragments.append(_fragment(cid, chunk, "text", None, idx, "chunked_text"))
                idx += 1
        for seg in others:
            fragments.append(
                _fragment(cid, seg["content"], seg["kind"], seg.get("language"), idx, seg["unit_role"])
            )
            idx += 1

    return concepts, fragments
