"""Sequential unitization automaton.

Groups a document's ordered segments into semantic units that preserve
python→javascript adjacency, matching the reference automaton
(ingestion/segmentation.py:40-146):

- text segments buffer as potential pre_text (cap `max_pre_text_chars`;
  overflow flushes the buffer as a text-only unit when ≥ threshold, else
  drains oldest as role 'other');
- a python code segment claims the buffered pre_text, consumes the python
  run, optionally bridges ≤ `bridge_text_max` texts, then consumes an
  adjacent javascript run (roles pre_text / python / bridge_text /
  javascript / post_text);
- lone javascript and non-text/non-python segments flush the buffer and
  emit as 'other';
- trailing buffer ≥ `text_unit_threshold` chars becomes a text_unit.

Unit ids are deterministic content hashes (segmentation.py:148-182):
  code unit: md5(last-2 pre-texts[:100] + '|' + code[:500])[:16]
  text unit: 'txt-' + md5(first-5 texts[:200])[:12]

This is inherently an ordered per-document scan, so it runs inside
`applyInPandas` after repartition(document_id) + sort by order — a document
always fits one partition (documents are books, not terabytes), and the
stage scales linearly with the number of documents.
"""

from __future__ import annotations

import hashlib
from typing import Any

Segment = dict[str, Any]


def _code_unit_id(code_segment: Segment, pre_text: list[Segment]) -> str:
    pre = "".join(s["content"][:100] for s in pre_text[-2:])
    key = f"{pre}|{code_segment['content'][:500]}"
    return hashlib.md5(key.encode("utf-8", errors="ignore")).hexdigest()[:16]


def _text_unit_id(text_segments: list[Segment]) -> str:
    key = "".join(s["content"][:200] for s in text_segments[:5])
    return "txt-" + hashlib.md5(key.encode("utf-8", errors="ignore")).hexdigest()[:12]


def unitize(
    segments: list[Segment],
    attach_pre_text: bool = True,
    attach_post_text: bool = False,
    bridge_text_max: int = 0,
    max_pre_text_chars: int = 4000,
    text_unit_threshold: int = 500,
) -> list[Segment]:
    """Return segments + {unit_id, unit_role}; order of emission preserved."""
    out: list[Segment] = []
    buf: list[Segment] = []
    buf_chars = 0

    def emit(seg: Segment, unit_id: str | None, role: str) -> None:
        out.append({**seg, "unit_id": unit_id, "unit_role": role})

    def drain_buffer_as_other() -> None:
        nonlocal buf_chars
        while buf:
            emit(buf.pop(0), None, "other")
        buf_chars = 0

    i, total = 0, len(segments)
    while i < total:
        seg = segments[i]
        kind, lang = seg["kind"], seg.get("language")

        if kind == "text":
            buf.append(seg)
            buf_chars += len(seg["content"])
            while buf_chars > max_pre_text_chars and buf:
                if buf_chars >= text_unit_threshold:
                    uid = _text_unit_id(buf)
                    for b in buf:
                        emit(b, uid, "text_unit")
                    buf.clear()
                    buf_chars = 0
                else:
                    old = buf.pop(0)
                    buf_chars -= len(old["content"])
                    emit(old, None, "other")
            i += 1
            continue

        if kind == "code" and lang == "python":
            uid = _code_unit_id(seg, buf if attach_pre_text else [])
            if attach_pre_text and buf:
                for b in buf:
                    emit(b, uid, "pre_text")
                buf.clear()
                buf_chars = 0
            else:
                drain_buffer_as_other()

            while i < total and segments[i]["kind"] == "code" and segments[i].get("language") == "python":
                emit(segments[i], uid, "python")
                i += 1

            bridged = 0
            while bridged < bridge_text_max and i < total and segments[i]["kind"] == "text":
                emit(segments[i], uid, "bridge_text")
                i += 1
                bridged += 1

            if i < total and segments[i]["kind"] == "code" and segments[i].get("language") == "javascript":
                while (
                    i < total
                    and segments[i]["kind"] == "code"
                    and segments[i].get("language") == "javascript"
                ):
                    emit(segments[i], uid, "javascript")
                    i += 1
                if attach_post_text:
                    while i < total and segments[i]["kind"] == "text":
                        nxt = segments[i + 1] if i + 1 < total else None
                        if nxt and nxt["kind"] == "code" and nxt.get("language") == "python":
                            buf.append(segments[i])
                            buf_chars += len(segments[i]["content"])
                            i += 1
                            break
                        emit(segments[i], uid, "post_text")
                        i += 1
            continue

        # lone javascript or any other kind: flush buffer, emit as other
        drain_buffer_as_other()
        emit(seg, None, "other")
        i += 1

    if buf:
        if buf_chars >= text_unit_threshold:
            uid = _text_unit_id(buf)
            for b in buf:
                emit(b, uid, "text_unit")
        else:
            for b in buf:
                emit(b, None, "other")
    return out
