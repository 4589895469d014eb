"""File parsers → RawSegment dicts.

Per-file parsing is inherently sequential Python, so these are pure functions
designed to run inside `mapInPandas` over a files DataFrame (one file per
row); everything downstream of parsing is DataFrame-native.

Semantics match the reference parsers:
- markdown (ingestion/parsers/markdown.py:30-108): stream lines, extract
  ``` fences with language normalization, `![alt](url)` images as segments,
  normalized prose runs between them.
- OCR/plain text (ingestion/parsers/ocr.py:15-145): normalize, optionally
  merge short OCR lines into paragraphs (break on code/heading/long line),
  chunk 1200/200, classify each paragraph/chunk code vs text.
- PDF (ingestion/parsers/pymupdf_parser.py): decode via PyMuPDF when
  importable, else the pure-Python content-stream extractor
  (sources/pdf_decode.py); block merge, min-length filter, the Vision
  Invocation Policy (sources/ocr_policy.py), and the legacy low-density
  check (pdf.py:40-57) all run on either decode path.

A segment dict: {kind, content, language, order, page, bbox}.
"""

from __future__ import annotations

import re
from typing import Any

from ocr_vector_db_spark.functions import text as T
from ocr_vector_db_spark.functions.chunking import TextChunker

Segment = dict[str, Any]

MD_FENCE_RE = re.compile(r"^\s*```\s*([A-Za-z0-9_+-]*)\s*$")
MD_IMAGE_RE = re.compile(r"!\[([^\]]*)\]\(([^)]+)\)")

OCR_CODE_LINE_PATTERNS = [
    r"^코드\s+\d+-\d+",
    r"^(from|import)\s+\w+",
    r"^(def|class|async)\s+\w+",
    r"^\s*(if|for|while|try|with)\s+.*:$",
    r"^(const|let|var|function)\s+",
    r"[{}\[\]();]=",
    r"^\s*#\s*\w+",
]


def _segment(kind: str, content: str, language: str | None, order: int,
             page: int | None = None, bbox: list[float] | None = None) -> Segment:
    return {
        "kind": kind, "content": content, "language": language,
        "order": order, "page": page, "bbox": bbox,
    }


# ------------------------------------------------------------------ markdown


def parse_markdown(raw: str) -> list[Segment]:
    segments: list[Segment] = []
    order = 0
    in_fence = False
    fence_lang: str | None = None
    fence_buf: list[str] = []
    text_buf: list[str] = []

    def emit_code() -> None:
        nonlocal order, in_fence, fence_lang
        code = "\n".join(fence_buf)
        lang = fence_lang or T.normalize_lang(T.guess_code_lang(code) or "unknown")
        segments.append(_segment("code", code, lang, order))
        order += 1
        in_fence, fence_lang = False, None
        fence_buf.clear()

    def flush_text() -> None:
        nonlocal order
        if not text_buf:
            return
        text = "\n".join(text_buf)
        text_buf.clear()
        pos = 0
        for m in MD_IMAGE_RE.finditer(text):
            pre = text[pos : m.start()]
            if pre.strip():
                normalized = T.normalize(pre)
                if normalized:
                    segments.append(_segment("text", normalized, None, order))
                    order += 1
            payload = ((m.group(1) or "").strip() + "\n" + (m.group(2) or "").strip()).strip()
            segments.append(_segment("image", payload, "image", order))
            order += 1
            pos = m.end()
        tail = text[pos:]
        if tail.strip():
            normalized = T.normalize(tail)
            if normalized:
                segments.append(_segment("text", normalized, None, order))
                order += 1

    for line in raw.splitlines():
        m = MD_FENCE_RE.match(line)
        if m:
            if not in_fence:
                flush_text()
                fence_lang = T.normalize_lang((m.group(1) or "").strip() or None)
                in_fence = True
                fence_buf = []
            else:
                emit_code()
            continue
        if in_fence:
            fence_buf.append(line)
        else:
            text_buf.append(line)

    if in_fence and fence_buf:
        emit_code()
    flush_text()
    return segments


# ----------------------------------------------------------------- OCR/text


def looks_like_code_line(line: str) -> bool:
    return any(re.search(p, line) for p in OCR_CODE_LINE_PATTERNS)


def looks_like_heading(line: str) -> bool:
    if re.match(r"^[\d\.]+\s+\S", line) and len(line) < 100:
        return True
    if line.isupper() and len(line) < 50:
        return True
    return line.startswith("#")


def merge_ocr_lines(raw: str, min_paragraph_len: int = 150) -> str:
    """Merge short OCR lines into paragraphs; break on code / heading / long
    line (reference strategy, ocr.py:15-74)."""
    paragraphs: list[str] = []
    buf: list[str] = []
    for line in re.split(r"\n+", raw):
        line = line.strip()
        if not line:
            continue
        if looks_like_code_line(line) or looks_like_heading(line):
            if buf:
                paragraphs.append(" ".join(buf))
                buf = []
            paragraphs.append(line)
        elif len(line) >= min_paragraph_len:
            buf.append(line)
            paragraphs.append(" ".join(buf))
            buf = []
        else:
            buf.append(line)
            if len(" ".join(buf)) >= min_paragraph_len:
                paragraphs.append(" ".join(buf))
                buf = []
    if buf:
        paragraphs.append(" ".join(buf))
    return "\n\n".join(paragraphs)


def _classify(paragraphs: list[str]) -> list[Segment]:
    out: list[Segment] = []
    for i, p in enumerate(paragraphs):
        if T.is_code_block(p):
            out.append(_segment("code", p, T.guess_code_lang(p), i))
        else:
            out.append(_segment("text", p, None, i))
    return out


def parse_plain_text(
    raw: str, is_ocr: bool = False, chunk_size: int = 1200, chunk_overlap: int = 200
) -> list[Segment]:
    raw = T.normalize(raw)
    if is_ocr:
        merged = merge_ocr_lines(raw)
        if not merged.strip():
            return []
        chunks = TextChunker(chunk_size=chunk_size, chunk_overlap=chunk_overlap).chunk(merged)
        return _classify(chunks)
    return _classify(T.split_paragraph(raw))


# ---------------------------------------------------------------------- PDF


def parse_pdf_blocks(blocks: list[dict], merge_limit: int = 1500) -> list[Segment]:
    """Block-level PDF assembly (the post-decode half of
    pymupdf_parser.py:180-569): text blocks <10 chars dropped, adjacent text
    blocks merged up to `merge_limit` chars, image blocks kept as opaque
    segments with page/bbox metadata.

    `blocks` = [{page, bbox, kind: 'text'|'image', content}] — produced by a
    real PyMuPDF decode in production; tests feed synthetic blocks.
    """
    segments: list[Segment] = []
    order = 0
    buf: list[str] = []
    buf_page: int | None = None
    buf_bbox: list[float] | None = None

    def flush() -> None:
        nonlocal order, buf_page, buf_bbox
        if buf:
            segments.append(_segment("text", "\n".join(buf), None, order, buf_page, buf_bbox))
            order += 1
            buf.clear()
            buf_page, buf_bbox = None, None

    for b in blocks:
        if b["kind"] == "text":
            content = T.normalize(b.get("content") or "")
            if len(content) < 10:  # min-text-length block filter (pymupdf_parser.py:548)
                continue
            if buf and sum(len(x) for x in buf) + len(content) > merge_limit:
                flush()
            if not buf:
                buf_page, buf_bbox = b.get("page"), b.get("bbox")
            buf.append(content)
        else:
            flush()
            segments.append(
                _segment("image", b.get("content") or "", "image", order, b.get("page"), b.get("bbox"))
            )
            order += 1
    flush()
    return segments


def decode_pdf(data: bytes) -> list[dict]:
    """Binary PDF → blocks [{page, bbox, kind, content}]. Prefers PyMuPDF
    when importable (full layout/encoding coverage, the reference's primary
    decoder — pymupdf_parser.py:518-569); falls back to the pure-Python
    content-stream extractor (sources/pdf_decode.py) which covers the
    simple-PDF subset from the public spec with no native dependency."""
    try:
        import fitz  # PyMuPDF, optional

        blocks: list[dict] = []
        doc = fitz.open(stream=data, filetype="pdf")
        for page_num in range(len(doc)):
            for b in doc[page_num].get_text("dict", flags=11)["blocks"]:
                bbox = list(b.get("bbox", (0, 0, 0, 0)))
                if b.get("type", 0) == 0:
                    text = "\n".join(
                        "".join(s.get("text", "") for s in line.get("spans", []))
                        for line in b.get("lines", [])
                    )
                    blocks.append(
                        {"page": page_num, "bbox": bbox, "kind": "text", "content": text}
                    )
                else:
                    blocks.append(
                        {"page": page_num, "bbox": bbox, "kind": "image",
                         "content": f"pdf-image Height={b.get('height', 0)} "
                                    f"Width={b.get('width', 0)}"}
                    )
        doc.close()
        return blocks
    except ImportError:
        from ocr_vector_db_spark.sources.pdf_decode import extract_pdf_blocks

        return extract_pdf_blocks(data)


def is_low_text_density(text: str, min_len: int = 500, min_ratio: float = 0.2) -> bool:
    """Legacy low-density check (pdf.py:40-57): extraction likely needs OCR
    when the text is short or mostly non-alphanumeric."""
    if not text or len(text.strip()) < min_len:
        return True
    letters = sum(ch.isalnum() for ch in text)
    return letters / max(1, len(text)) < min_ratio


def parse_pdf(data: bytes, ocr=None, enable_auto_ocr: bool = False,
              merge_limit: int = 1500) -> list[Segment]:
    """Full PDF parse with the Vision Invocation Policy
    (pymupdf_parser.py:180-242):

    1. deterministic block extraction first (decode_pdf → parse_pdf_blocks);
    2. image-only documents (no text blocks) go to OCR if a provider exists;
    3. sufficient text (>=100 chars, alnum ratio >=0.3) → never invoke OCR;
    4. >=2 code patterns → preserve deterministic extraction;
    5. otherwise OCR only if enabled AND a provider is wired; OCR failure
       preserves the deterministic output (Rule 4).

    Text segments are re-classified for embedded code (the reference's
    _detect_code_blocks re-runs the OCR text parser per segment)."""
    from ocr_vector_db_spark.sources.ocr_policy import (
        has_code_patterns, is_text_sufficient,
    )

    blocks = decode_pdf(data)
    merged = parse_pdf_blocks(blocks, merge_limit=merge_limit)
    n_text = sum(1 for b in blocks if b["kind"] == "text")
    n_image = sum(1 for b in blocks if b["kind"] == "image")

    # image segments exist only through OCR (the reference's
    # _process_image_block returns None without a provider; with one, the
    # segment's content IS the normalized OCR text)
    segments: list[Segment] = []
    for s in merged:
        if s["kind"] != "image":
            segments.append(s)
            continue
        if ocr is None:
            continue
        text = ocr(s)
        if text and text.strip():
            segments.append(_segment("image", T.normalize(text), "image",
                                     s["order"], s["page"], s["bbox"]))

    def detect_code(segs: list[Segment]) -> list[Segment]:
        out: list[Segment] = []
        for seg in segs:
            if seg["kind"] != "text":
                out.append(seg)
                continue
            for sub in parse_plain_text(seg["content"], is_ocr=True):
                out.append(_segment(sub["kind"], sub["content"], sub["language"],
                                    seg["order"], seg["page"], seg["bbox"]))
        return out

    if n_text == 0:
        # image-only (or empty/corrupt) document: OCR results if any,
        # else nothing to index
        return segments if n_image > 0 else detect_code(segments)

    if is_text_sufficient(segments) or has_code_patterns(segments):
        return detect_code(segments)

    if enable_auto_ocr and ocr is not None:
        ocr_segs: list[Segment] = []
        for i, b in enumerate(blocks):
            if b["kind"] != "text":
                continue
            text = ocr(b)
            if text and text.strip():
                ocr_segs.append(_segment("text", T.normalize(text), None,
                                         i, b["page"], b["bbox"]))
        if ocr_segs:
            return detect_code(ocr_segs)

    return detect_code(segments)


# ------------------------------------------------------------------ dispatch


def parse_file(source_path: str, raw: str, fmt: str | None = None) -> list[Segment]:
    fmt = fmt or ("md" if source_path.endswith((".md", ".markdown")) else "txt")
    if fmt in ("md", "markdown"):
        return parse_markdown(raw)
    if fmt == "ocr":
        return parse_plain_text(raw, is_ocr=True)
    return parse_plain_text(raw, is_ocr=False)


def expand_file_patterns(patterns: list[str]) -> list[str]:
    """Glob expansion + order-preserving dedup (api/cli/ingest.py:25-51)."""
    import glob

    seen: set[str] = set()
    out: list[str] = []
    for pat in patterns:
        matches = sorted(glob.glob(pat)) or [pat]
        for m in matches:
            if m not in seen:
                seen.add(m)
                out.append(m)
    return out
