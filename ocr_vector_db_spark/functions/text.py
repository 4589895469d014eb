"""Text preprocessing: normalization, paragraph splitting, code detection.

Semantics follow the reference's preprocessor (shared/text_utils.py:8-149):
ligature/smart-quote map, fullwidth→halfwidth OCR map, nbsp, per-line trailing
whitespace, newline collapse, OCR import-path fixes, trailing page numbers;
code-block heuristics (CODE_HINT / PY_SIGNS / JS_SIGNS regexes, symbol count,
indentation); language guessing; def/class-boundary code splitting.

These run inside per-document parse stages (already Python via pandas UDFs),
so the pure-Python forms are the hot path here; `normalize_simple_col` is the
JVM-side variant used by SQL-expressible pipelines (fingerprinting).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ligatures / smart punctuation → ASCII.
NORMALIZE_MAP = {
    "ﬃ": "ffi",
    "ﬁ": "fi",
    "ﬂ": "fl",
    "’": "'",
    "‘": "'",
    "“": '"',
    "”": '"',
    "–": "-",
    "—": "-",
}

# Fullwidth → halfwidth OCR artifacts.
OCR_ARTIFACT_MAP = {
    "（": "(", "）": ")", "，": ",", "：": ":", "；": ";",
    "｛": "{", "｝": "}", "［": "[", "］": "]", "．": ".",
    "　": " ", "！": "!", "？": "?", "＝": "=", "＋": "+",
    "－": "-", "＊": "*", "／": "/", "＜": "<", "＞": ">",
}

# General OCR error corrections (pattern, replacement), applied multiline.
OCR_FIX_PATTERNS = [
    (r"(from\s+[\w_]+),([\w_]+)", r"\1.\2"),      # from pkg,module → pkg.module
    (r"(import\s+[\w_]+),([\w_]+)", r"\1.\2"),
    (r"(\w+)\s+=\s+'", r"\1='"),                   # var = 'x' → var='x'
    (r"\s+\d{1,3}\s*$", ""),                       # trailing page numbers
]

CODE_HINT = re.compile(
    r"```|코드\s+\d+-\d+|;\s*$|{\s*$|^\s*(def|class|import|from|async|await|try|"
    r"except|with|for|while|return|lambda|console\.log|function|const|let|var|=>|"
    r"export\s+default|import\s+.+\s+from)\b",
    re.M,
)
PY_SIGNS = re.compile(
    r"^\s*(def|class|from|import|try|except|with|async|await|lambda)\b|:\s*$", re.M
)
JS_SIGNS = re.compile(
    r"^\s*(function|const|let|var|class|export|import)\b|=>|;\s*$|{\s*$", re.M
)

# ---------------------------------------------------------------- pure python


def normalize(text: str) -> str:
    for src, dst in NORMALIZE_MAP.items():
        text = text.replace(src, dst)
    for src, dst in OCR_ARTIFACT_MAP.items():
        text = text.replace(src, dst)
    text = text.replace(" ", " ")
    text = re.sub(r"[ \t]+\n", "\n", text)
    text = re.sub(r"\n{3,}", "\n\n", text)
    for pattern, repl in OCR_FIX_PATTERNS:
        text = re.sub(pattern, repl, text, flags=re.M)
    return text.strip()


def split_paragraph(text: str) -> list[str]:
    return [p.strip() for p in re.split(r"\n{2,}", text) if p.strip()]


def is_code_block(paragraph: str) -> bool:
    if "```" in paragraph:
        return True
    if CODE_HINT.search(paragraph):
        return True
    if PY_SIGNS.search(paragraph) or JS_SIGNS.search(paragraph):
        return True
    symbols = sum(paragraph.count(x) for x in (";", "{", "}", "=>", "()", "[]", "):"))
    if symbols >= 2:
        return True
    if len(re.findall(r"(?m)^\s{4,}\S", paragraph)) >= 2:
        return True
    return False


def guess_code_lang(paragraph: str) -> str | None:
    py = len(PY_SIGNS.findall(paragraph))
    js = len(JS_SIGNS.findall(paragraph))
    if py >= js and py > 0:
        return "python"
    if js >= py and js > 0:
        return "javascript"
    if re.search(r"^\s*def\s+", paragraph, re.M) or re.search(
        r"^\s*class\s+\w+:\s*$", paragraph, re.M
    ):
        return "python"
    if "console.log" in paragraph or "=>" in paragraph or re.search(r";\s*$", paragraph, re.M):
        return "javascript"
    return None


def split_code_safely(code: str, max_chars: int = 900, overlap_lines: int = 10) -> list[str]:
    """Split code on def/class boundaries; oversize blocks become line-packed
    chunks ≤ max_chars with `overlap_lines` of trailing-line overlap."""
    blocks = re.split(r"(?m)^(?=def\s+\w+\(|class\s+\w+:)", code)
    chunks: list[str] = []
    for block in blocks:
        if len(block) <= max_chars:
            if block.strip():
                chunks.append(block)
            continue
        lines = block.splitlines()
        start = 0
        while start < len(lines):
            current: list[str] = []
            acc, i = 0, start
            while i < len(lines) and acc + len(lines[i]) + 1 <= max_chars:
                current.append(lines[i])
                acc += len(lines[i]) + 1
                i += 1
            if not current:
                current = [lines[start][:max_chars]]
                i = start + 1
            chunk = "\n".join(current).strip()
            if chunk:
                chunks.append(chunk)
            next_start = max(0, i - overlap_lines)
            start = next_start if next_start > start else i
    return chunks


def normalize_lang(lang: str | None) -> str | None:
    """py→python, js/ts/jsx→javascript (reference: ingestion/parsers/markdown.py:19-28)."""
    if not lang:
        return None
    low = lang.strip().lower()
    if low in ("py", "python", "python3"):
        return "python"
    if low in ("js", "ts", "jsx", "tsx", "javascript", "typescript", "node"):
        return "javascript"
    return low


# ------------------------------------------------------------- spark columns


def normalize_simple_col(c: Column) -> Column:
    """JVM-side light normalization (lowercase, collapse whitespace, trim) —
    the SQL-expressible subset used for fingerprinting / dedup keys."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def normalize_lang_col(c: Column) -> Column:
    low = F.lower(F.trim(c))
    return (
        F.when(low.isin("py", "python", "python3"), F.lit("python"))
        .when(low.isin("js", "ts", "jsx", "tsx", "javascript", "typescript", "node"), F.lit("javascript"))
        .otherwise(low)
    )
