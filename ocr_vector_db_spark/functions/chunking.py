"""Recursive character text chunking (from scratch, no langchain dependency).

Matches the reference chunker's contract (ingestion/chunking.py:12-62):
split on separators in priority order ["\\n\\n", "\\n", " ", ""], pack splits
into chunks of at most `chunk_size` characters with `chunk_overlap` characters
of tail overlap, drop whitespace-only chunks. Profiles used by the reference:
text 600/100 (default), orphans 1500/0, OCR 1200/200, legacy 1200/300.

`chunk_fixed` is the JVM-side fixed-stride variant (pure Spark expressions via
sequence+explode) used where SQL-expressible chunking is preferred.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_SEPARATORS = ["\n\n", "\n", " ", ""]


def _split_on(text: str, sep: str) -> list[str]:
    if sep == "":
        return list(text)
    parts = text.split(sep)
    # Re-attach the separator to the end of each part but the last, so the
    # merged chunks preserve original spacing.
    return [p + sep for p in parts[:-1]] + [parts[-1]]


def _merge_splits(splits: list[str], chunk_size: int, chunk_overlap: int) -> list[str]:
    chunks: list[str] = []
    current: list[str] = []
    total = 0
    for s in splits:
        if total + len(s) > chunk_size and current:
            chunk = "".join(current).strip()
            if chunk:
                chunks.append(chunk)
            # keep a tail of splits as overlap
            while total > chunk_overlap and current:
                total -= len(current[0])
                current.pop(0)
        current.append(s)
        total += len(s)
    chunk = "".join(current).strip()
    if chunk:
        chunks.append(chunk)
    return chunks


def _split_recursive(text: str, separators: list[str], chunk_size: int) -> list[str]:
    """Produce atomic splits, each ≤ chunk_size, using the first separator
    present in the text and recursing with finer separators on oversize parts."""
    sep = separators[-1]
    rest: list[str] = []
    for i, s in enumerate(separators):
        if s == "" or s in text:
            sep, rest = s, separators[i + 1 :]
            break
    out: list[str] = []
    for part in _split_on(text, sep):
        if len(part) <= chunk_size or not rest:
            out.append(part)
        else:
            out.extend(_split_recursive(part, rest, chunk_size))
    return out


class TextChunker:
    def __init__(
        self,
        chunk_size: int = 600,
        chunk_overlap: int = 100,
        separators: list[str] | None = None,
    ):
        self.chunk_size = chunk_size
        self.chunk_overlap = min(chunk_overlap, chunk_size - 1) if chunk_size > 1 else 0
        self.separators = separators or DEFAULT_SEPARATORS

    def chunk(self, text: str) -> list[str]:
        if not text or not text.strip():
            return []
        splits = _split_recursive(text, self.separators, self.chunk_size)
        return _merge_splits(splits, self.chunk_size, self.chunk_overlap)


def chunk_fixed_col(text: Column, size: int, stride: int) -> Column:
    """array<struct<chunk_index:int, chunk:string>> of fixed-size/stride slices.

    Pure built-in expressions (sequence → transform → substring), so chunking
    stays JVM-side and `explode` distributes the result. stride ≤ size gives
    (size - stride) chars of overlap between consecutive chunks.
    """
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.length(text) - F.lit(size)) / F.lit(stride)).cast("int") + F.lit(1),
    )
    idx = F.sequence(F.lit(0), n_chunks - F.lit(1))
    return F.transform(
        idx,
        lambda i: F.struct(
            i.cast("int").alias("chunk_index"),
            F.substring(text, i * F.lit(stride) + F.lit(1), F.lit(size)).alias("chunk"),
        ),
    )
