"""Ingest pipeline tests: parsers, unitizer (incl. parity with the reference
automaton when /root/reference is present), concept builder, and the full
distributed pipeline on fixture files."""

import os
import random

import pytest

from ocr_vector_db_spark.functions import hashing
from ocr_vector_db_spark.sources import parsers
from ocr_vector_db_spark.sources.concept_builder import build_concepts
from ocr_vector_db_spark.sources.segmentation import unitize

MD_FIXTURE = """# Decorators

Python decorators wrap functions to extend behavior without modifying them.

```python
def retry(fn):
    def inner(*a, **kw):
        return fn(*a, **kw)
    return inner
```

The same idea in JavaScript uses higher-order functions:

```js
const retry = (fn) => (...a) => fn(...a);
```

![decorator diagram](images/decorator.png)

Closing remarks about composition and reuse of behavior wrappers.
"""

OCR_FIXTURE = """OCR OUTPUT PAGE
this is a short
broken line that
should merge into
one paragraph because each line is tiny
코드 1-1
from os,path import join
42
Copyright © 2021 Publisher
"""


def test_parse_markdown_segments():
    segs = parsers.parse_markdown(MD_FIXTURE)
    kinds = [s["kind"] for s in segs]
    assert "code" in kinds and "image" in kinds and "text" in kinds
    code = [s for s in segs if s["kind"] == "code"]
    assert code[0]["language"] == "python" and "def retry" in code[0]["content"]
    assert code[1]["language"] == "javascript"
    img = next(s for s in segs if s["kind"] == "image")
    assert "decorator diagram" in img["content"] and "images/decorator.png" in img["content"]
    # orders are consecutive from 0
    assert [s["order"] for s in segs] == list(range(len(segs)))


def test_parse_ocr_merges_lines():
    merged = parsers.merge_ocr_lines(
        "short line\nanother short\nthird bit of text\n코드 1-1\nx = 1"
    )
    paras = merged.split("\n\n")
    assert any("short line another short" in p for p in paras)
    assert any(p.startswith("코드 1-1") for p in paras)  # code marker breaks paragraph


def test_parse_plain_text_classifies_code():
    segs = parsers.parse_plain_text(
        "A plain paragraph of prose that says nothing.\n\ndef f():\n    return 1"
    )
    assert [s["kind"] for s in segs] == ["text", "code"]
    assert segs[1]["language"] == "python"


def test_pdf_blocks_merge_and_stub():
    blocks = [
        {"kind": "text", "content": "First text block with enough chars.", "page": 0, "bbox": None},
        {"kind": "text", "content": "tiny", "page": 0, "bbox": None},  # dropped (<10)
        {"kind": "image", "content": "img-ref-1", "page": 0, "bbox": [0, 0, 1, 1]},
        {"kind": "text", "content": "Second text block also long enough here.", "page": 1, "bbox": None},
    ]
    segs = parsers.parse_pdf_blocks(blocks)
    assert [s["kind"] for s in segs] == ["text", "image", "text"]
    # decode_pdf routes to the pure-Python extractor (no PyMuPDF here);
    # an empty/garbage PDF yields no blocks rather than raising
    assert parsers.decode_pdf(b"%PDF-1.4") == []


def test_unitizer_basic_shapes():
    segs = [
        {"kind": "text", "content": "intro " * 30, "language": None, "order": 0},
        {"kind": "code", "content": "def f():\n    pass", "language": "python", "order": 1},
        {"kind": "code", "content": "const x = 1;", "language": "javascript", "order": 2},
        {"kind": "text", "content": "trailing " * 80, "language": None, "order": 3},
    ]
    out = unitize(segs)
    roles = [s["unit_role"] for s in out]
    assert roles[:3] == ["pre_text", "python", "javascript"]
    assert out[0]["unit_id"] == out[1]["unit_id"] == out[2]["unit_id"]
    assert out[3]["unit_role"] == "text_unit" and out[3]["unit_id"].startswith("txt-")


def _random_segments(rng: random.Random, n: int):
    segs = []
    for i in range(n):
        kind = rng.choice(["text", "text", "code", "code", "image"])
        if kind == "code":
            lang = rng.choice(["python", "javascript", None])
            content = rng.choice(["def f():\n    pass", "const x = 1;", "SELECT 1"]) + str(i)
        else:
            lang = "image" if kind == "image" else None
            content = ("word " * rng.randint(1, 120)).strip() + str(i)
        segs.append({"kind": kind, "content": content, "language": lang, "order": i})
    return segs


@pytest.mark.skipif(not os.path.exists("/root/reference"), reason="reference not present")
def test_unitizer_parity_with_reference():
    """Randomized cross-check: our automaton must emit the identical
    (unit_id, role, content) stream as the reference implementation
    (ingestion/segmentation.py:40-146) for arbitrary segment streams."""
    import importlib.util
    import sys
    import types

    spec = importlib.util.spec_from_file_location("refmodels", "/root/reference/ingestion/models.py")
    models = importlib.util.module_from_spec(spec)
    sys.modules["refmodels"] = models
    spec.loader.exec_module(models)
    src = open("/root/reference/ingestion/segmentation.py").read().replace(
        "from .models import", "from refmodels import"
    )
    refseg = types.ModuleType("refseg")
    exec(src, refseg.__dict__)

    rng = random.Random(1234)
    for trial in range(40):
        segs = _random_segments(rng, rng.randint(0, 25))
        ref_in = [
            models.RawSegment(s["kind"], s["content"], s["language"], s["order"]) for s in segs
        ]
        for kwargs in (
            {},
            {"attach_post_text": True, "bridge_text_max": 1},
            {"max_pre_text_chars": 200, "text_unit_threshold": 100},
        ):
            ref_out = refseg.SegmentUnitizer(**kwargs).unitize(ref_in)
            got = unitize(segs, **kwargs)
            ref_tuples = [(u.unit_id, u.role, u.segment.content) for u in ref_out]
            got_tuples = [(s["unit_id"], s["unit_role"], s["content"]) for s in got]
            assert got_tuples == ref_tuples, f"trial={trial} kwargs={kwargs}"


def test_concept_builder_hierarchy():
    segs = parsers.parse_markdown(MD_FIXTURE)
    unitized = unitize(segs)
    doc_id = hashing.document_id("/tmp/fixture.md")
    concepts, fragments = build_concepts(unitized, doc_id)
    assert concepts and fragments
    cids = {c["id"] for c in concepts}
    assert all(f["concept_id"] in cids for f in fragments)          # HIER-003
    assert all(c["document_id"] == doc_id for c in concepts)        # HIER-002
    for f in fragments:
        assert f["id"].startswith(f["concept_id"][:12])
    orphan = [c for c in concepts if c["metadata"]["unit_type"] == "orphans"]
    assert len(orphan) <= 1


def test_ingest_end_to_end(spark):
    from ocr_vector_db_spark.sources.ingest import files_df, ingest

    files = files_df(
        spark,
        [
            ("/corpus/decorators.md", MD_FIXTURE, "md"),
            ("/corpus/scan.ocr", OCR_FIXTURE, "ocr"),
        ],
    )
    out = ingest(spark, files, dim=16)
    docs = out["documents"].collect()
    assert len(docs) == 2
    frags = out["fragments"].collect()
    assert len(frags) > 3
    embs = out["embeddings"].collect()
    # eligibility: boilerplate rows (copyright / bare page number) never embed
    contents = [e.content for e in embs]
    assert all("Copyright" not in c for c in contents)
    assert all(len(c) >= 10 for c in contents)
    # EMBED-ID-002 identity + dedup
    assert all(e.doc_id.startswith("doc:") for e in embs)
    assert len({e.doc_id for e in embs}) == len(embs)
    assert all(len(e.embedding) == 16 for e in embs)
    # parents synthesized per concept, code fenced
    parents = {p.id: p.content for p in out["parents"].collect()}
    assert parents
    md_doc = hashing.document_id("/corpus/decorators.md")
    code_parents = [c for c in parents.values() if "```python" in c]
    assert code_parents, "code fragment should be fenced in parent context"
    # concepts belong to their documents
    assert all(
        c.document_id in {md_doc, hashing.document_id("/corpus/scan.ocr")}
        for c in out["concepts"].collect()
    )


def test_parse_fragments_fused_equals_shuffled_path(spark):
    """The fused parse+unitize stage must produce row-identical output to
    parse_segments → build_fragments, with NO exchange between the Python
    stages (parser output is already document-co-located)."""
    from ocr_vector_db_spark.sources.ingest import (
        build_fragments, files_df, parse_fragments, parse_segments,
    )

    docs = [
        ("/t/a.md", "Intro prose paragraph with several words here.\n\n"
         "```python\ndef f(x):\n    return x\n```\n\nMore prose follows.", "md"),
        ("/t/b.txt", "Short line.\nAnother short line that merges.\n\n"
         "Second paragraph of plain text content.", "txt"),
    ]
    fdf = files_df(spark, docs)
    old = sorted(map(tuple, build_fragments(parse_segments(fdf)).collect()))
    new_df = parse_fragments(fdf)
    assert sorted(map(tuple, new_df.collect())) == old
    plan = new_df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
