"""Unit tests for the pure-Python function layer (no Spark session needed)."""

import hashlib

from ocr_vector_db_spark.functions import chunking, hashing, text, text_analysis, validators, vector


def test_content_hash_matches_reference_rule():
    # md5("pid|view|lang|content") — reference shared/hashing.py:10-25
    expected = hashlib.md5(b"c1|code|python|print(1)").hexdigest()
    assert hashing.content_hash("c1", "code", "python", "print(1)") == expected
    assert hashing.compute_doc_id("c1", "code", "python", "print(1)") == "doc:" + expected
    # None lang → empty string
    assert hashing.content_hash("c1", "text", None, "x") == hashlib.md5(b"c1|text||x").hexdigest()


def test_derived_ids():
    cid = hashing.concept_id("d" * 32, "unit-1")
    assert len(cid) == 16
    fid = hashing.fragment_id(cid, 3, "hello world")
    parts = fid.split("-")
    assert parts[0] == cid[:12] and parts[1] == "3" and len(parts[2]) == 8
    assert hashing.slugify("Héllo,  World!") == "hello-world"


def test_normalize():
    assert text.normalize("ﬁrst “quote”  \nline\n\n\n\nnext") == 'first "quote"\nline\n\nnext'
    # fullwidth → halfwidth
    assert text.normalize("ｆ（ｘ）" .replace("ｆ", "f").replace("ｘ", "x")) == "f(x)"
    # OCR import fix
    assert text.normalize("from os,path import x") == "from os.path import x"


def test_code_detection():
    assert text.is_code_block("def foo():\n    return 1")
    assert text.guess_code_lang("def foo():\n    return 1") == "python"
    assert text.guess_code_lang("const x = () => 1;") == "javascript"
    assert not text.is_code_block("Just a plain sentence about nothing")


def test_split_code_safely():
    code = "\n".join(f"def f{i}():\n" + "    pass\n" * 30 for i in range(3))
    chunks = text.split_code_safely(code, max_chars=200, overlap_lines=2)
    assert all(len(c) <= 200 for c in chunks)
    assert any("def f1" in c for c in chunks)


def test_chunker():
    t = "para one. " * 30 + "\n\n" + "para two. " * 30
    ck = chunking.TextChunker(chunk_size=120, chunk_overlap=20)
    chunks = ck.chunk(t)
    assert chunks and all(len(c) <= 120 for c in chunks)
    assert chunking.TextChunker().chunk("") == []
    assert chunking.TextChunker().chunk("   \n ") == []
    # short text → one chunk
    assert chunking.TextChunker().chunk("hello world") == ["hello world"]


def test_validators():
    assert not validators.is_eligible("short")                       # FRAG-LEN-001
    assert not validators.is_eligible("Copyright © 2023 Someone")    # EMBED-BAN-003
    assert not validators.is_eligible("   42   ")                    # page number
    assert not validators.is_eligible("See Figure 3")                # pure reference
    assert not validators.is_eligible("그림 3 참조")                   # pure reference (KO)
    assert validators.is_eligible("코드 1-1 decorator example heading")  # heading stays
    assert validators.is_eligible("A genuinely informative sentence about Spark.")
    # all-identical lines
    assert not validators.is_eligible("same line\nsame line\nsame line")


def test_embedder_deterministic_unit():
    v1 = vector.embed_text("hello", 64)
    v2 = vector.embed_text("hello", 64)
    assert v1 == v2 and len(v1) == 64
    assert abs(sum(x * x for x in v1) - 1.0) < 1e-9
    assert vector.embed_text("other", 64) != v1


def test_text_analysis():
    assert text_analysis.token_count("  a b   c ") == 3
    assert text_analysis.token_count("") == 0
    assert text_analysis.bpe_token_estimate("abcdefgh") == 2
    assert text_analysis.detect_language("the cat and the hat") == "en"
    assert text_analysis.detect_language("der hund ist nicht da") == "de"
    assert 0.0 <= text_analysis.quality_score("The quick brown fox, and the dog.") <= 1.0
    assert text_analysis.quality_score("") == 0.0
