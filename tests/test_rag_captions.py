"""RAG assembly / conversation memory / captions + headers."""

from pyspark.sql import Row

from ocr_vector_db_spark.functions import captions
from ocr_vector_db_spark.plans import rag


def _result(i, parent=None):
    return Row(
        fragment_id=f"f{i}", content=f"matched content {i}", view="code",
        lang="python", source=f"book{i}.md", similarity=0.9 - i / 100,
        parent_content=parent,
    )


def test_build_context_format():
    ctx = rag.build_context([_result(1, parent="P" * 1000), _result(2)])
    s = ctx.retrieved_content
    assert "[Source 1: book1.md]" in s and "[Source 2: book2.md]" in s
    assert "P" * 800 + "..." in s           # parent preview truncated at 800
    assert "Matched Content [CODE (python)]:" in s
    assert "=" * 40 in s
    assert ctx.source_citations == ["[1] book1.md", "[2] book2.md"]
    prompt = rag.format_rag_prompt("how?", ctx)
    assert "Question: how?" in prompt and "[Source N]" in prompt


def test_generate_and_memory():
    conv = rag.Conversation()
    for i in range(7):
        resp = rag.generate(f"q{i}", [_result(i)], conversation=conv)
    assert len(conv.turns) == 5                    # keep last 5
    hist = conv.get_history_context()
    assert "q6" in hist and "q4" in hist and "q3" not in hist  # prompt last 3
    formatted = resp.format_with_sources()
    assert "Sources:" in formatted and "(code, sim: 0.84)" in formatted


def test_no_results_language_detection():
    assert rag.generate("nothing found?", []).answer.startswith("I couldn't find")
    assert "죄송합니다" in rag.generate("데코레이터란?", []).answer


def test_header_caption_extraction():
    text = "## Intro Section\nFigure 3: a diagram of flows\nbody text here"
    assert captions.extract_header(text) == "## Intro Section"
    assert captions.extract_caption(text) == "Figure 3: a diagram of flows"
    assert captions.extract_header("THE BIG HEADING\nlower text") == "THE BIG HEADING"
    assert captions.extract_header("just lowercase prose") is None
    s = captions.first_sentences("One. Two. Three. " * 50, max_chars=30)
    assert len(s) <= 30 and s.startswith("One.")


def test_caption_cols_and_augmentation(spark):
    df = spark.createDataFrame(
        [
            ("f1", "text", "Intro\nFigure 1: flow chart\nTable 2: stats overview\nshort tail"),
            ("f2", "text", "no captions in here at all"),
            ("f3", "code", "Figure 9: inside code ignored"),
        ],
        ["id", "view", "content"],
    )
    flagged = df.select("id", captions.has_caption_col(df.content).alias("has")).collect()
    assert {r.id: r.has for r in flagged} == {"f1": True, "f2": False, "f3": True}

    aug = captions.augment_with_captions(df).collect()
    assert len(aug) == 2  # two caption lines in f1; f3 skipped (view=code)
    views = {r.content.split(" ")[0]: r.view for r in aug}
    assert views == {"Figure": "figure", "Table": "table"}
    assert all(r.unit_role == "caption" for r in aug)


def test_synthesize_parents_legacy(spark):
    from ocr_vector_db_spark.operators.parents import synthesize_parents_legacy

    frags = spark.createDataFrame(
        [
            ("c1", "## Wrappers Guide\nProse about retry wrappers. More prose follows here.",
             "text", "pre_text", 0),
            ("c1", "Figure 2: retry flow diagram", "text", "pre_text", 1),
            ("c1", "def retry(fn):\n    return fn", "code", "python", 2),
            ("c2", "plain body only, no header at all. second sentence here.",
             "text", "text_unit", 0),
        ],
        ["concept_id", "content", "view", "unit_role", "order"],
    )
    parents = {r.id: r.content for r in synthesize_parents_legacy(frags).collect()}
    assert parents["c1"].startswith("## Wrappers Guide")
    assert "Figure 2: retry flow diagram" in parents["c1"]
    assert "retry wrappers" in parents["c1"]          # body from pre_text
    assert parents["c2"].startswith("plain body only")
