"""PDF decode, parse policy, and OCR-invocation gate tests.

Mirrors the reference behaviors:
- block extraction / merge (pymupdf_parser.py:518-569) on the pure-Python
  decode path (sources/pdf_decode.py);
- Vision Invocation Policy thresholds (pymupdf_parser.py:675-759);
- legacy low-density check (pdf.py:40-57).
"""

import pytest
from pyspark.sql import functions as F

from ocr_vector_db_spark.sources import ocr_policy, parsers
from ocr_vector_db_spark.sources.pdf_decode import build_simple_pdf, extract_pdf_blocks

PROSE = (
    "This paragraph describes the architecture of the retrieval system in "
    "sufficient detail to exercise every text path end to end."
)
CODE_TEXT = "def handler(event):\n    return process(event)\nimport os\nfrom sys import path"


def _pdf(pages, compress=True):
    return build_simple_pdf(pages, compress=compress)


def text_block(text, x=72, y=700, size=12):
    return {"kind": "text", "text": text, "x": x, "y": y, "size": size}


# ------------------------------------------------------------------- decode


class TestPdfDecode:
    def test_round_trip_single_page(self):
        data = _pdf([[text_block(PROSE + "\nSecond line of the block.")]])
        blocks = extract_pdf_blocks(data)
        assert len(blocks) == 1
        assert blocks[0]["kind"] == "text"
        assert blocks[0]["page"] == 0
        assert PROSE in blocks[0]["content"]
        assert "Second line of the block." in blocks[0]["content"]

    def test_uncompressed_stream(self):
        data = _pdf([[text_block(PROSE)]], compress=False)
        assert PROSE in extract_pdf_blocks(data)[0]["content"]

    def test_vertical_gap_splits_blocks(self):
        data = _pdf([[text_block("Upper block content here.", y=720),
                      text_block("Lower block content here.", y=500)]])
        blocks = extract_pdf_blocks(data)
        assert [b["content"] for b in blocks] == [
            "Upper block content here.", "Lower block content here.",
        ]
        assert blocks[0]["bbox"][1] > blocks[1]["bbox"][1]

    def test_multi_page_order(self):
        data = _pdf([[text_block("Page one text.")], [text_block("Page two text.")]])
        blocks = extract_pdf_blocks(data)
        assert [(b["page"], b["content"]) for b in blocks] == [
            (0, "Page one text."), (1, "Page two text."),
        ]

    def test_image_xobject_detected(self):
        data = _pdf([[
            text_block("Caption text above the figure.", y=700),
            {"kind": "image", "x": 72, "y": 420, "w": 180, "h": 120,
             "width": 360, "height": 240},
        ]])
        kinds = [(b["kind"], b["page"]) for b in extract_pdf_blocks(data)]
        assert ("image", 0) in kinds
        img = next(b for b in extract_pdf_blocks(data) if b["kind"] == "image")
        assert img["content"] == "pdf-image Height=240 Width=360"
        assert img["bbox"] == [72.0, 420.0, 252.0, 540.0]

    def test_escapes_and_hex_strings(self):
        # parentheses + backslash escapes via the writer; hex via raw stream
        data = _pdf([[text_block("f(x) = (a\\b) result")]])
        assert "f(x) = (a\\b) result" in extract_pdf_blocks(data)[0]["content"]

    def test_decode_pdf_dispatch_uses_fallback(self):
        # container has no PyMuPDF → decode_pdf must route to pdf_decode
        data = _pdf([[text_block(PROSE)]])
        blocks = parsers.decode_pdf(data)
        assert blocks and PROSE in blocks[0]["content"]

    def test_garbage_returns_no_blocks(self):
        assert extract_pdf_blocks(b"not a pdf at all") == []


class TestStreamLengthScan:
    """/Length slicing in _scan_objects: direct values are exact, indirect
    refs (including multi-digit ones, which the old regex backtracked into)
    and stale direct values fall back to the endstream heuristic."""

    PAYLOAD = b"BT /F1 12 Tf 72 700 Td (indirect length payload) Tj ET"

    def _scan(self, length_token: bytes):
        from ocr_vector_db_spark.sources.pdf_decode import _scan_objects
        data = (
            b"%PDF-1.4\n"
            b"5 0 obj\n<< /Length " + length_token + b" >>\nstream\n"
            + self.PAYLOAD + b"\nendstream\nendobj\n"
            b"10 0 obj\n" + str(len(self.PAYLOAD)).encode() + b"\nendobj\n"
        )
        return _scan_objects(data)[5][1]

    def test_direct_length_exact(self):
        assert self._scan(str(len(self.PAYLOAD)).encode()) == self.PAYLOAD

    def test_indirect_multidigit_length_uses_heuristic(self):
        # `/Length 10 0 R`: the old regex backtracked (\d+) to "1" (and
        # "/Length 123 0 R" to "12"), slicing a 1-byte stream. Must fall
        # back to the endstream heuristic and recover the full payload.
        assert self._scan(b"10 0 R") == self.PAYLOAD

    def test_indirect_threedigit_length_uses_heuristic(self):
        assert self._scan(b"123 0 R") == self.PAYLOAD

    def test_stale_direct_length_falls_back(self):
        # A wrong direct /Length (not followed by endstream at the claimed
        # offset) must not truncate the payload.
        assert self._scan(b"5") == self.PAYLOAD


from ocr_vector_db_spark.sources.pdf_decode import lzw_encode as _lzw_encode


class TestFiltersAndObjectStreams:
    """LZWDecode, TIFF/PNG predictors, and /ObjStm expansion — the PDF
    1.5-era structures real-world files use (ISO 32000-1 §7.4.4, §7.5.7)."""

    def test_lzw_spec_example_vector(self):
        # the worked LZW example of the PDF reference (§7.4.4.2):
        # "-----A---B" encodes to these 9 bytes
        from ocr_vector_db_spark.sources.pdf_decode import _lzw_decode

        assert _lzw_decode(
            b"\x80\x0b\x60\x50\x22\x0c\x0c\x85\x01"
        ) == b"-----A---B"

    def test_lzw_round_trip_with_width_growth(self):
        import random

        from ocr_vector_db_spark.sources.pdf_decode import _lzw_decode

        rnd = random.Random(11)
        # enough distinct bigrams to push the code width past 9 and 10 bits
        data = bytes(rnd.randrange(256) for _ in range(6000))
        assert _lzw_decode(_lzw_encode(data)) == data
        # compressible data exercises long table entries + the KwKwK case
        rep = (b"abcabcabd" * 400) + b"aaaaaaaaaaaaaaaa"
        assert _lzw_decode(_lzw_encode(rep)) == rep

    def test_png_predictors_all_filter_types(self):
        from ocr_vector_db_spark.sources.pdf_decode import _apply_predictor

        w, colors = 6, 3
        rows = [bytes((r * 31 + c * 7) % 256 for c in range(w * colors))
                for r in range(5)]
        raw = b"".join(rows)

        def png_encode(filter_type: int) -> bytes:
            bpp, row_len = colors, w * colors
            out = bytearray()
            prev = bytearray(row_len)
            for row in rows:
                enc = bytearray(row)
                if filter_type == 1:
                    for j in range(row_len - 1, bpp - 1, -1):
                        enc[j] = (enc[j] - row[j - bpp]) & 0xFF
                elif filter_type == 2:
                    for j in range(row_len):
                        enc[j] = (enc[j] - prev[j]) & 0xFF
                elif filter_type == 3:
                    for j in range(row_len):
                        left = row[j - bpp] if j >= bpp else 0
                        enc[j] = (enc[j] - ((left + prev[j]) >> 1)) & 0xFF
                elif filter_type == 4:
                    for j in range(row_len):
                        a = row[j - bpp] if j >= bpp else 0
                        b = prev[j]
                        c = prev[j - bpp] if j >= bpp else 0
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pr = a if (pa <= pb and pa <= pc) else (
                            b if pb <= pc else c)
                        enc[j] = (enc[j] - pr) & 0xFF
                out += bytes([filter_type]) + enc
                prev = bytearray(row)
            return bytes(out)

        for ft in (0, 1, 2, 3, 4):
            assert _apply_predictor(png_encode(ft), 10 + ft, w, colors) == raw

    def test_tiff_predictor(self):
        from ocr_vector_db_spark.sources.pdf_decode import _apply_predictor

        w, colors = 5, 3
        raw = bytes((i * 13) % 256 for i in range(w * colors * 3))
        enc = bytearray(raw)
        row_len = w * colors
        for r0 in range(0, len(enc), row_len):
            for j in range(row_len - 1, colors - 1, -1):
                enc[r0 + j] = (enc[r0 + j] - enc[r0 + j - colors]) & 0xFF
        assert _apply_predictor(bytes(enc), 2, w, colors) == raw

    def test_predicted_flate_image_raster(self):
        """An image XObject whose Flate stream carries PNG predictor 12
        (/DecodeParms) decodes to the original pixels."""
        import zlib as _zlib

        from ocr_vector_db_spark.sources.pdf_decode import (
            _scan_objects,
            decode_image_xobject,
        )

        w, h, colors = 4, 3, 3
        pixels = bytes((i * 11) % 256 for i in range(w * h * colors))
        row_len = w * colors
        # PNG Up filter per row (type 2 → predictor tag 12 covers 10-15)
        enc = bytearray()
        prev = bytearray(row_len)
        for r0 in range(0, len(pixels), row_len):
            row = pixels[r0:r0 + row_len]
            enc += b"\x02" + bytes((row[j] - prev[j]) & 0xFF
                                   for j in range(row_len))
            prev = bytearray(row)
        payload = _zlib.compress(bytes(enc))
        data = (
            b"%PDF-1.5\n7 0 obj\n<< /Type /XObject /Subtype /Image "
            b"/Width 4 /Height 3 /ColorSpace /DeviceRGB "
            b"/BitsPerComponent 8 /Filter /FlateDecode "
            b"/DecodeParms << /Predictor 12 /Colors 3 /Columns 4 >> "
            b"/Length " + str(len(payload)).encode() + b" >>\nstream\n"
            + payload + b"\nendstream\nendobj\n"
        )
        raster = decode_image_xobject(_scan_objects(data), 7)
        assert raster is not None and raster["pixels"] == pixels

    def test_object_stream_page_tree_extracts_text(self):
        """Catalog/pages/page packed in a compressed /ObjStm (how PDF 1.5+
        writers emit them) — the page-tree walk and text extraction must
        see them exactly like top-level objects."""
        from ocr_vector_db_spark.sources.pdf_decode import build_objstm_pdf

        blocks = extract_pdf_blocks(
            build_objstm_pdf("Hello from an object stream")
        )
        assert len(blocks) == 1
        assert blocks[0]["content"] == "Hello from an object stream"
        assert blocks[0]["page"] == 0

    def test_lzw_content_stream_extracts_text(self):
        data = build_simple_pdf(
            [[text_block("LZW compressed content")]], compress="lzw"
        )
        blocks = extract_pdf_blocks(data)
        assert len(blocks) == 1
        assert blocks[0]["content"] == "LZW compressed content"

    def test_predictor_fixture_option_round_trips(self):
        """build_simple_pdf's predictor=12 image form emits /DecodeParms +
        an Up-filtered Flate stream that decodes to the exact pixels."""
        from ocr_vector_db_spark.sources.pdf_decode import extract_pdf_images

        w, h = 6, 4
        pixels = bytes((i * 11) % 256 for i in range(w * h * 3))
        data = build_simple_pdf([[
            {"kind": "image", "x": 0, "y": 400, "w": 120, "h": 80,
             "width": w, "height": h, "channels": 3,
             "pixels": pixels, "predictor": 12},
        ]])
        assert b"/DecodeParms" in data
        (img,) = extract_pdf_images(data)
        assert img["data"] == pixels

    def test_pdf_image_assets_distributed(self, spark):
        """ingest.pdf_image_assets: distributed (mapInPandas) asset
        extraction over binary PDF rows — raw raster and JPEG passthrough
        rows come back with source_path attached."""
        from ocr_vector_db_spark.sources.ingest import (
            pdf_files_df,
            pdf_image_assets,
        )

        raster_pdf = build_simple_pdf([[
            {"kind": "image", "x": 0, "y": 0, "w": 100, "h": 100,
             "width": 4, "height": 4},
        ]])
        jpeg = b"\xff\xd8\xff\xe0 payload \xff\xd9"
        jpeg_pdf = build_simple_pdf([[
            {"kind": "image", "x": 0, "y": 0, "w": 100, "h": 100,
             "width": 8, "height": 8, "jpeg": jpeg},
        ]])
        files = pdf_files_df(spark, [("/a.pdf", raster_pdf),
                                     ("/b.pdf", jpeg_pdf)])
        rows = {r.source_path: r for r in pdf_image_assets(files).collect()}
        assert rows["/a.pdf"].metadata["format"] == "raw"
        assert len(rows["/a.pdf"].data) == 16
        assert rows["/b.pdf"].metadata["format"] == "jpeg"
        assert bytes(rows["/b.pdf"].data) == jpeg


KO_TEXT = "파이썬 데코레이터는 함수를 감싸서\n동작을 확장한다"


class TestCidToUnicode:
    """CID/Identity-H + /ToUnicode decode — the encoding of the reference's
    Korean OCR corpus (pymupdf_parser.py:518-569 handles it via PyMuPDF;
    the pure-Python path must extract identically)."""

    def _korean_pdf(self, compress=True):
        return build_simple_pdf(
            [[
                {"kind": "text", "text": "ASCII heading", "x": 72, "y": 720,
                 "size": 14},
                {"kind": "text", "text": KO_TEXT, "x": 72, "y": 650, "size": 12},
                {"kind": "text", "text": "tail latin text", "x": 72, "y": 560,
                 "size": 12},
            ]],
            compress=compress,
        )

    def test_korean_golden_round_trip(self):
        blocks = extract_pdf_blocks(self._korean_pdf())
        texts = [b["content"] for b in blocks if b["kind"] == "text"]
        assert texts == ["ASCII heading", KO_TEXT, "tail latin text"]

    def test_korean_uncompressed_identical(self):
        a = [b["content"] for b in extract_pdf_blocks(self._korean_pdf())]
        b_ = [b["content"] for b in extract_pdf_blocks(self._korean_pdf(False))]
        assert a == b_

    def test_pymupdf_parity_when_available(self):
        """Both decode paths must yield the same Korean text. PyMuPDF is not
        in this container — the check runs wherever it is installed."""
        fitz = pytest.importorskip("fitz")
        doc = fitz.open(stream=self._korean_pdf(), filetype="pdf")
        via_mupdf = "\n".join(p.get_text() for p in doc)
        for line in ("ASCII heading", *KO_TEXT.split("\n"), "tail latin text"):
            assert line in via_mupdf

    def test_bfrange_increment_and_array_forms(self):
        from ocr_vector_db_spark.sources.pdf_decode import _parse_tounicode

        cmap = (b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
                b"1 beginbfchar\n<0041> <AC00>\nendbfchar\n"
                b"2 beginbfrange\n"
                b"<0050> <0052> <0061>\n"            # P,Q,R -> a,b,c
                b"<0060> <0061> [<D55C> <AE00>]\n"   # array dst
                b"endbfrange\n")
        nbytes, table = _parse_tounicode(cmap)
        assert nbytes == 2
        assert table[0x41] == "가"
        assert [table[c] for c in (0x50, 0x51, 0x52)] == ["a", "b", "c"]
        assert table[0x60] == "한" and table[0x61] == "글"

    def test_bfrange_array_entry_before_increment_entry(self):
        """Array entries must be stripped WHOLE (lo/hi included) before the
        3-token increment parse — orphaned lo/hi tokens shift the grouping."""
        from ocr_vector_db_spark.sources.pdf_decode import _parse_tounicode

        cmap = (b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
                b"2 beginbfrange\n"
                b"<0001> <0002> [<0041> <0042>]\n"   # array FIRST: 1->A, 2->B
                b"<0010> <0012> <0058>\n"            # increment: 16,17,18 -> X,Y,Z
                b"endbfrange\n")
        _, table = _parse_tounicode(cmap)
        assert table[1] == "A" and table[2] == "B"
        assert [table[c] for c in (0x10, 0x11, 0x12)] == ["X", "Y", "Z"]

    def test_bfrange_two_array_entries(self):
        from ocr_vector_db_spark.sources.pdf_decode import _parse_tounicode

        cmap = (b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
                b"2 beginbfrange\n"
                b"<0001> <0001> [<D55C>]\n"
                b"<0002> <0002> [<AE00>]\n"
                b"endbfrange\n")
        _, table = _parse_tounicode(cmap)
        assert table[1] == "한" and table[2] == "글"

    def test_multibyte_dst_utf16(self):
        from ocr_vector_db_spark.sources.pdf_decode import _parse_tounicode

        # ligature-style expansion: one code -> two chars ("fi")
        cmap = (b"1 begincodespacerange\n<00> <FF>\nendcodespacerange\n"
                b"1 beginbfchar\n<01> <00660069>\nendbfchar\n")
        nbytes, table = _parse_tounicode(cmap)
        assert nbytes == 1 and table[1] == "fi"

    def test_unmapped_code_is_replacement_char(self):
        pdf = self._korean_pdf()
        # corrupt the CMap: drop one bfchar entry for 파 (U+D30C)
        broken = pdf.replace(b"<D30C> <D30C>\n", b"")
        texts = [b["content"] for b in extract_pdf_blocks(broken)
                 if b["kind"] == "text"]
        ko = next(t for t in texts if "이썬" in t)
        assert ko.startswith("�")  # PyMuPDF shows U+FFFD for unmapped too


# ------------------------------------------------------------------- policy


def seg(content, kind="text"):
    return {"kind": kind, "content": content}


class TestVisionPolicy:
    def test_sufficient_text_blocks_vision(self):
        segs = [seg(PROSE)]
        assert ocr_policy.is_text_sufficient(segs)
        assert not ocr_policy.should_invoke_vision(segs)

    def test_short_text_insufficient(self):
        segs = [seg("tiny")]
        assert not ocr_policy.is_text_sufficient(segs)
        assert ocr_policy.should_invoke_vision(segs)

    def test_low_alpha_ratio_insufficient(self):
        junk = "|- . -- ~ ~~ ::: |- . -- ~ ~~ ::: " * 8   # >=100 chars, alnum-poor
        segs = [seg(junk)]
        assert len(junk) >= 100 and not ocr_policy.is_text_sufficient(segs)
        assert ocr_policy.should_invoke_vision(segs)

    def test_code_patterns_block_vision_even_when_sparse(self):
        segs = [seg("def f(x):\nimport os")]     # short, but 2 code patterns
        assert not ocr_policy.is_text_sufficient(segs)
        assert ocr_policy.has_code_patterns(segs)
        assert not ocr_policy.should_invoke_vision(segs)

    def test_single_pattern_not_enough(self):
        segs = [seg("def f(x): pass")]
        assert not ocr_policy.has_code_patterns(segs)

    def test_image_segments_ignored_by_both_rules(self):
        segs = [seg(PROSE, kind="image")]
        assert not ocr_policy.is_text_sufficient(segs)
        assert not ocr_policy.has_code_patterns([seg(CODE_TEXT, kind="image")])


class TestLowTextDensity:
    def test_short_is_low(self):
        assert parsers.is_low_text_density("short text")

    def test_long_alpha_is_dense(self):
        assert not parsers.is_low_text_density(PROSE * 5)

    def test_long_junk_is_low(self):
        assert parsers.is_low_text_density(". - | ~ " * 100)

    def test_empty_is_low(self):
        assert parsers.is_low_text_density("")


# ------------------------------------------------------------ parse_pdf flow


class TestParsePdfPolicyFlow:
    def test_text_rich_pdf_never_calls_ocr(self):
        calls = []
        data = _pdf([[text_block(PROSE + "\n" + PROSE)]])
        segs = parsers.parse_pdf(data, ocr=lambda b: calls.append(b) or "x",
                                 enable_auto_ocr=True)
        assert calls == []
        assert segs and all(s["kind"] == "text" for s in segs)

    def test_code_pdf_preserves_deterministic_extraction(self):
        calls = []
        data = _pdf([[text_block(CODE_TEXT)]])
        segs = parsers.parse_pdf(data, ocr=lambda b: calls.append(b) or "x",
                                 enable_auto_ocr=True)
        assert calls == []
        assert any(s["kind"] == "code" for s in segs)

    def test_sparse_pdf_invokes_ocr_when_enabled(self):
        calls = []

        def fake_ocr(block):
            calls.append(block)
            return "Recovered scanned prose from the vision provider."

        data = _pdf([[text_block("|- . -- ~ ~~ ::: |- . -- ~ ~~ :::" * 4, y=700)]])
        segs = parsers.parse_pdf(data, ocr=fake_ocr, enable_auto_ocr=True)
        assert calls, "sparse non-code text must reach the provider"
        assert any("Recovered scanned prose" in s["content"] for s in segs)

    def test_sparse_pdf_without_provider_keeps_deterministic(self):
        data = _pdf([[text_block("|- . -- ~ ~~ ::: |- . -- ~ ~~ :::" * 4)]])
        segs = parsers.parse_pdf(data, ocr=None, enable_auto_ocr=True)
        assert segs and all("~" in s["content"] for s in segs)

    def test_image_only_pdf_goes_to_ocr(self):
        def fake_ocr(block):
            return "OCR text extracted from the page image content here."

        data = _pdf([[{"kind": "image", "x": 0, "y": 0, "w": 612, "h": 792,
                       "width": 1224, "height": 1584}]])
        segs = parsers.parse_pdf(data, ocr=fake_ocr)
        assert segs and segs[0]["kind"] == "image"
        assert "OCR text extracted" in segs[0]["content"]

    def test_image_only_pdf_without_provider_empty(self):
        data = _pdf([[{"kind": "image", "x": 0, "y": 0, "w": 612, "h": 792,
                       "width": 10, "height": 10}]])
        assert parsers.parse_pdf(data, ocr=None) == []


# --------------------------------------------------------- column-level gate


class TestColumnPolicy:
    @pytest.fixture(scope="class")
    def docs(self, tables):
        return tables["documents"].select("doc_id", "text").limit(200)

    def test_column_matches_python_on_corpus(self, docs):
        rows = docs.select(
            "text",
            ocr_policy.vision_allowed_col(F.col("text")).alias("col_allowed"),
        ).collect()
        for r in rows:
            py = ocr_policy.should_invoke_vision([seg(r.text)])
            assert py == r.col_allowed, r.text[:80]

    def test_gate_filters_before_provider(self, spark, docs, tmp_path):
        from ocr_vector_db_spark.sources.ocr_cache import ocr_with_cache

        assets = docs.select(
            F.col("doc_id").cast("string").alias("asset_id"),
            F.col("text"),
            F.encode("text", "UTF-8").alias("data"),
        )
        admitted = ocr_policy.gate_assets_for_ocr(assets, "text")
        n_admitted = admitted.count()
        out = ocr_with_cache(spark, admitted, str(tmp_path / "cache"))
        assert out.count() == n_admitted
        assert n_admitted < assets.count()   # the gate must prune something


# ------------------------------------------------------ image raster decode


class TestImageRasterDecode:
    def test_rgb_pixels_round_trip(self):
        """Caller-provided RGB pixels come back byte-identical through the
        FlateDecode image XObject — the raster layer is a real decode, not
        a dimensions-only reference."""
        from ocr_vector_db_spark.sources.pdf_decode import extract_pdf_images

        w, h = 8, 5
        pixels = bytes((x * 7 + c) % 256 for x in range(w * h) for c in range(3))
        data = build_simple_pdf([[
            text_block("Figure caption.", y=700),
            {"kind": "image", "x": 72, "y": 400, "w": 160, "h": 100,
             "width": w, "height": h, "channels": 3, "pixels": pixels},
        ]])
        imgs = extract_pdf_images(data)
        assert len(imgs) == 1
        img = imgs[0]
        assert img["kind"] == "image" and img["data"] == pixels
        md = img["metadata"]
        assert (md["width"], md["height"], md["channels"], md["colorspace"]) == \
            ("8", "5", "3", "rgb")
        assert md["page"] == "0" and md["bbox"].startswith("72.00,400.00")

    def test_default_gray_gradient_decodes(self):
        from ocr_vector_db_spark.sources.pdf_decode import extract_pdf_images

        data = build_simple_pdf([[
            {"kind": "image", "x": 0, "y": 0, "w": 612, "h": 792,
             "width": 16, "height": 4},
        ]])
        (img,) = extract_pdf_images(data)
        assert len(img["data"]) == 16 * 4
        # deterministic gradient: pixel(c, r) = (c*31 + r*17) % 251
        assert img["data"][0] == 0 and img["data"][1] == 31
        assert img["data"][16] == 17

    def test_blocks_contract_unchanged(self):
        """extract_pdf_blocks keeps its {page,bbox,kind,content} schema —
        the internal XObject ref never leaks."""
        data = build_simple_pdf([[
            {"kind": "image", "x": 0, "y": 0, "w": 100, "h": 100,
             "width": 4, "height": 4},
        ]])
        (blk,) = extract_pdf_blocks(data)
        assert set(blk) == {"page", "bbox", "kind", "content"}
        assert blk["content"] == "pdf-image Height=4 Width=4"

    def test_unsupported_filter_skipped(self):
        """A DCT (JPEG) image XObject is recorded as a block but yields no
        raster row — codec formats stay behind the PyMuPDF path."""
        from ocr_vector_db_spark.sources.pdf_decode import extract_pdf_images

        data = build_simple_pdf([[
            {"kind": "image", "x": 0, "y": 0, "w": 100, "h": 100,
             "width": 4, "height": 4},
        ]], compress=False)  # only the image object carries /FlateDecode
        data = data.replace(b"/Filter /FlateDecode", b"/Filter /DCTDecode")
        assert extract_pdf_images(data) == []
        assert any(b["kind"] == "image" for b in extract_pdf_blocks(data))

    def test_feeds_multimodal_feature_extraction(self, spark):
        """Raster rows are ASSET_SCHEMA-shaped: they run straight through
        multimodal.extract_features (Arrow-batched), and the metadata dims
        agree with the raw buffer length."""
        from ocr_vector_db_spark.sources.multimodal import (
            ASSET_SCHEMA,
            extract_features,
        )
        from ocr_vector_db_spark.sources.pdf_decode import extract_pdf_images

        data = build_simple_pdf([[
            {"kind": "image", "x": 0, "y": 500, "w": 200, "h": 100,
             "width": 12, "height": 6},
            {"kind": "image", "x": 0, "y": 300, "w": 200, "h": 100,
             "width": 5, "height": 5, "channels": 3,
             "pixels": bytes(range(75))},
        ]])
        rows = extract_pdf_images(data)
        assert len(rows) == 2
        for r in rows:
            md = r["metadata"]
            assert len(r["data"]) == (
                int(md["width"]) * int(md["height"]) * int(md["channels"])
            )
        df = spark.createDataFrame(rows, ASSET_SCHEMA)
        feats = {r.asset_id: r for r in extract_features(df).collect()}
        assert len(feats) == 2
        for r in rows:
            assert feats[r["asset_id"]].n_bytes == len(r["data"])

    def test_dctdecode_jpeg_passthrough_asset(self):
        """A /DCTDecode image XObject's stream bytes ARE a complete JPEG
        (ISO 32000-1 §7.4.8): they pass through verbatim as an image/jpeg
        asset with the dict-declared dimensions — no JPEG decoder needed
        for the OCR/vision seam."""
        from ocr_vector_db_spark.sources.pdf_decode import extract_pdf_images

        jpeg = (b"\xff\xd8\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01"
                b"\x00\x01\x00\x00" + bytes(range(64)) + b"\xff\xd9")
        data = build_simple_pdf([[
            text_block("Scan page caption.", y=700),
            {"kind": "image", "x": 50, "y": 200, "w": 300, "h": 200,
             "width": 24, "height": 16, "jpeg": jpeg},
        ]])
        (img,) = extract_pdf_images(data)
        assert img["data"] == jpeg  # byte-identical passthrough
        md = img["metadata"]
        assert md["format"] == "jpeg" and md["media_type"] == "image/jpeg"
        assert (md["width"], md["height"]) == ("24", "16")
        assert md["page"] == "0"
        # the block layer still records it as an image block
        from ocr_vector_db_spark.sources.pdf_decode import extract_pdf_blocks
        assert any(b["kind"] == "image" for b in extract_pdf_blocks(data))

    def test_jpeg_and_raw_rasters_coexist_and_feed_multimodal(self, spark):
        """One page mixing a FlateDecode raster and a DCTDecode JPEG: both
        land as ASSET_SCHEMA rows (format=raw / format=jpeg) and run
        through multimodal.extract_features unchanged."""
        from ocr_vector_db_spark.sources.multimodal import (
            ASSET_SCHEMA,
            extract_features,
        )
        from ocr_vector_db_spark.sources.pdf_decode import extract_pdf_images

        jpeg = b"\xff\xd8\xff\xe0 fake entropy payload \xff\xd9"
        data = build_simple_pdf([[
            {"kind": "image", "x": 0, "y": 500, "w": 200, "h": 100,
             "width": 6, "height": 4},
            {"kind": "image", "x": 0, "y": 300, "w": 200, "h": 100,
             "width": 10, "height": 8, "jpeg": jpeg},
        ]])
        rows = extract_pdf_images(data)
        fmts = sorted(r["metadata"]["format"] for r in rows)
        assert fmts == ["jpeg", "raw"]
        df = spark.createDataFrame(rows, ASSET_SCHEMA)
        feats = {r.asset_id: r for r in extract_features(df).collect()}
        for r in rows:
            assert feats[r["asset_id"]].n_bytes == len(r["data"])

    def test_jpeg_without_soi_is_skipped(self):
        """A /DCTDecode stream that is not JPEG-shaped (no SOI marker) is
        dropped, not emitted as a bogus asset."""
        from ocr_vector_db_spark.sources.pdf_decode import extract_pdf_images

        data = build_simple_pdf([[
            {"kind": "image", "x": 0, "y": 0, "w": 100, "h": 100,
             "width": 4, "height": 4, "jpeg": b"not a jpeg at all"},
        ]])
        assert extract_pdf_images(data) == []

    def test_jpeg_dimensions_pymupdf_parity(self):
        """PyMuPDF parity gate (skips without fitz): a real JPEG generated
        by fitz embeds through the fixture and the passthrough's declared
        dimensions match what fitz reads back from the extracted bytes."""
        fitz = pytest.importorskip("fitz")

        from ocr_vector_db_spark.sources.pdf_decode import extract_pdf_images

        pm = fitz.Pixmap(fitz.csRGB, fitz.IRect(0, 0, 24, 16))
        pm.clear_with(90)
        jpeg = pm.tobytes("jpeg")
        data = build_simple_pdf([[
            {"kind": "image", "x": 0, "y": 0, "w": 240, "h": 160,
             "width": 24, "height": 16, "jpeg": jpeg},
        ]])
        (img,) = extract_pdf_images(data)
        assert img["data"] == jpeg
        back = fitz.Pixmap(img["data"])
        assert (back.width, back.height) == (
            int(img["metadata"]["width"]), int(img["metadata"]["height"])
        )

    def test_payload_ending_in_eol_bytes_survives(self):
        """Compressed payloads ending in 0x0A/0x0D (~0.8% of zlib streams —
        the adler32 tail is uniform) must round-trip intact: the scanner
        slices by /Length, never by rstripping EOL bytes."""
        import hashlib
        import zlib

        from ocr_vector_db_spark.sources.pdf_decode import extract_pdf_images

        w, h = 8, 8
        # seeds pre-searched so zlib.compress(pixels) ends in 0x0A or 0x0D
        for seed in (292, 391, 489, 523):
            pixels = (hashlib.md5(str(seed).encode()).digest() * 4)[: w * h]
            assert zlib.compress(pixels)[-1:] in (b"\n", b"\r")
            data = build_simple_pdf([[
                {"kind": "image", "x": 0, "y": 0, "w": 80, "h": 80,
                 "width": w, "height": h, "pixels": pixels},
            ]])
            (img,) = extract_pdf_images(data)
            assert img["data"] == pixels

    def test_payload_containing_endobj_survives(self):
        """A pixel buffer whose COMPRESSED bytes contain b'endobj' must not
        truncate the object scan — the /Length slice reads absolute
        offsets from the file, not the endobj-bounded body."""
        import zlib

        from ocr_vector_db_spark.sources.pdf_decode import extract_pdf_images

        # uncompressible payload embedding the magic words after compression
        # is hard to construct; instead corrupt-proof the scanner by using
        # stored (uncompressed-looking) bytes: build a PDF, then splice the
        # image object to raw /Length bytes containing b"endobj"
        pixels = b"ab endobj endstream cd" + bytes(range(42))
        w, h = len(pixels), 1
        data = build_simple_pdf([[
            {"kind": "image", "x": 0, "y": 0, "w": 80, "h": 80,
             "width": w, "height": h, "pixels": pixels},
        ]])
        payload = zlib.compress(pixels)
        raw = data.replace(
            b"/Filter /FlateDecode /Length " + str(len(payload)).encode()
            + b" >>\nstream\n" + payload,
            b"/Length " + str(len(pixels)).encode()
            + b" >>\nstream\n" + pixels,
        )
        assert raw != data  # the splice matched
        (img,) = extract_pdf_images(raw)
        assert img["data"] == pixels

    def test_pymupdf_raster_parity_when_available(self):
        """Where PyMuPDF exists, its Pixmap for the embedded image must
        agree with the pure-Python decode on dimensions and pixel bytes."""
        fitz = pytest.importorskip("fitz")
        from ocr_vector_db_spark.sources.pdf_decode import extract_pdf_images

        w, h = 6, 4
        pixels = bytes((i * 13) % 256 for i in range(w * h))
        data = build_simple_pdf([[
            {"kind": "image", "x": 10, "y": 10, "w": 60, "h": 40,
             "width": w, "height": h, "pixels": pixels},
        ]])
        (ours,) = extract_pdf_images(data)
        doc = fitz.open(stream=data, filetype="pdf")
        xref = doc[0].get_images()[0][0]
        pix = fitz.Pixmap(doc, xref)
        assert (pix.width, pix.height) == (w, h)
        assert bytes(pix.samples) == ours["data"] == pixels


class TestTextFilters:
    """ASCIIHex / ASCII85 / RunLength decoders + filter CHAINS
    (ISO 32000-1 §7.4.2, §7.4.3, §7.4.5; Table 6 abbreviations)."""

    def test_ascii_hex_whitespace_eod_and_odd_pad(self):
        from ocr_vector_db_spark.sources.pdf_decode import _ascii_hex_decode

        assert _ascii_hex_decode(b"48 65 6C\n6C 6F>") == b"Hello"
        assert _ascii_hex_decode(b"7>") == b"\x70"   # odd digit pads with 0
        assert _ascii_hex_decode(b"48xx>") is None   # non-hex is malformed
        # independent encoder: binascii
        import binascii

        data = bytes(range(256))
        assert _ascii_hex_decode(binascii.hexlify(data) + b">") == data

    def test_ascii85_stdlib_round_trip_z_and_partials(self):
        import base64
        import random

        from ocr_vector_db_spark.sources.pdf_decode import _ascii85_decode

        rnd = random.Random(13)
        for ln in (0, 1, 2, 3, 4, 5, 63, 1024):
            data = bytes(rnd.randrange(256) for _ in range(ln))
            enc = base64.a85encode(data)
            assert _ascii85_decode(enc + b"~>") == data, ln
        # the z shortcut for an all-zero group (a85encode emits it)
        assert _ascii85_decode(b"z~>") == b"\x00\x00\x00\x00"
        zeros = base64.a85encode(b"\x00" * 8)
        assert b"z" in zeros and _ascii85_decode(zeros + b"~>") == b"\x00" * 8
        # whitespace anywhere; <~ prefix tolerated
        assert _ascii85_decode(b"<~ 87 cUR ~>") == _ascii85_decode(b"87cUR~>")
        assert _ascii85_decode(b"a~>") is None       # 1 leftover char
        assert _ascii85_decode(b"\x80\x80\x80\x80\x80~>") is None

    def test_run_length_round_trip_and_spec_semantics(self):
        import random

        from ocr_vector_db_spark.sources.pdf_decode import (
            _run_length_decode,
            run_length_encode,
        )

        # spec semantics: literal span, repeat span, EOD
        assert _run_length_decode(b"\x02abc\xfex\x80") == b"abcxxx"
        assert _run_length_decode(b"\x00Q\x80tail-ignored") == b"Q"
        assert _run_length_decode(b"\x05ab") is None  # truncated literal
        rnd = random.Random(17)
        for _ in range(20):
            data = bytes(
                rnd.choice(b"aab") for _ in range(rnd.randrange(0, 700))
            )
            assert _run_length_decode(run_length_encode(data)) == data

    def test_filter_chain_parsing_and_abbreviations(self):
        from ocr_vector_db_spark.sources.pdf_decode import _filter_chain

        assert _filter_chain(b"<< /Length 3 >>") == []
        assert _filter_chain(b"<< /Filter /FlateDecode >>") == [b"FlateDecode"]
        assert _filter_chain(
            b"<< /Filter [/ASCII85Decode /FlateDecode] /Length 9 >>"
        ) == [b"ASCII85Decode", b"FlateDecode"]
        assert _filter_chain(b"<< /Filter [/AHx /RL] >>") == [b"AHx", b"RL"]

    def test_decode_stream_chain_and_unsupported(self):
        import base64
        import zlib

        from ocr_vector_db_spark.sources.pdf_decode import _decode_stream

        content = b"BT /F1 12 Tf 72 720 Td (chained) Tj ET" * 9
        payload = base64.a85encode(zlib.compress(content)) + b"~>"
        d = b"<< /Filter [/ASCII85Decode /FlateDecode] >>"
        assert _decode_stream(d, payload) == content
        # any unsupported member poisons the whole chain -> None
        assert _decode_stream(
            b"<< /Filter [/ASCII85Decode /JPXDecode] >>", payload
        ) is None
        assert _decode_stream(b"<< /Filter /DCTDecode >>", b"\xff\xd8") is None

    def test_parse_pdf_reads_a85_and_rl_content_streams(self, spark):
        """End-to-end: fixture PDFs whose content streams are ASCII85-over-
        Flate chains / RunLength encoded parse to the same text blocks as
        the stored form."""
        from ocr_vector_db_spark.sources.parsers import parse_pdf
        from ocr_vector_db_spark.sources.pdf_decode import build_simple_pdf

        pages = [[
            {"kind": "text",
             "text": "Chained filters carry this paragraph of prose, long "
                     "enough to clear the minimum block length gate easily.",
             "x": 72, "y": 700, "size": 12},
        ]]
        expect = parse_pdf(build_simple_pdf(pages, compress=False))
        got_a85 = parse_pdf(build_simple_pdf(pages, compress="a85"))
        got_rl = parse_pdf(build_simple_pdf(pages, compress="rl"))
        assert expect and got_a85 == expect and got_rl == expect


class TestEncryption:
    """Standard security handler (RC4, R2/R3): encrypted fixtures decode
    block-identically to their plaintext twins across the feature matrix
    (plain text, Flate+CID, ObjStm, image rasters)."""

    def _plain(self):
        from ocr_vector_db_spark.sources.pdf_decode import build_simple_pdf

        return build_simple_pdf([[
            {"kind": "text",
             "text": "hello encrypted world of scanned corpora and long "
                     "paragraphs that survive the block merge threshold",
             "x": 72, "y": 700, "size": 12},
        ]])

    def test_rc4_roundtrip_r2_and_r3(self):
        from ocr_vector_db_spark.sources.pdf_decode import (
            encrypt_pdf_rc4,
            extract_pdf_blocks,
        )

        plain = self._plain()
        base = extract_pdf_blocks(plain)
        assert base and "hello encrypted" in base[0]["content"]
        for r, bits in ((2, 40), (3, 128)):
            enc = encrypt_pdf_rc4(plain, r=r, nbits=bits)
            assert b"hello" not in enc  # ciphertext, not a no-op
            assert extract_pdf_blocks(enc) == base

    def test_encrypted_cid_flate_and_objstm(self):
        from ocr_vector_db_spark.sources.pdf_decode import (
            build_objstm_pdf,
            build_simple_pdf,
            encrypt_pdf_rc4,
            extract_pdf_blocks,
        )

        ko = build_simple_pdf([[
            {"kind": "text", "text": "한국어 암호화 문서 본문 단락",
             "x": 72, "y": 700, "size": 12},
        ]], compress=True)
        assert extract_pdf_blocks(encrypt_pdf_rc4(ko)) == \
            extract_pdf_blocks(ko)

        ob = build_objstm_pdf("object stream body text long enough to "
                              "pass the minimum block length filter")
        assert extract_pdf_blocks(encrypt_pdf_rc4(ob)) == \
            extract_pdf_blocks(ob)

    def test_encrypted_image_raster_pixels_identical(self):
        from ocr_vector_db_spark.sources.pdf_decode import (
            build_simple_pdf,
            encrypt_pdf_rc4,
            extract_pdf_images,
        )

        pixels = bytes(range(48))  # 4x4 RGB
        plain = build_simple_pdf([[
            {"kind": "image", "x": 100, "y": 300, "w": 120, "h": 90,
             "width": 4, "height": 4, "channels": 3, "pixels": pixels},
        ]])
        base = extract_pdf_images(plain)
        got = extract_pdf_images(encrypt_pdf_rc4(plain))
        assert got == base and base[0]["data"] == pixels

    def test_user_password_protected_yields_no_text(self):
        """Our reader derives the key from the EMPTY user password (the
        scanned-corpus norm); a file locked with a real user password
        must not silently decode to garbage text."""
        from ocr_vector_db_spark.sources.pdf_decode import (
            encrypt_pdf_rc4,
            extract_pdf_blocks,
        )

        enc = encrypt_pdf_rc4(self._plain(), user_pw=b"secret")
        # the /U check (Algorithm 6) rejects the empty-password key, the
        # file stays ENCRYPTED, and the ciphertext content stream yields
        # no text runs — not silently-decrypted garbage
        assert extract_pdf_blocks(enc) == []

    def test_aes_core_fips197_vector(self):
        """The pure-Python AES-128 core must reproduce FIPS-197 Appendix
        C.1 exactly, both directions."""
        from ocr_vector_db_spark.sources.pdf_decode import (
            _aes_block,
            _aes_round_keys,
        )

        key = bytes(range(16))
        pt = bytes.fromhex("00112233445566778899aabbccddeeff")
        ct = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
        rks = _aes_round_keys(key)
        assert _aes_block(pt, rks, True) == ct
        assert _aes_block(ct, rks, False) == pt

    def test_aesv2_roundtrip_matrix(self):
        """V4/R4 AESV2 fixtures decode block-identically to plaintext
        across text, Flate+CID, ObjStm, and raster; a user-password-
        locked file is refused by the /U check."""
        from ocr_vector_db_spark.sources.pdf_decode import (
            build_objstm_pdf,
            build_simple_pdf,
            encrypt_pdf_aes,
            extract_pdf_blocks,
            extract_pdf_images,
        )

        plain = self._plain()
        enc = encrypt_pdf_aes(plain)
        assert b"hello" not in enc
        assert extract_pdf_blocks(enc) == extract_pdf_blocks(plain)

        ko = build_simple_pdf([[
            {"kind": "text", "text": "한국어 AES 암호화 문서 본문 단락",
             "x": 72, "y": 700, "size": 12},
        ]], compress=True)
        assert extract_pdf_blocks(encrypt_pdf_aes(ko)) == \
            extract_pdf_blocks(ko)

        ob = build_objstm_pdf("object stream body text long enough to "
                              "pass the minimum block length filter")
        assert extract_pdf_blocks(encrypt_pdf_aes(ob)) == \
            extract_pdf_blocks(ob)

        pixels = bytes(range(48))
        pimg = build_simple_pdf([[
            {"kind": "image", "x": 100, "y": 300, "w": 120, "h": 90,
             "width": 4, "height": 4, "channels": 3, "pixels": pixels},
        ]])
        got = extract_pdf_images(encrypt_pdf_aes(pimg))
        assert got == extract_pdf_images(pimg) and got[0]["data"] == pixels

        assert extract_pdf_blocks(
            encrypt_pdf_aes(plain, user_pw=b"secret")) == []

    def test_aes256_core_and_fast_path(self):
        """FIPS-197 C.3 (AES-256) and T-table/simple-path agreement on
        random blocks for both key sizes."""
        import random

        from ocr_vector_db_spark.sources.pdf_decode import (
            _aes_block,
            _aes_encrypt_block_fast,
            _aes_round_keys,
            _rk_words,
        )

        pt = bytes.fromhex("00112233445566778899aabbccddeeff")
        k256 = bytes(range(32))
        c256 = bytes.fromhex("8ea2b7ca516745bfeafc49904b496089")
        rks = _aes_round_keys(k256)
        assert _aes_block(pt, rks, True) == c256
        assert _aes_block(c256, rks, False) == pt

        rnd = random.Random(7)
        for klen in (16, 32):
            key = bytes(rnd.randrange(256) for _ in range(klen))
            rk = _aes_round_keys(key)
            rkw = _rk_words(rk)
            for _ in range(10):
                blk = bytes(rnd.randrange(256) for _ in range(16))
                assert _aes_encrypt_block_fast(blk, rkw) == \
                    _aes_block(blk, rk, True)

    def test_aes256_v5_roundtrip_and_wrong_password(self):
        """V5/R6 (AESV3): the Algorithm-2.B user hash validates against
        /U, the file key unwraps from /UE, streams decode to the exact
        plaintext blocks; a user-password-locked file is refused."""
        from ocr_vector_db_spark.sources.pdf_decode import (
            encrypt_pdf_aes256,
            extract_pdf_blocks,
        )

        plain = self._plain()
        enc = encrypt_pdf_aes256(plain)
        assert b"hello" not in enc
        assert extract_pdf_blocks(enc) == extract_pdf_blocks(plain)
        assert extract_pdf_blocks(
            encrypt_pdf_aes256(plain, user_pw=b"secret")) == []


class TestCCITT:
    """ITU-T T.6 (Group 4) codec + /CCITTFaxDecode raster path."""

    def test_known_bitstreams_pin_the_code_tables(self):
        """Hand-computed encodings against the published tables: an
        all-white row is one V0 bit; a single black origin pixel is
        horizontal mode = 001 + white-term-0 (00110101) + black-term-1
        (010); EOFB is two EOLs."""
        from ocr_vector_db_spark.sources.ccitt import encode_g4

        bits = "".join(
            f"{b:08b}" for b in encode_g4(b"\x00" * 24, 8, 3)
        )
        assert bits.startswith("111" + "000000000001" * 2)

        one_black = b"\x01" + b"\x00" * 7
        bits = "".join(f"{b:08b}" for b in encode_g4(one_black, 8, 1))
        # H + white run 0 + black run 1, then V0 closes the row at b1
        assert bits.startswith("001" + "00110101" + "010" + "1"
                               + "000000000001" * 2)

    def test_round_trips_structured_and_random(self):
        """Encoder and decoder are exact mirrors across densities, widths
        spanning the make-up code ranges (incl. > 2560), and
        EncodedByteAlign."""
        import numpy as np

        from ocr_vector_db_spark.sources.ccitt import decode_g4, encode_g4

        rng = np.random.default_rng(5)
        cases = [(1, 1), (5, 7), (64, 3), (130, 9), (257, 4), (1728, 2),
                 (31, 31)]
        for w, h in cases:
            for density in (0.02, 0.5, 0.98):
                pix = (rng.random((h, w)) < density).astype("u1").tobytes()
                for ba in (False, True):
                    enc = encode_g4(pix, w, h, byte_align=ba)
                    assert decode_g4(enc, w, byte_align=ba) == pix
                    assert decode_g4(enc, w, rows=h, byte_align=ba) == pix
        # make-up codes past 1728 and the 2560 extension loop
        big = bytearray(2800 * 2)
        big[2700:2800] = b"\x01" * 100
        big[2800 + 50:] = b"\x01" * (2800 - 50)
        enc = encode_g4(bytes(big), 2800, 2)
        assert decode_g4(enc, 2800) == bytes(big)

    def test_ccitt_xobject_and_asset_extraction(self):
        """A /CCITTFaxDecode K -1 image XObject decodes to 8-bit gray
        semantic pixels (black=0) through extract_pdf_images; G3 (K >= 0)
        and non-CCITT objects are left to the PyMuPDF path."""
        from ocr_vector_db_spark.sources.pdf_decode import (
            build_simple_pdf,
            extract_pdf_images,
        )

        w, h = 120, 40
        pix = bytes(
            1 if (x % 7 == 0 or y == 20) else 0
            for y in range(h) for x in range(w)
        )
        pdf = build_simple_pdf([[
            {"kind": "text", "text": "scanned page", "x": 50, "y": 700,
             "size": 12},
            {"kind": "image", "x": 50, "y": 300, "w": 240, "h": 80,
             "width": w, "height": h, "ccitt": True, "pixels": pix},
        ]])
        imgs = extract_pdf_images(pdf)
        assert len(imgs) == 1
        md = imgs[0]["metadata"]
        assert (md["format"], md["colorspace"], md["width"], md["height"]) \
            == ("raw", "gray", "120", "40")
        assert imgs[0]["data"] == bytes(0 if p else 255 for p in pix)

        # K >= 0 (Group 3) stays unsupported → no asset row
        g3 = pdf.replace(b"/K -1", b"/K 0")
        assert extract_pdf_images(g3) == []
        # ISO 32000 polarity pipeline: /BlackIs1 true with the default
        # /Decode [0 1] legitimately renders the INVERSE (black runs
        # become sample 1 -> gray 1.0), and a compensating /Decode [1 0]
        # restores the original image — both exactly what a compliant
        # viewer shows
        inverted = bytes(255 - b for b in imgs[0]["data"])
        b1 = pdf.replace(b"/K -1", b"/K -1 /BlackIs1 true")
        assert extract_pdf_images(b1)[0]["data"] == inverted
        b1d = b1.replace(b"/BitsPerComponent 1",
                         b"/BitsPerComponent 1 /Decode [1 0]")
        assert extract_pdf_images(b1d)[0]["data"] == imgs[0]["data"]

    def test_pymupdf_ccitt_parity_when_available(self):
        """PyMuPDF parity gate (skips without fitz): the G4 raster our
        codec decodes must match what fitz rasterizes from the same
        embedded stream."""
        fitz = pytest.importorskip("fitz")

        from ocr_vector_db_spark.sources.pdf_decode import (
            build_simple_pdf,
            extract_pdf_images,
        )

        w, h = 64, 24
        pix = bytes(1 if (x + y) % 9 < 3 else 0
                    for y in range(h) for x in range(w))
        pdf = build_simple_pdf([[
            {"kind": "image", "x": 50, "y": 300, "w": 128, "h": 48,
             "width": w, "height": h, "ccitt": True, "pixels": pix},
        ]])
        ours = extract_pdf_images(pdf)[0]["data"]
        doc = fitz.open(stream=pdf, filetype="pdf")
        xref = doc.get_page_images(0)[0][0]
        pm = fitz.Pixmap(doc, xref)
        if pm.colorspace and pm.colorspace.n > 1:
            pm = fitz.Pixmap(fitz.csGRAY, pm)
        assert bytes(pm.samples) == ours

    def test_foreign_zero_length_second_run_mid_row(self):
        """A horizontal code whose second run is zero mid-row (no
        compliant encoder emits it, a foreign stream may): the double
        transition is a net no-op — the rest of the row must NOT invert."""
        from ocr_vector_db_spark.sources.ccitt import _BitWriter, decode_g4

        w = _BitWriter()
        # row of 8: H(white 2, black 0) -> no-op at col 2, then
        # H(white 2, black 4) -> cols 4..7 black
        w.write("001"); w.write("0111"); w.write("0000110111")
        w.write("001"); w.write("0111"); w.write("011")
        w.write("000000000001" * 2)  # EOFB
        out = decode_g4(w.bytes(), 8)
        assert out == bytes([0, 0, 0, 0, 1, 1, 1, 1])


class TestCCITTGroup3:
    """ITU-T T.4 (Group 3) codec: K = 0 pure 1-D and K > 0 mixed mode."""

    def test_known_1d_bitstream_pins_the_mh_framing(self):
        """Hand-computed K=0 row against the published tables: EOL, then
        white-term-2 (0111) + black-term-4 (011) + white-term-2 (0111)
        for the row 00111100 of width 8... (white 2, black 4, white 2)."""
        from ocr_vector_db_spark.sources.ccitt import encode_g3

        row = bytes([0, 0, 1, 1, 1, 1, 0, 0])
        bits = "".join(f"{b:08b}" for b in encode_g3(row, 8, 1, k=0))
        assert bits.startswith(
            "000000000001" + "0111" + "011" + "0111" + "000000000001"
        )

    def test_k_positive_tag_bits(self):
        """K=2 frames every row with EOL+tag: 1-D rows tagged 1 (every
        k-th), 2-D rows tagged 0."""
        from ocr_vector_db_spark.sources.ccitt import encode_g3

        pix = bytes([0] * 8) * 4  # 4 all-white rows of 8
        bits = "".join(f"{b:08b}" for b in encode_g3(pix, 8, 4, k=2))
        eol = "000000000001"
        # row0: EOL+1 + white-term-8 (10011); row1: EOL+0 + V0 (1)
        assert bits.startswith(
            eol + "1" + "10011" + eol + "0" + "1"
            + eol + "1" + "10011" + eol + "0" + "1"
        )

    def test_round_trips_all_regimes(self):
        import numpy as np

        from ocr_vector_db_spark.sources.ccitt import decode_g3, encode_g3

        rng = np.random.default_rng(11)
        for w, h in [(1, 1), (5, 7), (64, 3), (130, 9), (1728, 2), (31, 31)]:
            for density in (0.02, 0.5, 0.98):
                pix = (rng.random((h, w)) < density).astype("u1").tobytes()
                for k in (0, 1, 4):
                    for ba in (False, True):
                        enc = encode_g3(pix, w, h, k=k, byte_align=ba)
                        assert decode_g3(
                            enc, w, rows=h, k=k, byte_align=ba) == pix
                        assert decode_g3(
                            enc, w, rows=None, k=k, byte_align=ba) == pix

    def test_missing_eols_still_decode(self):
        """ISO 32000 /EndOfLine is false by default — a K=0 stream with
        NO EOLs at all (runs back-to-back) must still decode when /Rows
        bounds the loop."""
        from ocr_vector_db_spark.sources.ccitt import (
            _BitWriter,
            decode_g3,
        )

        w = _BitWriter()
        # two rows of width 8: (white 8) then (white 2, black 4, white 2)
        w.write("10011")                    # white-term-8
        w.write("0111" + "011" + "0111")    # 2w 4b 2w
        out = decode_g3(w.bytes(), 8, rows=2, k=0)
        assert out == bytes([0] * 8 + [0, 0, 1, 1, 1, 1, 0, 0])

    def test_g3_xobjects_decode_in_every_k_regime(self):
        """/CCITTFaxDecode K 0 and K 2 XObjects decode through the T.4
        path with the ISO polarity pipeline (black -> gray 0)."""
        from ocr_vector_db_spark.sources.pdf_decode import (
            build_simple_pdf,
            extract_pdf_images,
        )

        w, h = 40, 12
        pix = bytes(
            1 if ((x + y) % 5 == 0) else 0
            for y in range(h) for x in range(w)
        )
        want = bytes(0 if p else 255 for p in pix)
        for k in (0, 2):
            pdf = build_simple_pdf([[
                {"kind": "image", "x": 50, "y": 300, "w": 200, "h": 60,
                 "width": w, "height": h, "ccitt": True, "k": k,
                 "pixels": pix},
            ]])
            imgs = extract_pdf_images(pdf)
            assert len(imgs) == 1
            img = imgs[0]
            meta = img["metadata"]
            assert (int(meta["width"]), int(meta["height"])) == (w, h)
            assert meta["format"] == "raw"
            assert img["data"] == want, f"K={k}"

    def test_pymupdf_g3_parity_when_available(self):
        """PyMuPDF parity gate (skips without fitz): K=0 and K=2 rasters
        our T.4 codec decodes must match what fitz rasterizes from the
        same embedded streams."""
        import pytest

        fitz = pytest.importorskip("fitz")

        from ocr_vector_db_spark.sources.pdf_decode import (
            build_simple_pdf,
            extract_pdf_images,
        )

        w, h = 64, 24
        pix = bytes(1 if (x * 3 + y) % 11 < 4 else 0
                    for y in range(h) for x in range(w))
        for k in (0, 2):
            pdf = build_simple_pdf([[
                {"kind": "image", "x": 50, "y": 300, "w": 128, "h": 48,
                 "width": w, "height": h, "ccitt": True, "k": k,
                 "pixels": pix},
            ]])
            ours = extract_pdf_images(pdf)[0]["data"]
            doc = fitz.open(stream=pdf, filetype="pdf")
            xref = doc.get_page_images(0)[0][0]
            pm = fitz.Pixmap(doc, xref)
            if pm.colorspace and pm.colorspace.n > 1:
                pm = fitz.Pixmap(fitz.csGRAY, pm)
            assert bytes(pm.samples) == ours, f"K={k}"


class TestJBIG2:
    """ITU-T T.88 codec (MQ coder + generic regions) + /JBIG2Decode path."""

    def test_mq_coder_round_trips(self):
        """The MQ arithmetic coder pair is an exact mirror across random,
        heavily biased (byte-stuffing/carry paths) and multi-context
        streams."""
        import random

        from ocr_vector_db_spark.sources.jbig2 import MQDecoder, MQEncoder

        rng = random.Random(42)
        cases = [[rng.randint(0, 1) for _ in range(5000)] for _ in range(3)]
        cases += [[1 if rng.random() < p else 0 for _ in range(20000)]
                  for p in (0.01, 0.99)]
        for bits in cases:
            ctxs = [rng.randint(0, 15) for _ in bits]
            enc = MQEncoder()
            ecx = {i: [0, 0] for i in range(16)}
            for b, c in zip(bits, ctxs):
                enc.encode(b, ecx[c])
            data = enc.flush()
            dec = MQDecoder(data)
            dcx = {i: [0, 0] for i in range(16)}
            assert [dec.decode(dcx[c]) for c in ctxs] == bits

    def test_generic_region_round_trips(self):
        """Template-0 generic regions round-trip across shapes and
        densities, with and without TPGDON; TPGD compresses repeated
        rows."""
        import random

        from ocr_vector_db_spark.sources.jbig2 import (
            decode_generic_region,
            encode_generic_region,
        )

        rng = random.Random(7)
        for w, h in [(1, 1), (5, 3), (33, 17), (64, 48), (128, 1), (1, 64)]:
            pix = bytes(
                1 if (x % 7 == 0 or y == h // 2 or (x + y) % 13 == 0) else 0
                for y in range(h) for x in range(w)
            )
            for tp in (False, True):
                enc = encode_generic_region(pix, w, h, tpgdon=tp)
                assert decode_generic_region(enc, w, h, tpgdon=tp) == pix
            rnd = bytes(rng.randint(0, 1) for _ in range(w * h))
            enc = encode_generic_region(rnd, w, h)
            assert decode_generic_region(enc, w, h) == rnd
        rep = bytes(1 if x % 5 == 0 else 0 for x in range(64)) * 48
        plain = encode_generic_region(rep, 64, 48, tpgdon=False)
        tp = encode_generic_region(rep, 64, 48, tpgdon=True)
        assert decode_generic_region(tp, 64, 48, tpgdon=True) == rep
        assert len(tp) < len(plain)

    def test_embedded_segments_and_unsupported_profiles(self):
        """The embedded organization round-trips (page info + immediate
        lossless generic region); halftone segments and non-zero
        templates raise JBIG2Error instead of mis-decoding."""
        import pytest as _pytest

        from ocr_vector_db_spark.sources.jbig2 import (
            JBIG2Error,
            decode_embedded,
            encode_embedded,
        )

        w, h = 120, 40
        pix = bytes(1 if (x % 11 == 0 or y == 20) else 0
                    for y in range(h) for x in range(w))
        stream = encode_embedded(pix, w, h, tpgdon=True)
        gw, gh, got = decode_embedded(stream)
        assert (gw, gh, got) == (w, h, pix)

        # an immediate halftone region (type 22) is out of profile
        # (symbol dictionaries, type 0, decode since round 11)
        bad = bytearray(stream)
        # flip the region segment's type byte (offset 4 of the SECOND
        # header: 11-byte header + 19-byte page info payload + 4)
        bad[11 + 19 + 4] = 22
        with _pytest.raises(JBIG2Error):
            decode_embedded(bytes(bad))
        # truncated stream
        with _pytest.raises(JBIG2Error):
            decode_embedded(stream[:-9])

    def test_jbig2_xobject_and_asset_extraction(self):
        """A /JBIG2Decode image XObject decodes to 8-bit gray semantic
        pixels (1=black -> gray 0, ISO 32000 §7.4.7 polarity) through
        extract_pdf_images; /Decode [1 0] renders the inverse."""
        from ocr_vector_db_spark.sources.pdf_decode import (
            build_simple_pdf,
            extract_pdf_images,
        )

        w, h = 110, 36
        pix = bytes(
            1 if (x % 9 == 0 or y == 18 or (x + y) % 23 == 0) else 0
            for y in range(h) for x in range(w)
        )
        pdf = build_simple_pdf([[
            {"kind": "text", "text": "scanned page", "x": 50, "y": 700,
             "size": 12},
            {"kind": "image", "x": 50, "y": 300, "w": 220, "h": 72,
             "width": w, "height": h, "jbig2": True, "tpgdon": True,
             "pixels": pix},
        ]])
        imgs = extract_pdf_images(pdf)
        assert len(imgs) == 1
        md = imgs[0]["metadata"]
        assert (md["format"], md["colorspace"], md["width"], md["height"]) \
            == ("raw", "gray", "110", "36")
        assert imgs[0]["data"] == bytes(0 if p else 255 for p in pix)
        inv = pdf.replace(b"/BitsPerComponent 1",
                          b"/BitsPerComponent 1 /Decode [1 0]")
        assert extract_pdf_images(inv)[0]["data"] == bytes(
            255 - b for b in imgs[0]["data"]
        )

    def test_pymupdf_jbig2_parity_when_available(self):
        """PyMuPDF parity gate (skips without fitz): the generic region
        our codec encodes must rasterize identically through fitz."""
        fitz = pytest.importorskip("fitz")

        from ocr_vector_db_spark.sources.pdf_decode import (
            build_simple_pdf,
            extract_pdf_images,
        )

        w, h = 64, 24
        pix = bytes(1 if (x + y) % 9 < 3 else 0
                    for y in range(h) for x in range(w))
        for tp in (False, True):
            pdf = build_simple_pdf([[
                {"kind": "image", "x": 50, "y": 300, "w": 128, "h": 48,
                 "width": w, "height": h, "jbig2": True, "tpgdon": tp,
                 "pixels": pix},
            ]])
            ours = extract_pdf_images(pdf)[0]["data"]
            doc = fitz.open(stream=pdf, filetype="pdf")
            xref = doc.get_page_images(0)[0][0]
            pm = fitz.Pixmap(doc, xref)
            if pm.colorspace and pm.colorspace.n > 1:
                pm = fitz.Pixmap(fitz.csGRAY, pm)
            assert bytes(pm.samples) == ours, f"tpgdon={tp}"

    def test_jbig2_globals_stream_carries_shared_segments(self):
        """/JBIG2Globals organization: segments in the globals stream
        (here the page information) logically precede the per-image
        stream's region segments — both via decode_embedded directly and
        through a hand-built PDF whose XObject references the globals
        object."""
        from ocr_vector_db_spark.sources.jbig2 import (
            decode_embedded,
            encode_embedded,
        )
        from ocr_vector_db_spark.sources.pdf_decode import (
            build_simple_pdf,
            extract_pdf_images,
        )

        w, h = 40, 12
        pix = bytes(1 if (x + y) % 5 == 0 else 0
                    for y in range(h) for x in range(w))
        full = encode_embedded(pix, w, h)
        # split: page-info segment (11-byte header + 19-byte payload)
        # into globals, generic-region segment into the image stream
        glob, region = full[:30], full[30:]
        gw, gh, got = decode_embedded(region, glob)
        assert (gw, gh, got) == (w, h, pix)

        # PDF layer: take a normal jbig2 fixture and graft the globals
        # reference + a globals stream object onto it
        pdf = build_simple_pdf([[
            {"kind": "image", "x": 50, "y": 300, "w": 80, "h": 24,
             "width": w, "height": h, "jbig2": True, "pixels": pix},
        ]])
        assert extract_pdf_images(pdf)[0]["data"] == bytes(
            0 if p else 255 for p in pix
        )


class TestJBIG2Symbols:
    """T.88 symbol-coded profile (round 11): integer arithmetic coding
    (Annex A), symbol dictionaries (§6.5) and text regions (§6.4)."""

    @staticmethod
    def _glyph(pattern):
        rows = pattern.strip().split()
        h, w = len(rows), len(rows[0])
        return (w, h,
                bytes(1 if c == "#" else 0 for r in rows for c in r))

    @classmethod
    def _font(cls):
        a = cls._glyph("..#.. .#.#. #...# ##### #...#")
        b = cls._glyph("####. #...# ####. #...# ####.")
        o = cls._glyph(".##. #..# #..# .##.")
        dot = cls._glyph("## ##")
        # nondecreasing height order (the height-class protocol)
        return sorted([a, b, o, dot], key=lambda s: (s[1], s[0]))

    @staticmethod
    def _compose(w, h, syms, placements):
        page = bytearray(w * h)
        for sid, s, t in placements:
            sw, sh, sp = syms[sid]
            for yy in range(sh):
                for xx in range(sw):
                    if sp[yy * sw + xx]:
                        page[(t + yy) * w + (s + xx)] = 1
        return bytes(page)

    def test_integer_coder_round_trips(self):
        """IAx values round-trip across every class boundary, signs and
        OOB; IAID round-trips at several code lengths."""
        from ocr_vector_db_spark.sources.jbig2 import (
            MQDecoder,
            MQEncoder,
            _iaid_decode,
            _iaid_encode,
            _int_decode,
            _int_encode,
        )

        vals = [0, 1, 3, 4, 19, 20, 83, 84, 339, 340, 4435, 4436,
                123456789, -1, -3, -4, -20, -84, -340, -4436, -999999,
                None, 7, None, -2, 0]
        enc, cx = MQEncoder(), {}
        for v in vals:
            _int_encode(enc, cx, v)
        dec, cx2 = MQDecoder(enc.flush()), {}
        assert [_int_decode(dec, cx2) for _ in vals] == vals

        for codelen in (1, 2, 5, 9):
            ids = [(7 * i) % (1 << codelen) for i in range(40)]
            enc, cx = MQEncoder(), {}
            for i in ids:
                _iaid_encode(enc, cx, codelen, i)
            dec, cx2 = MQDecoder(enc.flush()), {}
            assert [_iaid_decode(dec, cx2, codelen) for _ in ids] == ids

    def test_symbol_dict_round_trips(self):
        """Multi-height-class dictionaries round-trip pixel-exact; the
        encoder rejects unsorted heights, the decoder rejects huffman/
        refinement flags."""
        import pytest as _pytest

        from ocr_vector_db_spark.sources.jbig2 import (
            JBIG2Error,
            decode_symbol_dict,
            encode_symbol_dict,
        )

        syms = self._font()
        payload = encode_symbol_dict(syms)
        assert decode_symbol_dict(payload, []) == syms

        with _pytest.raises(JBIG2Error):
            encode_symbol_dict(list(reversed(syms)))
        with _pytest.raises(JBIG2Error):  # SDHUFF set
            decode_symbol_dict(b"\x00\x01" + payload[2:], [])
        with _pytest.raises(JBIG2Error):  # SDREFAGG set
            decode_symbol_dict(b"\x00\x02" + payload[2:], [])

    def test_symbol_page_round_trips(self):
        """A symbol-coded page (dictionary + text region) decodes
        pixel-exact against an independently composed page, including
        repeated symbols, multiple strips and touching instances."""
        from ocr_vector_db_spark.sources.jbig2 import (
            decode_embedded,
            encode_embedded_symbols,
        )

        syms = self._font()
        w, h = 64, 30
        placements = sorted([
            (0, 2, 2), (1, 10, 2), (2, 18, 3), (3, 26, 2),
            (1, 2, 12), (1, 8, 12), (0, 20, 12),   # repeats, same strip
            (2, 40, 20), (2, 45, 20), (3, 56, 21),  # adjacent instances
        ], key=lambda p: (p[2], p[1]))
        stream = encode_embedded_symbols(w, h, syms, placements)
        gw, gh, got = decode_embedded(stream)
        assert (gw, gh) == (w, h)
        assert got == self._compose(w, h, syms, placements)

    def test_symbol_pdf_asset_extraction(self):
        """A symbol-coded /JBIG2Decode XObject flows through the full
        distributed asset path with ISO 32000 polarity (1=black -> gray
        0), like the generic-region fixtures of q148."""
        from ocr_vector_db_spark.sources.pdf_decode import (
            build_simple_pdf,
            extract_pdf_images,
        )

        syms = self._font()
        w, h = 48, 20
        placements = sorted([
            (0, 2, 3), (1, 9, 3), (2, 17, 4), (0, 30, 11), (3, 40, 12),
        ], key=lambda p: (p[2], p[1]))
        pdf = build_simple_pdf([[
            {"kind": "text", "text": "symbol coded scan", "x": 50,
             "y": 700, "size": 12},
            {"kind": "image", "x": 50, "y": 300, "w": 96, "h": 40,
             "width": w, "height": h, "jbig2": True,
             "jbig2_symbols": (syms, placements)},
        ]])
        imgs = extract_pdf_images(pdf)
        assert len(imgs) == 1
        md = imgs[0]["metadata"]
        assert (md["format"], md["width"], md["height"]) == \
            ("raw", "48", "20")
        want = self._compose(w, h, syms, placements)
        assert imgs[0]["data"] == bytes(0 if p else 255 for p in want)

    def test_symbol_dict_in_globals_stream(self):
        """jbig2enc -p layout: the symbol dictionary rides /JBIG2Globals
        and the per-image stream carries page info + text region."""
        from ocr_vector_db_spark.sources.jbig2 import (
            _IMM_LOSSLESS_TEXT,
            _PAGE_INFO,
            _SYMBOL_DICT,
            _segment,
            decode_embedded,
            encode_symbol_dict,
            encode_text_region,
        )
        import struct as _struct

        syms = self._font()
        w, h = 40, 16
        placements = [(0, 2, 2), (2, 10, 3), (1, 20, 9)]
        placements.sort(key=lambda p: (p[2], p[1]))
        glob = _segment(0, _SYMBOL_DICT, 1, encode_symbol_dict(syms))
        page_info = _struct.pack(">IIII", w, h, 0, 0) + b"\x01\x00\x00"
        stream = (_segment(1, _PAGE_INFO, 1, page_info)
                  + _segment(2, _IMM_LOSSLESS_TEXT, 1,
                             encode_text_region(w, h, placements, syms)))
        gw, gh, got = decode_embedded(stream, glob)
        assert (gw, gh) == (w, h)
        assert got == self._compose(w, h, syms, placements)

    def test_pymupdf_symbol_parity_when_available(self):
        """PyMuPDF parity gate (skips without fitz): the symbol-coded
        page our codec encodes must rasterize identically through fitz."""
        fitz = pytest.importorskip("fitz")

        from ocr_vector_db_spark.sources.pdf_decode import (
            build_simple_pdf,
            extract_pdf_images,
        )

        syms = self._font()
        w, h = 48, 20
        placements = sorted([
            (0, 2, 3), (1, 9, 3), (2, 17, 4), (0, 30, 11),
        ], key=lambda p: (p[2], p[1]))
        pdf = build_simple_pdf([[
            {"kind": "image", "x": 50, "y": 300, "w": 96, "h": 40,
             "width": w, "height": h, "jbig2": True,
             "jbig2_symbols": (syms, placements)},
        ]])
        ours = extract_pdf_images(pdf)[0]["data"]
        doc = fitz.open(stream=pdf, filetype="pdf")
        xref = doc.get_page_images(0)[0][0]
        pm = fitz.Pixmap(doc, xref)
        if pm.colorspace and pm.colorspace.n > 1:
            pm = fitz.Pixmap(fitz.csGRAY, pm)
        assert bytes(pm.samples) == ours


class TestJBIG2Halftone:
    """Halftone profile (round 14): pattern dictionaries + Gray-coded
    grayscale planes + grid render (T.88 §6.6/§6.7, Annex C.5)."""

    @staticmethod
    def _ramp_patterns(hd=4, n=8):
        """n density-ramp patterns: pattern k fills the first k cells of
        a deterministic order — distinct, monotone darkness."""
        import hashlib

        order = sorted(
            range(hd * hd),
            key=lambda i: hashlib.md5(f"o:{i}".encode()).digest(),
        )
        pats = []
        for k in range(n):
            p = bytearray(hd * hd)
            for i in order[:k]:
                p[i] = 1
            pats.append(bytes(p))
        return pats

    @staticmethod
    def _grays(hgw, hgh, n):
        import hashlib

        return [
            hashlib.md5(f"g:{m}:{x}".encode()).digest()[0] % n
            for m in range(hgh) for x in range(hgw)
        ]

    @staticmethod
    def _compose(w, h, grays, hgw, hgh, pats, hd):
        """Independent reference render: axis-aligned grid, OR."""
        page = bytearray(w * h)
        for m in range(hgh):
            for n in range(hgw):
                pat = pats[grays[m * hgw + n]]
                px, py = n * hd, m * hd
                for yy in range(hd):
                    if py + yy >= h:
                        continue
                    for xx in range(hd):
                        if px + xx < w and pat[yy * hd + xx]:
                            page[(py + yy) * w + px + xx] = 1
        return bytes(page)

    def test_pattern_dict_round_trip(self):
        from ocr_vector_db_spark.sources.jbig2 import (
            decode_pattern_dict,
            encode_pattern_dict,
        )

        pats = self._ramp_patterns(4, 8)
        payload = encode_pattern_dict(pats, 4, 4)
        hdpw, hdph, got = decode_pattern_dict(payload)
        assert (hdpw, hdph) == (4, 4)
        assert got == pats

    def test_halftone_page_round_trips(self):
        """Gray values needing 3 bitplanes decode pixel-exact against
        an independently composed page."""
        from ocr_vector_db_spark.sources.jbig2 import (
            decode_embedded,
            encode_embedded_halftone,
        )

        pats = self._ramp_patterns(4, 8)  # 8 patterns → HBPP = 3
        hgw, hgh, hd = 9, 6, 4
        w, h = hgw * hd, hgh * hd
        grays = self._grays(hgw, hgh, 8)
        stream = encode_embedded_halftone(w, h, grays, hgw, hgh,
                                          pats, hd, hd)
        gw, gh, got = decode_embedded(stream)
        assert (gw, gh) == (w, h)
        assert got == self._compose(w, h, grays, hgw, hgh, pats, hd)

    def test_single_plane_and_two_patterns(self):
        """HBPP = 1 (two patterns) is the degenerate gray decode."""
        from ocr_vector_db_spark.sources.jbig2 import (
            decode_embedded,
            encode_embedded_halftone,
        )

        pats = self._ramp_patterns(4, 2)
        hgw, hgh, hd = 5, 3, 4
        w, h = hgw * hd, hgh * hd
        grays = self._grays(hgw, hgh, 2)
        stream = encode_embedded_halftone(w, h, grays, hgw, hgh,
                                          pats, hd, hd)
        assert decode_embedded(stream)[2] == self._compose(
            w, h, grays, hgw, hgh, pats, hd)

    def test_halftone_pdf_asset_extraction(self):
        """A halftone /JBIG2Decode XObject flows through the full
        distributed asset path with ISO 32000 polarity (1=black → gray
        0), like the generic/symbol fixtures of q148."""
        from ocr_vector_db_spark.sources.pdf_decode import (
            build_simple_pdf,
            extract_pdf_images,
        )

        pats = self._ramp_patterns(4, 4)
        hgw, hgh, hd = 6, 4, 4
        w, h = hgw * hd, hgh * hd
        grays = self._grays(hgw, hgh, 4)
        pdf = build_simple_pdf([[
            {"kind": "text", "text": "halftone scan", "x": 50,
             "y": 700, "size": 12},
            {"kind": "image", "x": 50, "y": 300, "w": 96, "h": 64,
             "width": w, "height": h, "jbig2": True,
             "jbig2_halftone": (grays, hgw, hgh, pats, hd, hd)},
        ]])
        (img,) = extract_pdf_images(pdf)
        md = img["metadata"]
        assert (md["format"], md["width"], md["height"]) == \
            ("raw", str(w), str(h))
        want = self._compose(w, h, grays, hgw, hgh, pats, hd)
        assert img["data"] == bytes(0 if p else 255 for p in want)

    def test_halftone_rejections(self):
        """Unsupported halftone shapes raise JBIG2Error (PyMuPDF path),
        never a wrong decode: MMR planes, skip bitmaps, non-OR ops,
        a region arriving before any pattern dictionary."""
        import pytest as _pytest

        from ocr_vector_db_spark.sources.jbig2 import (
            JBIG2Error,
            decode_halftone_region,
            encode_halftone_region,
        )

        pats = self._ramp_patterns(4, 4)
        payload = encode_halftone_region(8, 8, [0, 1, 2, 3], 2, 2,
                                         pats, 4, 4)
        flags_off = 17
        for bad_flags in (
            payload[flags_off] | 0x01,   # HMMR
            payload[flags_off] | 0x08,   # HENABLESKIP
            payload[flags_off] | 0x10,   # HCOMBOP = AND
        ):
            mut = payload[:flags_off] + bytes((bad_flags,)) \
                + payload[flags_off + 1:]
            with _pytest.raises(JBIG2Error):
                decode_halftone_region(mut, (4, 4, pats))
        with _pytest.raises(JBIG2Error):  # no pattern dictionary yet
            decode_halftone_region(payload, (0, 0, []))

    def test_halftone_work_budget(self):
        """ADVICE r14: every individual geometry cap can pass while
        TOTAL work (grid cells × gray planes for the pure-Python MQ
        decode, grid cells × pattern area for the render loop) reaches
        1e10+ operations — both phases must be budgeted up front,
        before any plane decodes."""
        import struct as _st

        import pytest as _pytest

        from ocr_vector_db_spark.sources.jbig2 import (
            JBIG2Error,
            decode_halftone_region,
            encode_halftone_region,
        )

        pats = self._ramp_patterns(4, 4)
        payload = encode_halftone_region(8, 8, [0, 1, 2, 3], 2, 2,
                                         pats, 4, 4)
        # 16M grid cells (passes the grid cap) × 8 planes of a 129-
        # pattern dictionary → 134M MQ-decoded pixels: over budget
        mut = bytearray(payload)
        mut[18:26] = _st.pack(">II", 4096, 4096)
        with _pytest.raises(JBIG2Error, match="work over budget"):
            decode_halftone_region(bytes(mut), (4, 4, [pats[0]] * 129))
        # 8M cells × 64-pixel patterns → 536M rendered pixels against
        # an in-cap 64 MP region: over budget before the render loop
        mut[18:26] = _st.pack(">II", 4096, 2048)
        mut[0:8] = _st.pack(">II", 8192, 8192)
        with _pytest.raises(JBIG2Error, match="work over budget"):
            decode_halftone_region(bytes(mut), (8, 8, pats))

    def test_halftone_writer_rejects_rectangular_cells(self):
        """ADVICE r14: the writer's axis-aligned HRX=HDPW<<8, HRY=0
        grid can only tile square cells; hdpw != hdph must raise, not
        silently overlap/gap."""
        import pytest as _pytest

        from ocr_vector_db_spark.sources.jbig2 import (
            JBIG2Error,
            encode_halftone_region,
        )

        pats = [bytes(4 * 2)] * 2
        with _pytest.raises(JBIG2Error, match="square cells"):
            encode_halftone_region(8, 8, [0, 1, 0, 1], 2, 2, pats, 4, 2)


class TestJBIG2TemplatesMMR:
    """Generic-region templates 1-3 + MMR regions (round 11)."""

    @staticmethod
    def _pix(w, h):
        return bytes(
            1 if (x % 7 == 0 or y == h // 2 or (x + y) % 11 == 0) else 0
            for y in range(h) for x in range(w)
        )

    def test_templates_round_trip(self):
        """All four GBTEMPLATEs round-trip, with and without TPGDON (each
        template has its own SLTP pseudo-context, §6.2.5.7)."""
        from ocr_vector_db_spark.sources.jbig2 import (
            decode_embedded,
            encode_embedded,
        )

        w, h = 77, 31
        pix = self._pix(w, h)
        for template in (0, 1, 2, 3):
            for tp in (False, True):
                s = encode_embedded(pix, w, h, tpgdon=tp, template=template)
                assert decode_embedded(s) == (w, h, pix), (template, tp)

    def test_mmr_region_round_trip_via_fax_codec(self):
        """MMR=1 regions decode through the shared T.6 codec
        (sources/ccitt.py) — same 1=black semantic domain."""
        from ocr_vector_db_spark.sources.jbig2 import (
            JBIG2Error,
            decode_embedded,
            encode_embedded,
        )
        import pytest as _pytest

        w, h = 64, 24
        pix = self._pix(w, h)
        s = encode_embedded(pix, w, h, mmr=True)
        assert decode_embedded(s) == (w, h, pix)
        # garbage MMR data raises JBIG2Error, not a raw CCITTError
        with _pytest.raises(JBIG2Error):
            decode_embedded(s[:-12] + b"\x55" * 12)

    def test_pymupdf_template_mmr_parity_when_available(self):
        """fitz parity for templates 1-3 and MMR: our encodings must
        rasterize identically through PyMuPDF (conformance, not just
        round-trip consistency)."""
        fitz = pytest.importorskip("fitz")

        from ocr_vector_db_spark.sources.pdf_decode import (
            build_simple_pdf,
            extract_pdf_images,
        )
        from ocr_vector_db_spark.sources.jbig2 import encode_embedded

        w, h = 64, 24
        pix = self._pix(w, h)
        for kw in ({"template": 1}, {"template": 2}, {"template": 3},
                   {"template": 1, "tpgdon": True}, {"mmr": True}):
            stream = encode_embedded(pix, w, h, **kw)
            pdf = build_simple_pdf([[
                {"kind": "image", "x": 50, "y": 300, "w": 128, "h": 48,
                 "width": w, "height": h, "jbig2": True, "pixels": pix},
            ]])
            # graft our custom stream over the default-template one
            from ocr_vector_db_spark.sources.jbig2 import (
                encode_embedded as _ee,
            )
            default = _ee(pix, w, h)
            assert default in pdf
            pdf = pdf.replace(
                f"/Length {len(default)} >>".encode("latin-1"),
                f"/Length {len(stream)} >>".encode("latin-1"),
            ).replace(default, stream)
            ours = extract_pdf_images(pdf)[0]["data"]
            doc = fitz.open(stream=pdf, filetype="pdf")
            xref = doc.get_page_images(0)[0][0]
            pm = fitz.Pixmap(doc, xref)
            if pm.colorspace and pm.colorspace.n > 1:
                pm = fitz.Pixmap(fitz.csGRAY, pm)
            assert bytes(pm.samples) == ours, kw


class TestJBIG2Frozen:
    """Frozen byte-stream goldens (ADVICE r11): the fitz conformance
    gates skip in this environment, and live encode→decode round-trips
    cannot catch a SYMMETRIC context/bit-order change — both sides would
    drift together. These streams were produced once and checked in; any
    later decoder change that alters their pixels fails unconditionally.
    One fixture per profile: all four GBTEMPLATEs × TPGDON, MMR, and a
    symbol-coded page (dictionary + multi-strip text region)."""

    @staticmethod
    def _fixtures():
        import base64
        import json
        import os
        import zlib

        path = os.path.join(os.path.dirname(__file__), "golden",
                            "jbig2_frozen.json")
        with open(path) as fh:
            return {k: zlib.decompress(base64.b64decode(v))
                    for k, v in json.load(fh).items()}

    def test_frozen_generic_and_mmr_streams_decode_exactly(self):
        import hashlib

        from ocr_vector_db_spark.sources.jbig2 import decode_embedded

        w, h = 77, 31
        want = bytes(
            1 if (x % 7 == 0 or y == h // 2 or (x + y) % 11 == 0) else 0
            for y in range(h) for x in range(w)
        )
        assert hashlib.md5(want).hexdigest() == \
            "967b1303572b22042053a7e54318f081"
        fx = self._fixtures()
        for name in [f"generic_t{t}_tp{tp}"
                     for t in (0, 1, 2, 3) for tp in (0, 1)] + ["mmr"]:
            assert decode_embedded(fx[name]) == (w, h, want), name

    def test_frozen_symbol_stream_decodes_exactly(self):
        import hashlib

        from ocr_vector_db_spark.sources.jbig2 import decode_embedded

        w, h, pix = decode_embedded(self._fixtures()["symbols"])
        assert (w, h) == (64, 30)
        assert hashlib.md5(pix).hexdigest() == \
            "b65a812ef70ebd01abcfc5e2777fc4e1"
        # and the pixels match an independent composition of the glyphs
        syms = TestJBIG2Symbols._font()
        placements = sorted([
            (0, 2, 2), (1, 10, 2), (2, 18, 3), (3, 26, 2),
            (1, 2, 12), (1, 8, 12), (0, 20, 12),
            (2, 40, 20), (2, 45, 20), (3, 56, 21),
        ], key=lambda p: (p[2], p[1]))
        assert pix == TestJBIG2Symbols._compose(w, h, syms, placements)

    def test_encoder_still_matches_frozen_streams(self):
        """The encoder side of the freeze: if encode output drifts from
        the checked-in bytes, this fails — flagging that the frozen
        decoder goldens no longer pin the CURRENT encoder's dialect and
        need regenerating (plus external re-validation)."""
        from ocr_vector_db_spark.sources.jbig2 import (
            encode_embedded,
            encode_embedded_symbols,
        )

        w, h = 77, 31
        pix = bytes(
            1 if (x % 7 == 0 or y == h // 2 or (x + y) % 11 == 0) else 0
            for y in range(h) for x in range(w)
        )
        fx = self._fixtures()
        for t in (0, 1, 2, 3):
            for tp in (0, 1):
                assert encode_embedded(
                    pix, w, h, tpgdon=bool(tp), template=t
                ) == fx[f"generic_t{t}_tp{tp}"], (t, tp)
        assert encode_embedded(pix, w, h, mmr=True) == fx["mmr"]
        syms = TestJBIG2Symbols._font()
        placements = sorted([
            (0, 2, 2), (1, 10, 2), (2, 18, 3), (3, 26, 2),
            (1, 2, 12), (1, 8, 12), (0, 20, 12),
            (2, 40, 20), (2, 45, 20), (3, 56, 21),
        ], key=lambda p: (p[2], p[1]))
        assert encode_embedded_symbols(64, 30, syms, placements) \
            == fx["symbols"]


class TestJBIG2Malformed:
    """Truncated/corrupt segment payloads fold into JBIG2Error (ADVICE
    r11): decode_embedded's callers promise 'returns None when
    malformed', so no struct.error/IndexError may escape the parsers."""

    def test_truncated_symbol_dict_payload_is_jbig2error(self):
        """Cutting a symbol-dictionary payload inside the fixed layout
        (flags / AT pixels / the n_ex+n_new words) raises JBIG2Error,
        not struct.error."""
        from ocr_vector_db_spark.sources.jbig2 import (
            JBIG2Error,
            decode_symbol_dict,
            encode_symbol_dict,
        )

        syms = TestJBIG2Symbols._font()
        payload = encode_symbol_dict(syms)
        # every truncation point across the fixed-layout prefix (2 flags
        # + 8 AT + 8 counts) and a few inside the MQ codestream
        for cut in [*range(2, 19), len(payload) - 3]:
            with pytest.raises(JBIG2Error):
                decode_symbol_dict(payload[:cut], [])

    def test_truncated_text_region_payload_is_jbig2error(self):
        """Cutting a text-region payload inside region-info / flags /
        instance-count raises JBIG2Error, not struct.error."""
        from ocr_vector_db_spark.sources.jbig2 import (
            JBIG2Error,
            decode_text_region,
            encode_text_region,
        )

        syms = TestJBIG2Symbols._font()
        payload = encode_text_region(
            40, 16, [(0, 2, 2), (1, 10, 3)], syms)
        for cut in range(1, 24):
            with pytest.raises(JBIG2Error):
                decode_text_region(payload[:cut], syms)

    def test_truncated_segment_headers_are_jbig2error(self):
        """Cutting an embedded stream inside a segment HEADER (the
        short-form page/length reads and the long-form referred-segment
        table) raises JBIG2Error, not struct.error/IndexError."""
        from ocr_vector_db_spark.sources.jbig2 import (
            JBIG2Error,
            decode_embedded,
            encode_embedded_symbols,
        )

        syms = TestJBIG2Symbols._font()
        stream = encode_embedded_symbols(
            64, 30, syms, [(0, 2, 2), (2, 18, 3)])
        for cut in range(1, len(stream)):
            try:
                decode_embedded(stream[:cut])
            except JBIG2Error:
                pass  # the only acceptable failure mode

    def test_malformed_embedded_jbig2_does_not_abort_extraction(self):
        """A truncated symbol-coded /JBIG2Decode stream makes
        jbig2_image_xobject return None and extract_pdf_images carry on
        with the rest of the document (the ADVICE r11 repro: one bad
        embedded stream must not crash the whole document)."""
        from ocr_vector_db_spark.sources.jbig2 import (
            encode_embedded_symbols,
        )
        from ocr_vector_db_spark.sources.pdf_decode import (
            build_simple_pdf,
            extract_pdf_images,
            jbig2_image_xobject,
        )

        syms = TestJBIG2Symbols._font()
        w, h = 48, 20
        placements = sorted([
            (0, 2, 3), (1, 9, 3), (2, 17, 4),
        ], key=lambda p: (p[2], p[1]))
        pix = bytes(1 if (x + y) % 5 == 0 else 0
                    for y in range(12) for x in range(40))
        pdf = build_simple_pdf([[
            {"kind": "image", "x": 50, "y": 500, "w": 96, "h": 40,
             "width": w, "height": h, "jbig2": True,
             "jbig2_symbols": (syms, placements)},
            {"kind": "image", "x": 50, "y": 200, "w": 80, "h": 24,
             "width": 40, "height": 12, "jbig2": True, "pixels": pix},
        ]])
        full = encode_embedded_symbols(w, h, syms, placements)
        assert full in pdf
        for cut in (11 + 15, len(full) // 2, len(full) - 5):
            bad = full[:cut]
            mangled = pdf.replace(
                f"/Length {len(full)} >>".encode("latin-1"),
                f"/Length {len(bad)} >>".encode("latin-1"),
            ).replace(full, bad)
            imgs = extract_pdf_images(mangled)
            # the intact generic-region image still extracts
            assert [i["metadata"]["width"] for i in imgs] == ["40"]
            assert imgs[0]["data"] == bytes(0 if p else 255 for p in pix)

    def test_jbig2_xobject_returns_none_on_garbage(self):
        from ocr_vector_db_spark.sources.pdf_decode import (
            jbig2_image_xobject,
        )

        objs = {7: (b"<< /Subtype /Image /Filter /JBIG2Decode >>",
                    b"\x00\x00\x00\x01\x30\x00\x01\x00\x00")}
        assert jbig2_image_xobject(objs, 7) is None


class TestJPXPassthrough:
    """JPXDecode passthrough (round 11): the DCT treatment for JPEG 2000
    — payload verbatim, dimensions/components/depth from the SIZ marker."""

    @staticmethod
    def _j2k(w, h, n_comp=3, depth=8):
        import struct as _struct

        lsiz = 38 + 3 * n_comp
        siz = (b"\xff\x51" + _struct.pack(">HH", lsiz, 0)
               + _struct.pack(">IIII", w, h, 0, 0)
               + _struct.pack(">IIII", w, h, 0, 0)
               + _struct.pack(">H", n_comp)
               + bytes([depth - 1, 1, 1]) * n_comp)
        # SOC + SIZ + a stub tile part; not a rasterizable image, but a
        # structurally valid header — all the passthrough parses
        return b"\xff\x4f" + siz + b"\xff\x90" + b"\x00" * 8

    def test_siz_parse_raw_and_jp2(self):
        from ocr_vector_db_spark.sources.pdf_decode import _jpx_siz

        raw = self._j2k(640, 480, n_comp=3, depth=8)
        assert _jpx_siz(raw) == (640, 480, 3, 8)
        jp2 = (b"\x00\x00\x00\x0cjP  \r\n\x87\n"
               + b"\x00\x00\x00\x14ftypjp2 \x00\x00\x00\x00jp2 "
               + b"\x00\x00\x00\x00jp2c" + self._j2k(33, 17, 1, 12))
        assert _jpx_siz(jp2) == (33, 17, 1, 12)
        assert _jpx_siz(b"\xff\x4f\xff\x51") is None   # truncated
        assert _jpx_siz(b"not jpx at all") is None
        # truncated right after Csiz (exactly 42 bytes from SOC, so the
        # Ssiz byte at offset 42 is missing) — the ADVICE r11 off-by-one
        assert _jpx_siz(raw[:42]) is None
        for cut in range(4, 43):                       # every short prefix
            assert _jpx_siz(raw[:cut]) is None
        assert _jpx_siz(raw[:43]) == (640, 480, 3, 8)  # Ssiz now present

    def test_jpx_asset_extraction(self):
        """JPXDecode images flow through extract_pdf_images as opaque
        payloads with typed metadata — format=jpx, SIZ-derived facts."""
        from ocr_vector_db_spark.sources.pdf_decode import (
            build_simple_pdf,
            extract_pdf_images,
        )

        raw = self._j2k(120, 44, n_comp=3, depth=8)
        jp2 = (b"\x00\x00\x00\x0cjP  \r\n\x87\n"
               + b"\x00\x00\x00\x00jp2c" + self._j2k(50, 20, 1, 8))
        pdf = build_simple_pdf([[
            {"kind": "text", "text": "aerial imagery", "x": 50, "y": 700,
             "size": 12},
            {"kind": "image", "x": 50, "y": 400, "w": 240, "h": 88,
             "width": 120, "height": 44, "jpx": raw},
            {"kind": "image", "x": 50, "y": 200, "w": 100, "h": 40,
             "width": 50, "height": 20, "jpx": jp2},
        ]])
        imgs = extract_pdf_images(pdf)
        assert len(imgs) == 2
        by_w = {i["metadata"]["width"]: i for i in imgs}
        a, b = by_w["120"], by_w["50"]
        assert a["data"] == raw and b["data"] == jp2
        assert a["metadata"]["format"] == "jpx"
        assert (a["metadata"]["components"],
                a["metadata"]["bit_depth"]) == ("3", "8")
        assert a["metadata"]["media_type"] == "image/x-j2c"
        assert b["metadata"]["media_type"] == "image/jp2"
        assert (b["metadata"]["height"], b["metadata"]["components"]) \
            == ("20", "1")
