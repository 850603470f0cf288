"""minipdf: the from-scratch, stdlib-only PDF extractor.

Golden coverage comes from the reference's OWN example documents —
the same files its test_doc_examples suite asserts on — so these tests
pin the full chain (xref/objects/filters/fonts/content/layout) to the
reference's published expectations, per surface:

- classic-xref + TrueType/ToUnicode documents (simple_memo,
  order_summary, tables, grid, columns: LibreOffice-style);
- xref-stream + object-stream + Type0/Identity-H CID documents
  (figure, image: Cairo-style);
- AES-128 (R4/AESV2) standard security handler (test_protected).

The reference's unmodified test_doc_examples/test_loaders suites also
run end-to-end via compat/loaders (tests/test_reference_suite.py);
here we keep targeted unit checks that survive without the reference
checkout's test harness.
"""

import pytest

from py_pdf_parser_spark.sources.minipdf import (
    LAParams,
    PDFPasswordIncorrect,
    extract_pages,
)
from py_pdf_parser_spark.sources.minipdf.crypto import (
    _decrypt_block,
    _expand_key,
    aes_cbc_decrypt,
    rc4,
)
from py_pdf_parser_spark.sources.minipdf.fonts import parse_tounicode
from py_pdf_parser_spark.sources.minipdf.layout import TextBox
from py_pdf_parser_spark.sources.minipdf.objects import (
    Name,
    Parser,
    Ref,
)

EXAMPLES = "/root/reference/docs/source/example_files"
TEST_PDFS = "/root/reference/tests/data/pdfs"


def _read(path: str) -> bytes:
    with open(path, "rb") as f:
        return f.read()


def _boxes(data: bytes, **la):
    la.setdefault("boxes_flow", None)
    out = []
    for page in extract_pages(data, laparams=LAParams(**la)):
        for el in page:
            if isinstance(el, TextBox):
                out.append(el)
    return out


class TestObjects:
    def test_parser_core_forms(self):
        p = Parser(
            b"<</A 1 /B (hi\\)!) /C [1 2.5 /Nm] /D 3 0 R /E <686921>>>"
        )
        d = p.parse_object()
        assert d["A"] == 1
        assert d["B"] == b"hi)!"
        assert d["C"] == [1, 2.5, Name("Nm")]
        assert d["D"] == Ref(3, 0)
        assert d["E"] == b"hi!"

    def test_name_hex_escape_and_octal_string(self):
        p = Parser(rb"/A#42C (\101\102\103)".replace(b"\\\\", b"\\"))
        assert p.parse_object() == Name("ABC")
        assert p.parse_object() == b"ABC"

    def test_number_pair_is_not_a_ref(self):
        p = Parser(b"[1 2 3 0 R 4]")
        assert p.parse_object() == [1, 2, Ref(3, 0), 4]


class TestCrypto:
    def test_aes_fips197_vector(self):
        key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
        ct = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
        pt = _decrypt_block(ct, _expand_key(key))
        assert pt.hex() == "00112233445566778899aabbccddeeff"

    def test_rc4_vector(self):
        assert rc4(b"Key", b"Plaintext").hex().upper() == (
            "BBF316E8D940AF0AD3"
        )

    def test_aes_cbc_roundtrip_shape(self):
        # decrypt(IV || enc(pad(x))) must return x; build the forward
        # direction from the inverse cipher's contract: decrypting a
        # random "ciphertext" and re-encrypting is unavailable (no
        # encryptor here), so assert the malformed-input contract
        assert aes_cbc_decrypt(b"0" * 16, b"short") == b""


class TestToUnicode:
    def test_bfchar_and_bfrange(self):
        cmap = b"""
        begincmap
        2 beginbfchar
        <0001> <0041>
        <0002> <00480069>
        endbfchar
        1 beginbfrange
        <0010> <0012> <0061>
        endbfrange
        1 beginbfrange
        <0020> <0021> [<0058> <0059>]
        endbfrange
        endcmap
        """
        m = parse_tounicode(cmap)
        assert m[1] == "A"
        assert m[2] == "Hi"
        assert (m[0x10], m[0x11], m[0x12]) == ("a", "b", "c")
        assert (m[0x20], m[0x21]) == ("X", "Y")


class TestGoldenDocuments:
    def test_simple_memo_boxes(self):
        boxes = _boxes(_read(f"{EXAMPLES}/simple_memo.pdf"))
        texts = [b.get_text().strip() for b in boxes]
        assert "Memorandum" in texts
        assert "All Developers" in texts
        assert "John Smith" in texts
        assert "1st January 2020" in texts
        assert "A new PDF Parsing tool" in texts
        joined = "\n".join(texts)
        assert "you should all check it out!" in joined

    def test_grid_four_cells(self):
        texts = sorted(
            b.get_text().strip()
            for b in _boxes(_read(f"{EXAMPLES}/grid.pdf"))
        )
        assert texts == [
            "Bottom Left", "Bottom Right", "Top Left", "Top Right",
        ]

    def test_figure_cid_font_and_all_texts(self):
        data = _read(f"{EXAMPLES}/figure.pdf")
        # without all_texts: figure text invisible
        assert [b.get_text().strip() for b in _boxes(data)] == [
            "Here is some text outside of an image"
        ]
        # with all_texts the loader surfaces figure boxes too
        pages = list(
            extract_pages(
                data, laparams=LAParams(boxes_flow=None, all_texts=True)
            )
        )
        fig_texts = [
            el.get_text().strip()
            for page in pages
            for item in page
            if not isinstance(item, TextBox)
            for el in item
            if isinstance(el, TextBox)
        ]
        assert fig_texts == ["This is some text in an image"]

    def test_char_payload_fonts_and_sizes(self):
        boxes = _boxes(_read(f"{EXAMPLES}/order_summary.pdf"))
        # the 16pt bold title is the font_mapping key the reference's
        # golden test relies on ("BAAAAA+LiberationSerif-Bold,16.0")
        sizes = {}
        for b in boxes:
            if b.get_text().strip() == "Order Summary:":
                chars = [
                    c for line in b for c in line if hasattr(c, "fontname")
                ]
                assert {c.fontname for c in chars} == {
                    "BAAAAA+LiberationSerif-Bold"
                }
                key = round(chars[0].height, 1)
                sizes[key] = len(chars)
        assert set(sizes) == {16.0, 12.0}  # title + sub_title boxes

    def test_protected_pdf_password(self):
        data = _read(f"{TEST_PDFS}/test_protected.pdf")
        with pytest.raises(PDFPasswordIncorrect):
            list(extract_pages(data, password="wrong_password"))
        boxes = []
        for page in extract_pages(
            data, password="p4ssword", laparams=LAParams(boxes_flow=None)
        ):
            boxes += [el for el in page if isinstance(el, TextBox)]
        assert boxes  # decrypted content stream yields text

    def test_multi_page_ids_sequential(self):
        pages = list(
            extract_pages(
                _read(f"{TEST_PDFS}/test.pdf"),
                laparams=LAParams(boxes_flow=None),
            )
        )
        assert [p.pageid for p in pages] == [1, 2]
        assert all(p.width > 0 and p.height > 0 for p in pages)

    def test_classic_xref_parses_without_reconstruction(self, monkeypatch):
        """The classic xref table is the HAPPY path, not the fallback:
        subsection headers are plain ints (spec 7.5.4) and must be read
        without the N-G-R reference lookahead pulling entry bytes
        through the lexer (a bug the full-file reconstruction scan used
        to mask).  Every reference example PDF and a writer PDF must
        load their xref with the last-resort scan disabled."""
        import glob

        from py_pdf_parser_spark.kernel.layout import spans_for
        from py_pdf_parser_spark.sources.minipdf import document as docmod
        from py_pdf_parser_spark.sources.pdf_writer import render_pdf

        def boom(self):
            raise AssertionError("xref reconstruction fallback hit")

        monkeypatch.setattr(docmod.Document, "_reconstruct_xref", boom)

        blobs = [render_pdf("ora-000000", spans_for("ora-000000"))]
        blobs += [
            _read(p)
            for p in sorted(
                glob.glob(
                    "/root/reference/docs/source/example_files/*.pdf"
                )
            )
        ]
        assert len(blobs) >= 6
        for blob in blobs:
            assert len(docmod.Document(blob).xref) > 0


def _rotated_text_pdf() -> bytes:
    """A minimal fixture with two vertical (90-degree-rotated, top-to-
    bottom) glyph columns 12pt apart plus one horizontal line — the
    CJK-column shape detect_vertical exists for.  Built with the
    writer's low-level builder so xref offsets are exact."""
    from py_pdf_parser_spark.sources.pdf_writer import _PDFBuilder

    b = _PDFBuilder()
    catalog = b.reserve()
    pages_obj = b.reserve()
    desc = b.add(
        b"<</Type/FontDescriptor /FontName/Helv /Flags 32 "
        b"/FontBBox[0 0 600 1000] /ItalicAngle 0 /Ascent 1000 "
        b"/Descent 0 /CapHeight 1000 /StemV 80 /MissingWidth 600>>"
    )
    font = b.add(
        b"<</Type/Font /Subtype/TrueType /BaseFont/Helv "
        b"/FontDescriptor %d 0 R>>" % desc
    )
    # Tm [0 -1 1 0 x y]: text-space +x advances DOWN the device page
    # (top-to-bottom column), text-space +y maps to device +x.
    content = (
        b"BT /F0 10 Tf 0 -1 1 0 70 90 Tm (VERT) Tj ET\n"
        b"BT /F0 10 Tf 0 -1 1 0 58 90 Tm (TEXT) Tj ET\n"
        b"BT /F0 10 Tf 10 10 Td (HORIZ) Tj ET\n"
    )
    cont = b.add(
        b"<</Length %d>>\nstream\n%s\nendstream" % (len(content), content)
    )
    page = b.add(
        b"<</Type/Page /Parent %d 0 R /MediaBox[0 0 100 100] "
        b"/Resources<</Font<</F0 %d 0 R>>>> /Contents %d 0 R>>"
        % (pages_obj, font, cont)
    )
    b.set(pages_obj, b"<</Type/Pages /Count 1 /Kids[%d 0 R]>>" % page)
    b.set(catalog, b"<</Type/Catalog /Pages %d 0 R>>" % pages_obj)
    return b.build()


class TestVerticalText:
    """LAParams(detect_vertical=True) — pdfminer's public vertical
    grouping semantics (r4 verdict task #6)."""

    def test_vertical_columns_group_and_order(self):
        from py_pdf_parser_spark.sources.minipdf.layout import (
            TextBoxVertical,
        )

        boxes = _boxes(_rotated_text_pdf(), detect_vertical=True)
        texts = [bx.get_text() for bx in boxes]
        # the two columns merge into ONE vertical box, rightmost
        # column first (CJK reading order), then the horizontal line
        assert texts == ["VERT\nTEXT\n", "HORIZ\n"]
        assert isinstance(boxes[0], TextBoxVertical)
        assert not isinstance(boxes[1], TextBoxVertical)
        # vertical boxes sort before horizontal under boxes_flow=None

    def test_default_off_no_vertical_boxes(self):
        """Without the flag (the reference's own default) rotated
        glyphs never form vertical lines — no behavior change for
        every existing golden document."""
        from py_pdf_parser_spark.sources.minipdf.layout import (
            TextBoxVertical,
        )

        boxes = _boxes(_rotated_text_pdf())
        assert not any(isinstance(bx, TextBoxVertical) for bx in boxes)
        joined = "".join(bx.get_text() for bx in boxes)
        for ch in "VERTTEXTHORIZ":
            assert ch in joined

    def test_loader_la_params_plumbing(self):
        """detect_vertical flows through the byte-stream loader's
        la_params dict (compat load surface)."""
        from py_pdf_parser_spark.compat.loaders import load
        import io

        doc = load(
            io.BytesIO(_rotated_text_pdf()),
            la_params={"detect_vertical": True},
        )
        texts = [e.text() for e in doc.elements]
        assert "VERT\nTEXT" in texts
        assert "HORIZ" in texts
