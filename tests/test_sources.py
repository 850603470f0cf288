"""Byte-stream loader: kernel Doc construction from (fake) pdfminer
pages, blank-page skip, all_texts figures, password forwarding, and the
Spark mapInArrow plumbing against ELEMENTS_SCHEMA."""

import pytest

pyspark = pytest.importorskip("pyspark")

from py_pdf_parser_spark.sources import (  # noqa: E402
    doc_from_pdf_bytes,
    parse_pdf_bytes,
)


class FakeChar:
    def __init__(self, fontname, height):
        self.fontname = fontname
        self.height = height


class FakeLine(list):
    pass


class FakeBox:
    def __init__(self, x0, x1, y0, y1, text, font="fa", size=10.0):
        self.x0, self.x1, self.y0, self.y1 = x0, x1, y0, y1
        self._text = text
        self._line = FakeLine(FakeChar(font, size) for _ in text)

    def get_text(self):
        return self._text

    def __iter__(self):
        return iter([self._line])


class FakeFigure(list):
    """Iterable container without get_text — like LTFigure."""

    x0 = 0.0


class FakePage:
    def __init__(self, pageid, elements, width=100, height=100):
        self.pageid = pageid
        self.width = width
        self.height = height
        self._elements = elements

    def __iter__(self):
        return iter(self._elements)


def fake_extract_pages(data, password, la):
    """Deterministic stand-in for pdfminer.high_level.extract_pages.

    ``data`` encodes the wanted password as bytes; raises like
    pdfminer's PDFPasswordIncorrect on mismatch."""
    want = data.decode()
    if want and (password or "") != want:
        raise ValueError("password incorrect")
    pages = [
        FakePage(
            1,
            [
                FakeBox(10, 30, 80, 90, "top left"),
                FakeBox(60, 90, 80, 90, "top right", font="fb"),
                FakeBox(10, 30, 20, 30, "bottom"),
            ],
        ),
        FakePage(2, []),  # blank page -> skipped
        FakePage(
            3,
            [
                FakeBox(10, 30, 50, 60, "page three"),
                FakeFigure([FakeBox(50, 70, 50, 60, "in figure")]),
            ],
        ),
    ]
    return iter(pages)


class TestDocFromPdfBytes:
    def test_ordering_and_pages(self):
        doc = doc_from_pdf_bytes(
            "d", b"", extract_pages=fake_extract_pages
        )
        # default L2R_T2B: top-left, top-right, bottom; blank page 2
        # skipped; figure text excluded without all_texts.
        assert list(doc.text_stripped) == [
            "top left", "top right", "bottom", "page three",
        ]
        assert list(doc.page) == [1, 1, 1, 3]

    def test_all_texts_includes_figure_text(self):
        doc = doc_from_pdf_bytes(
            "d",
            b"",
            la_params={"all_texts": True},
            extract_pages=fake_extract_pages,
        )
        assert "in figure" in list(doc.text_stripped)

    def test_font_mode_from_char_payload(self):
        doc = doc_from_pdf_bytes(
            "d", b"", extract_pages=fake_extract_pages
        )
        assert list(doc.font_name)[:2] == ["fa", "fb"]
        assert list(doc.font)[:1] == ["fa,10.0"]

    def test_password_forwarded(self):
        doc = doc_from_pdf_bytes(
            "d", b"s3cret", password="s3cret",
            extract_pages=fake_extract_pages,
        )
        assert doc.n == 4
        with pytest.raises(ValueError):
            doc_from_pdf_bytes(
                "d", b"s3cret", password="wrong",
                extract_pages=fake_extract_pages,
            )

    def test_builtin_minipdf_extractor_parses_real_bytes(self):
        # No injected extractor: the builtin falls back to the
        # from-scratch minipdf parser (sources/minipdf) when pdfminer
        # is absent, so REAL PDF bytes parse out of the box.
        data = open(
            "/root/reference/docs/source/example_files/simple_memo.pdf",
            "rb",
        ).read()
        doc = doc_from_pdf_bytes("memo", data)
        texts = [doc.text_of(i) for i in range(doc.n)]
        assert "Memorandum" in texts
        assert "All Developers" in texts

    def test_builtin_extractor_rejects_truncated_bytes(self):
        with pytest.raises(Exception) as err:
            doc_from_pdf_bytes("d", b"%PDF-1.4")
        assert not isinstance(err.value, NotImplementedError)


class TestSparkPlumbing:
    @pytest.fixture(scope="class")
    def spark(self):
        from py_pdf_parser_spark.session import get_spark

        return get_spark(cores=4)

    def test_parse_pdf_bytes_elements(self, spark):
        df = spark.createDataFrame(
            [("a", bytearray(b"")), ("b", bytearray(b""))],
            "doc_id string, pdf_bytes binary",
        )
        out = parse_pdf_bytes(df, extract_pages=fake_extract_pages)
        rows = out.orderBy("doc_id", "idx").collect()
        assert len(rows) == 8  # 4 elements x 2 docs
        r0 = rows[0]
        assert (r0.doc_id, r0.idx, r0.text, r0.page_number) == (
            "a", 0, "top left", 1,
        )
        assert r0.font == "fa,10.0"
        # Same schema as the spans parse path: downstream ops unchanged.
        from py_pdf_parser_spark.schema import ELEMENTS_SCHEMA

        assert out.schema == ELEMENTS_SCHEMA

    def test_password_column(self, spark):
        df = spark.createDataFrame(
            [("a", bytearray(b"pw"), "pw")],
            "doc_id string, pdf_bytes binary, password string",
        )
        out = parse_pdf_bytes(
            df, password_col="password", extract_pages=fake_extract_pages
        )
        assert out.count() == 4

    def test_per_doc_error_isolation(self, spark):
        """One corrupt/wrong-password doc must not fail the job: it is
        dropped from elements and surfaced via pdf_parse_status."""
        from py_pdf_parser_spark.sources.pdf_bytes import pdf_parse_status

        df = spark.createDataFrame(
            [
                ("good", bytearray(b"")),
                ("locked", bytearray(b"s3cret")),  # fake raises: no pw
            ],
            "doc_id string, pdf_bytes binary",
        )
        out = parse_pdf_bytes(df, extract_pages=fake_extract_pages)
        assert sorted(
            set(r.doc_id for r in out.select("doc_id").collect())
        ) == ["good"]

        status = {
            r.doc_id: r
            for r in pdf_parse_status(
                df, extract_pages=fake_extract_pages
            ).collect()
        }
        assert status["good"].status == "ok"
        assert status["good"].n_elements == 4
        assert status["good"].error is None
        assert status["locked"].status == "error"
        assert status["locked"].n_elements == 0
        assert "password incorrect" in status["locked"].error

    def test_injected_fake_wins_even_if_pdfminer_importable(self):
        """_make_is_textbox: with an injected extractor the duck-typed
        predicate is used — never isinstance(LTTextBox), which would
        silently drop every fake element (r3 ADVICE)."""
        from py_pdf_parser_spark.sources.pdf_bytes import _make_is_textbox

        pred = _make_is_textbox(real_pdfminer=False)
        assert pred(FakeBox(0, 1, 0, 1, "x"))
        assert not pred(FakeFigure())
