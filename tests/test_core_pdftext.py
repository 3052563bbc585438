"""PDF text extraction (stdlib-only scanner, core/pdftext.py)."""

import zlib

import pyarrow as pa

from textalyzer_ray.core.pdftext import extract_pdf_text, extract_text_from_content


def make_pdf(content: bytes, compress: bool = False) -> bytes:
    body = zlib.compress(content) if compress else content
    filt = b"/Filter /FlateDecode " if compress else b""
    return (
        b"%PDF-1.4\n1 0 obj\n<< " + filt + b"/Length "
        + str(len(body)).encode()
        + b" >>\nstream\n" + body + b"\nendstream\nendobj\n%%EOF\n"
    )


CONTENT = (
    b"BT /F1 12 Tf 72 720 Td (Hello World) Tj T* "
    b"[(Se)-20(cond)] TJ 0 -14 Td (line three \\(nested\\)) Tj ET"
)


class TestContentStream:
    def test_operators_and_lines(self):
        assert extract_text_from_content(CONTENT) == (
            "Hello World\nSecond\nline three (nested)"
        )

    def test_escapes(self):
        c = b"BT (tab\\there \\051close\\051 back\\\\slash) Tj ET"
        assert extract_text_from_content(c) == "tab\there )close) back\\slash"

    def test_quote_operators_break_lines(self):
        c = b"BT (a) Tj (b) ' (c) \" ET"
        assert extract_text_from_content(c) == "a\nb\nc"

    def test_text_outside_bt_et_ignored(self):
        c = b"(not shown) Tj BT (shown) Tj ET"
        assert extract_text_from_content(c) == "shown"

    def test_hex_strings_skipped(self):
        c = b"BT <48656C6C6F> Tj (real) Tj ET"
        assert extract_text_from_content(c) == "real"


class TestWholePdf:
    def test_uncompressed(self):
        assert "Hello World" in extract_pdf_text(make_pdf(CONTENT))

    def test_flate_compressed(self):
        out = extract_pdf_text(make_pdf(CONTENT, compress=True))
        assert out == "Hello World\nSecond\nline three (nested)"

    def test_multiple_streams_in_order(self):
        pdf = (
            b"%PDF-1.4\n"
            + make_pdf(b"BT (page one) Tj ET")[9:]
            + make_pdf(b"BT (page two) Tj ET", compress=True)[9:]
        )
        assert extract_pdf_text(pdf) == "page one\npage two"

    def test_non_pdf_and_binary_streams(self):
        assert extract_pdf_text(b"<html>nope</html>") == ""
        pdf = (
            b"%PDF-1.4\n<< /Filter /DCTDecode >>\nstream\n\xff\xd8jpeg"
            b"\nendstream\n" + make_pdf(b"BT (text) Tj ET")[9:]
        )
        assert extract_pdf_text(pdf) == "text"


class TestStage:
    def test_pdf_extractor_stage(self, quiet_data_context):
        import ray.data as rd

        from textalyzer_ray.stages.extract import PdfExtractor

        t = pa.table(
            {
                "doc_id": [1, 2, 3],
                "pdf": pa.array(
                    [make_pdf(CONTENT, compress=True), b"GIF89a", b"%PDF-1.4\nempty"],
                    pa.binary(),
                ),
            }
        )
        rows = (
            rd.from_arrow(t)
            .map_batches(PdfExtractor, batch_format="pyarrow", concurrency=1)
            .take_all()
        )
        by = {r["doc_id"]: r for r in rows}
        assert by[1]["ok"] and by[1]["text"].startswith("Hello World")
        assert not by[2]["ok"] and by[2]["drop_reason"] == "not_pdf"
        assert not by[3]["ok"] and by[3]["drop_reason"] == "empty"
