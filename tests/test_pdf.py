"""PDF extractor tests over the real bank filings shipped with the reference."""

import os

import pytest

from ragfin_tpu.data.pdf_extractor import (
    Font,
    detect_report_type,
    extract_report,
    extract_stream_text,
    extract_text,
    glyph_to_unicode,
    parse_differences,
    parse_line_items,
    parse_tounicode,
)

PDF_DIR = "/root/reference/FinRag_Parameter_Extractor"


def _pdf(rel):
    path = os.path.join(PDF_DIR, rel)
    if not os.path.exists(path):
        pytest.skip("reference PDFs not mounted")
    return path


class TestGlyphDecoding:
    def test_glyph_names(self):
        assert glyph_to_unicode("five") == "5"
        assert glyph_to_unicode("five.tab") == "5"
        assert glyph_to_unicode("uni00A0") == "\xa0"
        assert glyph_to_unicode("f_f") == "ff"
        assert glyph_to_unicode("unknownglyph") == ""

    def test_parse_differences(self):
        head = b"<</Type/Encoding/Differences[19 /minus /five.tab /zero.tab]>>"
        d = parse_differences(head)
        assert d == {19: "-", 20: "5", 21: "0"}

    def test_parse_tounicode(self):
        cmap = (
            b"beginbfchar\n<0041> <0058>\nendbfchar\n"
            b"beginbfrange\n<0030> <0032> <0061>\nendbfrange\n"
        )
        m = parse_tounicode(cmap)
        assert m[0x41] == "X"
        assert m[0x30] == "a" and m[0x32] == "c"


class TestContentStream:
    def test_literal_strings_and_lines(self):
        content = b"BT /F1 10 Tf (Hello) Tj 0 -12 Td (World 1,234) Tj ET"
        out = extract_stream_text(content, {})
        assert out == "Hello\nWorld 1,234"

    def test_tj_array_with_kerning(self):
        content = b"BT [(Net )-250(Profit)] TJ ET"
        assert extract_stream_text(content, {}) == "Net Profit"

    def test_hex_string_with_cmap(self):
        font = Font(two_byte=True, cmap={0x0041: "N", 0x0042: "P"})
        content = b"BT /F2 8 Tf <00410042> Tj ET"
        assert extract_stream_text(content, {b"F2": font}) == "NP"

    def test_escapes(self):
        content = rb"BT (a\(b\)c\\d\151) Tj ET"
        assert extract_stream_text(content, {}) == "a(b)c\\di"


@pytest.mark.parametrize(
    "rel,needle",
    [
        ("bank_reports/Kotak_Consolidated-Financial-Statements_FY23.pdf", "562.55"),
        ("single_reports/sbi_consolidated24.pdf", "Revaluation Reserve"),
    ],
)
def test_real_pdf_text(rel, needle):
    text = extract_text(_pdf(rel))
    assert len(text) > 50_000
    assert needle in text


def test_sbi_digit_recovery_via_differences():
    """SBI digits are subset-encoded; /Differences decoding must recover them."""
    text = extract_text(_pdf("single_reports/sbi_consolidated24.pdf"))
    assert "13358,15,24" in text


class TestReportSchema:
    def test_extract_report_shape(self):
        rep = extract_report(_pdf("single_reports/sbi_consolidated24.pdf"))
        assert rep["reportType"] == "CONSOLIDATED FINANCIAL RESULTS"
        assert rep["company"].startswith("SBI")
        assert rep["char_count"] > 50_000
        assert len(rep["lineItems"]) > 50

    def test_report_type_keying(self):
        assert detect_report_type("x_consolidated.pdf").startswith("CONSOLIDATED")
        assert detect_report_type("x_standalone.pdf").startswith("STANDALONE")

    def test_line_item_parsing(self):
        items = parse_line_items("Interest earned 12,345.67 11,000.00\nTotal: (1,234)\nnoise line")
        labels = {i["label"]: i["values"] for i in items}
        assert labels["Interest earned"] == [12345.67, 11000.0]
        assert labels["Total"] == [-1234.0]
