"""S3 text layer / F12 PDF text ops — stdlib render/extract pair
(reference create_pdf @ webapp/input_processing/routes.py:73-130,
get_pymupdf_text_wordwise @ webapp/report_redaction/utils.py:383-411)."""

from __future__ import annotations

import zlib

from hypothesis import given, settings
from hypothesis import strategies as st

from llmaix_spark.sources.pdf import (
    _content_text,
    _wrap_keep_spaces,
    extract_pdf_text,
    render_simple_pdf,
)

# --- content-stream tokenizer ------------------------------------------------


def test_tj_and_TJ_show_ops():
    assert _content_text(b"BT (Hello) Tj ET", False) == "Hello"
    # TJ: strings shown, kerning numbers skipped
    assert _content_text(b"BT [(Wor) -20 (ld)] TJ ET", False) == "World"


def test_quote_show_ops():
    assert _content_text(b"BT (y) ' ET", False) == "y"
    # ": word-spacing + char-spacing operands precede the string
    assert _content_text(b'BT 2 1.5 (x) " ET', False) == "x"


def test_escapes_and_octal():
    assert (
        _content_text(rb"BT (a\(b\)c\\d\101\n) Tj ET", False) == "a(b)c\\dA\n"
    )


def test_hex_string_and_odd_padding():
    assert _content_text(b"BT <48 69> Tj ET", False) == "Hi"
    # odd digit count zero-padded per spec: <4> = 0x40 = '@'
    assert _content_text(b"BT <4> Tj ET", False) == "@"


def test_non_show_operator_consumes_operands():
    # a string operand consumed by Tm must not leak into the next Tj
    got = _content_text(b"BT (dropped) 1 0 0 1 5 5 Tm (shown) Tj ET", False)
    assert got == "shown"


def test_add_spaces_one_per_span():
    # reference add_spaces appends one space per shown span (utils.py:402)
    assert _content_text(b"BT (a) Tj (b) Tj ET", True) == "a b "


def test_comment_and_dict_skipped():
    got = _content_text(b"BT % (not shown)\n(real) Tj << /K (v) >> ET", False)
    assert got == "real"


# --- wrap + roundtrip ---------------------------------------------------------


@given(st.text(alphabet="ab ", max_size=300), st.integers(5, 40))
@settings(max_examples=100, deadline=None)
def test_wrap_concatenation_is_identity(text, width):
    assert "".join(_wrap_keep_spaces(text, width)) == text


@given(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=255),
        max_size=400,
    ),
    st.booleans(),
)
@settings(max_examples=100, deadline=None)
def test_render_extract_roundtrip(text, compress):
    assert extract_pdf_text(render_simple_pdf(text, compress=compress)) == text


def test_flate_stream_actually_compressed():
    pdf = render_simple_pdf("hello world " * 50, compress=True)
    assert b"/FlateDecode" in pdf
    assert b"hello world" not in pdf  # body really is compressed
    assert extract_pdf_text(pdf) == "hello world " * 50


def test_no_text_layer_and_garbage_inputs():
    assert extract_pdf_text(b"%PDF-1.4\nno streams here\n%%EOF") == ""
    assert extract_pdf_text(b"not a pdf") == ""
    assert extract_pdf_text(b"") == ""
    # corrupt flate stream is skipped, not fatal
    bad = (
        b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode /Length 4 >>\n"
        b"stream\nXXXX\nendstream\nendobj\n%%EOF"
    )
    assert extract_pdf_text(bad) == ""


def test_stream_without_text_machinery_ignored():
    # a pure drawing/metadata stream (no BT and no show operator)
    # contributes nothing — only streams with text machinery are lexed
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Length 26 >>\nstream\n"
        b"q 0 0 0 rg 1 2 3 4 re f Q\nendstream\nendobj\n%%EOF"
    )
    assert extract_pdf_text(pdf) == ""


def test_handcrafted_foreign_pdf():
    """A PDF this module did NOT write: different object order, raw
    (uncompressed) stream, TJ arrays and ' ops mixed."""
    body = b"BT /F1 9 Tf [(fir) 3 (st)] TJ ( line) Tj (second) ' ET"
    pdf = (
        b"%PDF-1.4\n"
        b"5 0 obj\n<< /Length " + str(len(body)).encode() + b" >>\n"
        b"stream\n" + body + b"\nendstream\nendobj\n"
        b"trailer\n<< /Root 1 0 R >>\n%%EOF"
    )
    assert extract_pdf_text(pdf) == "first linesecond"
    assert extract_pdf_text(pdf, add_spaces=True) == "first  line second "


# --- redaction overlay (anonymize_pdf twin) ----------------------------------


def _content_body(pdf: bytes) -> str:
    m = pdf.find(b"stream\n")
    e = pdf.find(b"endstream", m)
    return zlib.decompressobj().decompress(pdf[m + 7:e]).decode("latin-1")


def test_redact_pdf_masks_and_draws_boxes():
    from llmaix_spark.functions.masking import generate_dollartext
    from llmaix_spark.sources.pdf import find_term_spans, redact_pdf

    t = "patient jane doe of munich, seen by doe weekly"
    r = redact_pdf(render_simple_pdf(t), ["doe", "munich"])
    got = extract_pdf_text(r)
    assert got == generate_dollartext(
        t, find_term_spans(t, ["doe", "munich"]), "$"
    )
    assert "doe" not in got and "munich" not in got
    # one black rect per masked run: doe ×2 + munich ×1
    assert _content_body(r).count("re f") == 3


def test_redact_pdf_run_split_across_wrap():
    from llmaix_spark.sources.pdf import redact_pdf

    # no spaces → hard cut at 80 splits the term across two lines
    t = "a" * 75 + "secretword" + "b" * 20
    r = redact_pdf(render_simple_pdf(t), ["secretword"])
    assert extract_pdf_text(r) == "a" * 75 + "$" * 10 + "b" * 20
    assert _content_body(r).count("re f") == 2  # one box per line fragment


def test_redact_pdf_no_match_keeps_text():
    from llmaix_spark.sources.pdf import redact_pdf

    t = "nothing sensitive here"
    r = redact_pdf(render_simple_pdf(t), ["absent", ""])
    assert extract_pdf_text(r) == t
    assert "re f" not in _content_body(r)


def test_redact_pdf_literal_dollar_not_boxed():
    """A '$' already in the source text is not a masked run (flags are
    span-driven, not character-driven)."""
    from llmaix_spark.sources.pdf import redact_pdf

    r = redact_pdf(render_simple_pdf("price $5 secret"), ["secret"])
    assert extract_pdf_text(r) == "price $5 $$$$$$"
    assert _content_body(r).count("re f") == 1


def test_find_term_spans_non_overlapping_greedy():
    from llmaix_spark.sources.pdf import find_term_spans

    assert find_term_spans("aaaa", ["aa"]) == [(0, 2), (2, 4)]
    assert find_term_spans("xy", ["x", "y"]) == [(0, 1), (1, 2)]


# --- parser robustness (regressions from review) ------------------------------


def test_multi_stream_pdf_no_phantom_duplication():
    """`stream` must not match the tail of `endstream`: a phantom span
    there re-contains the NEXT stream and duplicates its text."""
    s1, s2 = b"BT (alpha) Tj ET", b"BT (beta) Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Length 16 >>\nstream\n" + s1 + b"\nendstream\nendobj\n"
        b"2 0 obj\n<< /Length 15 >>\nstream\n" + s2 + b"\nendstream\nendobj\n"
        b"%%EOF"
    )
    assert extract_pdf_text(pdf) == "alphabeta"


def test_flate_flag_bounded_by_owning_object():
    """An uncompressed stream must not inherit /FlateDecode from a
    NEIGHBORING object's dict (the lookback is bounded by `obj`)."""
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Filter /FlateDecode /Length 4 >>\nstream\n"
        + zlib.compress(b"BT (zipped) Tj ET")
        + b"\nendstream\nendobj\n"
        b"2 0 obj\n<< /Length 14 >>\nstream\nBT (raw) Tj ET\nendstream\n"
        b"endobj\n%%EOF"
    )
    assert extract_pdf_text(pdf) == "zippedraw"


def test_strip_text_objects_literal_aware():
    """'ET' inside a string literal must not terminate the BT..ET span —
    the regex version leaked the rest of the text object as 'drawing
    ops' (PHI leak through the scan-simulation loop)."""
    from llmaix_spark.sources.pdf import (
        add_text_layer_to_pdf,
        remove_selectable_text_from_pdf,
    )

    t = "report ETA 5pm patient jane doe end"
    scanned = remove_selectable_text_from_pdf(render_simple_pdf(t))
    assert extract_pdf_text(scanned) == ""
    layered = add_text_layer_to_pdf(scanned, "ocr text")
    assert extract_pdf_text(layered) == "ocr text"
    assert "jane doe" not in _content_body(scanned)


def test_continuation_stream_without_bt_still_extracted():
    """A /Contents array may split one text object across streams; the
    BT-less continuation still carries show ops and must not be gated
    away."""
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Length 10 >>\nstream\nBT (first) Tj\nendstream\nendobj\n"
        b"2 0 obj\n<< /Length 17 >>\nstream\n(second) Tj ET\nendstream\nendobj\n"
        b"%%EOF"
    )
    assert extract_pdf_text(pdf) == "firstsecond"


def test_inline_image_binary_skipped():
    """ID..EI binary (which may contain '(' or fake operators) must not
    be tokenized into text."""
    body = b"BT (before) Tj ET BI /W 2 /H 1 ID \x28\x00\xff(junk) Tj EI BT (after) Tj ET"
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Length "
        + str(len(body)).encode()
        + b" >>\nstream\n" + body + b"\nendstream\nendobj\n%%EOF"
    )
    assert extract_pdf_text(pdf) == "beforeafter"


def test_wrap_width_guard_and_bound():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        _wrap_keep_spaces("abc", 0)
    # a space exactly at index `width` must not produce a width+1 line
    lines = _wrap_keep_spaces("a" * 80 + " " + "b" * 10, 80)
    assert all(len(ln) <= 80 for ln in lines)
    assert "".join(lines) == "a" * 80 + " " + "b" * 10


def test_non_latin1_renders_as_replacement_not_crash():
    # documented boundary: out-of-repertoire chars become '?'
    assert extract_pdf_text(render_simple_pdf("prix 100 € fin")) == "prix 100 ? fin"


# --- text-layer surgery (scan simulation + OCR layer) -------------------------


def test_remove_selectable_text():
    from llmaix_spark.sources.pdf import remove_selectable_text_from_pdf

    p = render_simple_pdf("very selectable text")
    scanned = remove_selectable_text_from_pdf(p)
    assert extract_pdf_text(scanned) == ""


def test_remove_text_keeps_drawing_ops():
    """Stripping the text layer must not strip redaction rects."""
    from llmaix_spark.sources.pdf import (
        redact_pdf,
        remove_selectable_text_from_pdf,
    )

    r = redact_pdf(render_simple_pdf("the secret word"), ["secret"])
    scanned = remove_selectable_text_from_pdf(r)
    assert extract_pdf_text(scanned) == ""
    assert _content_body(scanned).count("re f") == 1


def test_add_invisible_text_layer():
    """scan → OCR → invisible text layer: extraction then works exactly
    like a born-digital PDF (reference add_text_layer_to_pdf)."""
    from llmaix_spark.sources.pdf import (
        add_text_layer_to_pdf,
        remove_selectable_text_from_pdf,
    )

    scanned = remove_selectable_text_from_pdf(render_simple_pdf("original"))
    ocr_text = "ocr recovered this text"
    layered = add_text_layer_to_pdf(scanned, ocr_text)
    assert extract_pdf_text(layered) == ocr_text
    assert "3 Tr" in _content_body(layered)  # glyphs invisible


# --- distributed reader ---------------------------------------------------------


def test_read_reports_pdf(spark, tmp_path):
    from llmaix_spark.sources.pdf import read_reports_pdf

    (tmp_path / "a.pdf").write_bytes(render_simple_pdf("alpha report"))
    (tmp_path / "b.pdf").write_bytes(
        render_simple_pdf("beta report", compress=False)
    )
    (tmp_path / "scan.pdf").write_bytes(b"%PDF-1.4\n%%EOF")  # no text layer
    (tmp_path / "note.txt").write_bytes(b"ignored by glob")
    df = read_reports_pdf(spark, str(tmp_path))
    rows = {r["report"]: r for r in df.collect()}
    assert set(rows) == {"alpha report", "beta report", ""}
    # empty-text rows kept for the OCR-fallback route; ids present on all
    assert all(r["id"] for r in rows.values())
    assert '"source":"pdf"' in rows["alpha report"]["metadata"]
