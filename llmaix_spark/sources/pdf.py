"""PDF text connector (S3 text layer / F12 PDF text ops) — stdlib only.

The reference round-trips text through PDFs with PyMuPDF:

  create_pdf                  text → line-wrapped one-column PDF
                              (webapp/input_processing/routes.py:73-130)
  get_pymupdf_text_wordwise   PDF → span texts concatenated WITHOUT
                              separators (add_spaces appends one space per
                              span) (webapp/report_redaction/utils.py:383-411)

This module is the dependency-free twin: `render_simple_pdf` writes a
valid single-font PDF (Flate-compressed content stream, correct xref),
`extract_pdf_text` decodes Flate streams with zlib and tokenizes the
content stream — string literals with the full escape table, hex strings,
`Tj`/`TJ`/`'`/`"` show operators — concatenating shown text in stream
order exactly like the reference's span walk. `render_simple_pdf` wraps
*after* the break space (the space stays on the line), so
extract(render(text)) == text for any Latin-1-encodable text: the pair
is value-checkable end to end (driver query `pdf_roundtrip`).

Honest boundary: simple Type1 fonts carry single-byte Latin-1/WinAnsi
codes, so text OUTSIDE that repertoire (€, CJK, emoji) is rendered as
'?' (a real Unicode PDF writer needs CID fonts + ToUnicode CMaps, out of
scope) — and font-subset PDFs with custom CMaps likewise need a real PDF
library to extract. Scanned PDFs have no text layer and extract to "" —
the reference routes those to OCR (input_processing/routes.py:398-495);
the OCR codec stays stubbed in operators/multimodal.py.

`read_reports_pdf` is the distributed ingest: binaryFile source (PDFs are
not splittable) → Arrow-batched mapInPandas, one file per row, decoded
executor-side — the same scale shape as the docx/zip/xlsx readers.
"""

from __future__ import annotations

import re
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_WS = b"\x00\t\n\x0c\r "
_NUMERIC = re.compile(rb"[+-]?(\d+\.?\d*|\.\d+)")
_ESCAPES = {
    ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
    ord("b"): b"\b", ord("f"): b"\f",
    ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
}


def _parse_literal(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse a `(...)` string literal starting at data[i] == '(' —
    balanced parens, backslash escapes incl. up-to-3-digit octal and
    line continuations. Returns (decoded bytes, index past ')')."""
    out = bytearray()
    depth, i, n = 1, i + 1, len(data)
    while i < n and depth:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in _ESCAPES:
                out += _ESCAPES[e]
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                oct_digits = bytearray()
                while i < n and len(oct_digits) < 3 and 0x30 <= data[i] <= 0x37:
                    oct_digits.append(data[i])
                    i += 1
                out.append(int(oct_digits, 8) & 0xFF)
            elif e in (0x0A, 0x0D):  # \<EOL> line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:  # unknown escape: backslash dropped, char kept
                out.append(e)
                i += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth:
                out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out), i


def _parse_hex(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse a `<...>` hex string starting at data[i] == '<'. Odd digit
    counts are zero-padded per spec."""
    j = data.find(b">", i)
    if j < 0:
        j = len(data)
    hx = bytes(c for c in data[i + 1:j] if c in b"0123456789abcdefABCDEF")
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii")), j + 1


def _content_text(content: bytes, add_spaces: bool) -> str:
    """Concatenate the text shown by a content stream's Tj/TJ/'/" ops in
    stream order (the reference's span walk, utils.py:393-406: spans join
    with no separator; add_spaces appends one space per span)."""
    pieces: list[str] = []
    pend: list[bytes] = []

    def show() -> None:
        if pend:
            pieces.append(b"".join(pend).decode("latin-1"))
            if add_spaces:
                pieces.append(" ")
        pend.clear()

    for kind, val, _a, _b in _lex(content):
        if kind == "str":
            pend.append(val)
        elif val in (b"Tj", b"TJ", b"'", b'"'):
            show()
        elif _NUMERIC.fullmatch(val):
            pass  # numeric operand (e.g. TJ kerning, " word spacing)
        else:
            pend.clear()  # any other operator consumes its operands
    return "".join(pieces)


_EI_RE = re.compile(rb"[\x00\t\n\x0c\r ]EI(?=[\x00\t\n\x0c\r ]|$)")


def _lex(data: bytes):
    """Content-stream lexer: yields ('str', decoded_bytes, pos, pos) for
    string/hex literals and ('tok', token, start, end) for bare tokens —
    aware of literals, dicts, comments, and inline images (the binary
    data between an ID operator and its whitespace-delimited EI is
    skipped, never tokenized: it can contain '(' or fake operators)."""
    i, n = 0, len(data)
    tok = bytearray()
    tok_start = 0
    while i < n:
        c = data[i]
        if c in _WS or c in b"()<>[]{}/%":
            if tok:
                t = bytes(tok)
                tok.clear()
                if t == b"ID":  # inline image: jump past the binary blob
                    m = _EI_RE.search(data, i)
                    i = m.end() if m else n
                    continue
                yield ("tok", t, tok_start, i)
            if c == 0x28:  # (
                s, i = _parse_literal(data, i)
                yield ("str", s, i, i)
            elif c == 0x3C and i + 1 < n and data[i + 1] == 0x3C:  # <<
                i += 2
            elif c == 0x3C:  # <hex>
                s, i = _parse_hex(data, i)
                yield ("str", s, i, i)
            elif c == 0x25:  # % comment to end of line
                while i < n and data[i] not in (0x0A, 0x0D):
                    i += 1
            else:
                i += 1
        else:
            if not tok:
                tok_start = i
            tok.append(c)
            i += 1
    if tok:
        yield ("tok", bytes(tok), tok_start, n)


# `stream` must not match the tail of `endstream` — that phantom span
# would re-contain the NEXT object's stream and extract its text twice
_STREAM_RE = re.compile(rb"(?<!end)stream\r?\n")


def _iter_streams(payload: bytes):
    """Yield decoded stream bodies: `stream ... endstream` spans, zlib-
    inflated when the OWNING object's dict (bounded by the nearest
    preceding `obj` keyword, not a fixed lookback) says /FlateDecode.
    A stream whose declared Flate data does not inflate is skipped —
    corrupt, never fatal (same policy as the zip/docx readers)."""
    for m in _STREAM_RE.finditer(payload):
        start = m.end()
        end = payload.find(b"endstream", start)
        if end < 0:
            continue
        raw = payload[start:end]
        dict_from = payload.rfind(b"obj", 0, m.start())
        head = payload[max(dict_from, 0):m.start()]
        if b"/FlateDecode" in head:
            try:
                # decompressobj tolerates the EOL padding before endstream
                yield zlib.decompressobj().decompress(raw)
            except zlib.error:
                continue
        else:
            yield raw


def extract_pdf_text(payload: bytes, add_spaces: bool = False) -> str:
    """PDF bytes → concatenated shown text (reference
    get_pymupdf_text_wordwise, webapp/report_redaction/utils.py:383-411).
    Streams with no text machinery at all (no BT and no show operator —
    e.g. image data) are skipped; the BT-less gate stays loose because a
    /Contents array may legally split one text object across streams.
    A PDF with no text layer returns "" (the reference's cue to fall back
    to OCR)."""
    return "".join(
        _content_text(s, add_spaces)
        for s in _iter_streams(payload or b"")
        if b"BT" in s or b"Tj" in s or b"TJ" in s
    )


def _escape_pdf_text(line: str) -> str:
    return (
        line.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    )


def _wrap_keep_spaces(text: str, width: int) -> list[str]:
    """Greedy wrap that breaks AFTER a space (the space stays at the end
    of the line), so ''.join(lines) == text — the property the roundtrip
    oracle relies on. Runs longer than `width` with no space hard-cut;
    every emitted line is ≤ width chars."""
    if width < 1:
        raise ValueError(f"wrap width must be >= 1, got {width}")
    out = []
    while len(text) > width:
        cut = text.rfind(" ", 1, width)  # space at index <= width-1
        cut = cut + 1 if cut > 0 else width
        out.append(text[:cut])
        text = text[cut:]
    out.append(text)
    return out


# fixed layout of render_simple_pdf: Courier (monospace — every glyph is
# 0.6 em, so char positions are computable without font tables), 10 pt,
# left margin 56, first baseline 780, leading 12
FONT_SIZE = 10
CHAR_W = 0.6 * FONT_SIZE
MARGIN_X = 56.0
FIRST_BASELINE = 780.0
LEADING = 12.0


def _build_pdf(body: str, compress: bool) -> bytes:
    """Wrap a content-stream body into a valid single-page PDF (objects,
    Flate filter, xref, trailer)."""
    content = body.encode("latin-1", "replace")
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b"/Filter /FlateDecode "
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>",
        b"<< " + filt + b"/Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for idx, obj in enumerate(objs, 1):
        offsets.append(len(out))
        out += f"{idx} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode() + b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF"
    ).encode()
    return bytes(out)


def _text_body(lines: list[str], invisible: bool = False) -> str:
    mode = "3 Tr " if invisible else ""  # render mode 3 = neither fill nor stroke
    return (
        f"BT /F1 {FONT_SIZE} Tf {mode}{MARGIN_X:g} {FIRST_BASELINE:g} Td "
        f"{LEADING:g} TL\n"
        + "\n".join(f"({_escape_pdf_text(ln)}) Tj T*" for ln in lines)
        + "\nET"
    )


def render_simple_pdf(
    text: str, width: int = 80, compress: bool = True
) -> bytes:
    """text → a valid single-page, single-font PDF (reference create_pdf,
    webapp/input_processing/routes.py:73-130 — margins/font fixed, text
    line-wrapped; one long page here instead of pagination since the
    extraction contract is stream-order text, not layout)."""
    return _build_pdf(_text_body(_wrap_keep_spaces(text or "", width)), compress)


def find_term_spans(text: str, terms: list[str]) -> list[tuple[int, int]]:
    """All exact occurrences of each term as [begin, end) spans — the
    reference's per-term page.search_for loop
    (webapp/llm_processing/utils.py:112-118), non-overlapping per term,
    left to right."""
    spans: list[tuple[int, int]] = []
    for term in terms or []:
        if not term:
            continue
        start = 0
        while True:
            i = text.find(term, start)
            if i < 0:
                break
            spans.append((i, i + len(term)))
            start = i + len(term)
    return spans


def redact_pdf(
    payload: bytes,
    terms: list[str],
    replacement_char: str = "$",
    width: int = 80,
    compress: bool = True,
) -> bytes:
    """anonymize_pdf twin (reference webapp/llm_processing/utils.py:76-146:
    search each term's instances, cover with black rectangles, REMOVE the
    underlying text). Here the text is removed by length-preserving
    dollartext masking (generate_dollartext, the F3/F5 kernel —
    report_redaction/utils.py:170-184) and the black boxes are filled
    rects computed from the renderer's fixed Courier metrics, one per
    masked run per line.

    Operates on PDFs this engine renders — the same closed loop as the
    reference, whose redaction path consumes its own create_pdf outputs.
    Contract (tested): extract_pdf_text(redact_pdf(p, terms)) ==
    generate_dollartext(extract_pdf_text(p), find_term_spans(...)).
    """
    from llmaix_spark.functions.masking import generate_dollartext

    text = extract_pdf_text(payload)
    spans = find_term_spans(text, terms)
    masked = generate_dollartext(text, spans, replacement_char)
    flags = [False] * len(text)
    for a, b in spans:
        for i in range(max(a, 0), min(b, len(text))):
            flags[i] = True
    lines = _wrap_keep_spaces(masked, width)
    rects: list[str] = []
    off = 0
    for li, line in enumerate(lines):
        baseline = FIRST_BASELINE - LEADING * li
        j = 0
        while j < len(line):
            if flags[off + j]:
                k = j
                while k < len(line) and flags[off + k]:
                    k += 1
                x = MARGIN_X + CHAR_W * j
                w = CHAR_W * (k - j)
                # cover ascent + descent around the baseline
                rects.append(
                    f"q 0 0 0 rg {x:g} {baseline - 2:g} {w:g} "
                    f"{FONT_SIZE:g} re f Q"
                )
                j = k
            else:
                j += 1
        off += len(line)
    body = _text_body(lines)
    if rects:
        body += "\n" + "\n".join(rects)
    return _build_pdf(body, compress)


def _strip_text_objects(data: bytes) -> bytes:
    """Remove BT..ET text objects from a content stream. Lexer-based, not
    a regex: 'ET' inside a string literal (e.g. '(report ETA 5pm)') must
    not terminate the span — a naive regex would leave the rest of the
    text object behind and leak supposedly-removed text. An unterminated
    BT (malformed stream) drops everything to the end — fail closed."""
    spans: list[tuple[int, int]] = []
    bt_start: int | None = None
    for kind, val, a, b in _lex(data):
        if kind != "tok":
            continue
        if val == b"BT" and bt_start is None:
            bt_start = a
        elif val == b"ET" and bt_start is not None:
            spans.append((bt_start, b))
            bt_start = None
    if bt_start is not None:
        spans.append((bt_start, len(data)))
    out = bytearray()
    prev = 0
    for a, b in spans:
        out += data[prev:a]
        prev = b
    out += data[prev:]
    return bytes(out)


def _drawing_ops(payload: bytes) -> list[str]:
    """Every decoded stream with its BT..ET text objects removed — the
    non-text (vector drawing) operators that must survive text-layer
    surgery (e.g. redaction rects)."""
    kept = []
    for s in _iter_streams(payload):
        ops = _strip_text_objects(s)
        if ops.strip():
            kept.append(ops.decode("latin-1").strip())
    return kept


def remove_selectable_text_from_pdf(
    payload: bytes, compress: bool = True
) -> bytes:
    """Strip the selectable text layer, keeping vector drawing ops —
    the reference uses this to produce 'scanned' PDFs that exercise the
    OCR path (remove_selectable_text_from_pdf,
    webapp/input_processing/routes.py:520-550). Same closed loop as
    redact_pdf: operates on PDFs this engine renders."""
    body = "\n".join(_drawing_ops(payload)) or "% empty page"
    return _build_pdf(body, compress)


def add_text_layer_to_pdf(
    payload: bytes, text: str, width: int = 80, compress: bool = True
) -> bytes:
    """Overlay an INVISIBLE text layer (render mode 3 — glyphs neither
    filled nor stroked, but selectable/extractable) onto a text-free PDF:
    the reference writes OCR output back this way so downstream stages
    can treat scanned and born-digital PDFs identically
    (add_text_layer_to_pdf, webapp/input_processing/routes.py:249-279).
    Existing drawing ops (the page image's stand-in here) are kept under
    the new layer. extract_pdf_text sees the layer like any other text."""
    parts = _drawing_ops(payload)
    parts.append(_text_body(_wrap_keep_spaces(text or "", width), invisible=True))
    return _build_pdf("\n".join(parts), compress)


def read_reports_pdf(spark: SparkSession, path: str) -> DataFrame:
    """S3 text layer at scale: a directory of PDFs → envelope
    (id, report, metadata), decoded executor-side via binaryFile +
    Arrow-batched mapInPandas (one whole file per row — PDFs are not
    splittable). PDFs with no text layer yield an EMPTY report row, kept
    so the skip-empty filter / OCR stage can route them (reference falls
    back to OCR exactly when the text layer is empty,
    webapp/input_processing/routes.py:398-495)."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    from llmaix_spark.functions.text import gen_id_expr, whitespace_scrub_expr
    from llmaix_spark.sources.readers import _stamp

    out_schema = T.StructType(
        [
            T.StructField("file", T.StringType()),
            T.StructField("report", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            files, reports = [], []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                try:
                    text = extract_pdf_text(bytes(content))
                except Exception:  # never fatal — treat as no text layer
                    text = ""
                files.append(fpath.rsplit("/", 1)[-1])
                reports.append(text)
            yield pd.DataFrame({"file": files, "report": reports})

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pdf")
        .load(path)
        .select("path", "content")
    )
    parsed = raw.mapInPandas(run, out_schema)
    out = parsed.select(
        "file", whitespace_scrub_expr(F.col("report")).alias("report")
    ).withColumn("id", gen_id_expr(F.col("file"), F.col("report")))
    return _stamp(out, "pdf", F.col("file")).select("id", "report", "metadata")
