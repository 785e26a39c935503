"""PII masking kernels (anonymizer mode).

Pure-Python kernels mirror the reference exactly (tests ported from
webapp/llm_processing/tests/test_anonymization_utils.py and
test_anonymizer_postprocess.py); Spark exposure is via Arrow-batched
pandas UDFs — each row is masked with *its own* PII list (row-local, no
shuffle), which encodes the reference's historical PII-isolation bug fix
(webapp/llm_processing/tests/test_anonymizer_postprocess.py:18-48).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from llmaix_spark.functions.fuzzy import qratio, wratio
from llmaix_spark.functions.json_repair import _is_empty_value

_UMLAUTS = {
    "ä": "ae", "ö": "oe", "ü": "ue",
    "Ä": "Ae", "Ö": "Oe", "Ü": "Ue", "ß": "ss",
}


def replace_umlauts(text: str) -> str:
    """Python twin of functions.text.replace_umlauts_expr
    (reference webapp/llm_processing/utils.py:12-26)."""
    for uml, rep in _UMLAUTS.items():
        text = text.replace(uml, rep)
    return text


def add_umlaut_variants(items: list[str]) -> list[str]:
    """Append transliterated variant after each umlaut-bearing item
    (reference webapp/llm_processing/utils.py:28-36, order-preserving)."""
    out = []
    for s in items:
        out.append(s)
        if any(u in s for u in "äöüÄÖÜß"):
            out.append(replace_umlauts(s))
    return out


def dedupe_preserve_order(items: list) -> list[str]:
    """First-occurrence-wins dedup (reference OrderedDict.fromkeys,
    webapp/llm_processing/utils.py:61)."""
    return list(dict.fromkeys(items))


def convert_personal_info_list(items) -> list[str]:
    """Normalize a PII list: dedupe (order-preserving), stringify, drop
    empty-ish, append umlaut variants
    (reference webapp/llm_processing/utils.py:39-72). Unlike the
    reference, the input is already a real array — Spark never
    serializes arrays through strings, so the ast.literal_eval step
    disappears by construction."""
    if items is None:
        return []
    if not isinstance(items, (list, tuple)):
        items = [items]
    items = dedupe_preserve_order(items)
    items = [str(x) for x in items if x is not None]
    items = [x for x in items if not _is_empty_value(x)]
    return add_umlaut_variants(items)


def mask_text(text: str, personal_info_list, replacement_char: str = "*") -> str:
    """Length-preserving, case-insensitive literal masking
    (reference `replace_text_with_placeholder`,
    webapp/llm_processing/utils.py:171-198).

    Faithful-port note: positions are found on text.lower() and applied
    to the original — EXACTLY the reference's loop, including its edge:
    for the rare chars where lower() changes string length (e.g. 'İ' →
    2 codepoints), offsets shift and the mask can land off by one. Kept
    bit-identical to the reference rather than 'fixed', since the P/R
    gates compare against reference behavior."""
    if text is None:
        return None
    positions = []
    lowered = text.lower()
    for info in personal_info_list or []:
        if _is_empty_value(info):
            continue
        for m in re.finditer(re.escape(str(info).lower()), lowered):
            positions.append((m.start(), m.end()))
    for start, end in positions:
        text = text[:start] + replacement_char * (end - start) + text[end:]
    return text


def replace_personal_info(
    text: str,
    personal_info_list,
    fuzzy_matches=(),
    fuzzy_matching_threshold: int = 90,
    replacement_char: str = "■",
    ignore_short_sequences: int = 0,
) -> str:
    """Masking orchestrator (reference `replace_personal_info`,
    webapp/llm_processing/utils.py:202-244): dedupe, drop '', merge
    fuzzy matches ≥ threshold, drop short sequences, then mask."""
    assert len(replacement_char) == 1
    infos = [x for x in dict.fromkeys(personal_info_list or []) if x != ""]
    infos += [m for m, score in (fuzzy_matches or []) if score >= fuzzy_matching_threshold]
    if ignore_short_sequences > 0:
        infos = [x for x in infos if len(x) > ignore_short_sequences]
    return mask_text(text, infos, replacement_char=replacement_char)


def _meets_split_criteria(substring: str) -> bool:
    """len>=3 or >=4 digits (reference webapp/report_redaction/utils.py:421-433).
    The digit clause is unreachable (>=4 digits implies len>=4>=3) — in
    the reference too; kept verbatim for parity, not an accidental port."""
    return len(substring) >= 3 or len(re.findall(r"\d", substring)) >= 4


def find_fuzzy_matches(
    text: str, personal_info_list, threshold: int = 90,
    scorer: str = "WRatio", limit: int = 5,
) -> list[tuple[str, int]]:
    """Row-local fuzzy matcher (reference `find_fuzzy_matches`,
    webapp/report_redaction/utils.py:413-437): split each PII item into
    word tokens, keep tokens per the split criteria, score every word of
    the text with thefuzz WRatio (or QRatio), keep the top-`limit`
    (word, score) pairs ≥ threshold per probe token — process.extract's
    default limit=5, ties resolved by word order like heapq.nlargest —
    and dedupe across probes."""
    if scorer == "WRatio":
        score_fn = wratio
    elif scorer == "QRatio":
        score_fn = qratio
    else:  # reference raises the same way (utils.py:414-420)
        raise ValueError("Invalid scorer. Must be 'QRatio' or 'WRatio'")
    if not text:
        return []
    words = text.split()
    out = set()
    for info in personal_info_list or []:
        if _is_empty_value(info):
            continue
        for sub in re.findall(r"\w+", str(info)):
            if not _meets_split_criteria(sub):
                continue
            scored = [(w, score_fn(sub, w)) for w in words]
            top = sorted(scored, key=lambda t: -t[1])[:limit]
            out.update((w, s) for w, s in top if s >= threshold)
    return sorted(out)


def generate_dollartext(text: str, spans, replacement_char: str = "■") -> str:
    """Char-mask from annotation spans [begin, end)
    (reference `generate_dollartext`, webapp/report_redaction/utils.py:170-184)."""
    chars = list(text)
    for span in spans or []:
        begin, end = int(span[0]), int(span[1])
        for i in range(max(begin, 0), min(end, len(chars))):
            chars[i] = replacement_char
    return "".join(chars)


def generate_classwise_dollartext(
    text: str, annotations, replacement_char: str = "■"
) -> dict[str, str]:
    """F5 classwise variant (reference `generate_classwise_dollartext`,
    webapp/report_redaction/utils.py:186-217): one masked text PER LABEL,
    each masking only that label's spans — the inputs to per-label
    redaction scores. Annotations: dicts with label/begin/end (the CAS
    parser's span rows). Spans are clamped to the text like
    generate_dollartext (the reference splices unclamped; clamping keeps
    the output length-preserving on malformed spans)."""
    assert len(replacement_char) == 1
    out: dict[str, str] = {}
    for ann in annotations or []:
        label = ann["label"]
        masked = out.get(label, text)
        out[label] = generate_dollartext(
            masked, [(ann["begin"], ann["end"])], replacement_char
        )
    return out


def dollartext_udf(replacement_char: str = "■"):
    """pandas UDF: (text, array<array<int>> spans) → span-masked text."""

    def _mask(text: pd.Series, spans: pd.Series) -> pd.Series:
        return pd.Series(
            [
                generate_dollartext(
                    t, list(s) if s is not None else [], replacement_char
                )
                if t is not None
                else None
                for t, s in zip(text, spans)
            ]
        )

    return F.pandas_udf(_mask, StringType())


# --- Spark exposure (Arrow-batched) -----------------------------------------


def masked_report_udf(replacement_char: str = "■", ignore_short: int = 0):
    """pandas UDF: (text, array<string> pii) -> masked text."""

    def _mask(text: pd.Series, pii: pd.Series) -> pd.Series:
        return pd.Series(
            [
                replace_personal_info(
                    t,
                    convert_personal_info_list(list(p) if p is not None else []),
                    replacement_char=replacement_char,
                    ignore_short_sequences=ignore_short,
                )
                if t is not None
                else None
                for t, p in zip(text, pii)
            ]
        )

    return F.pandas_udf(_mask, StringType())


def masked_col(
    text: Column,
    pii: Column,
    replacement_char: str = "■",
    ignore_short: int = 0,
) -> Column:
    return masked_report_udf(replacement_char, ignore_short)(text, pii)
