"""Tolerant JSON repair — the deterministic postprocess kernel.

Replicates, step for step, the repair semantics of the reference's
`postprocess_grammar` (webapp/llm_processing/routes.py:964-1000), pinned by
webapp/llm_processing/tests/test_postprocess_grammar.py:33-85:

  J1  strip trailing '<|eot_id|>' then '</s>'
  J2  truncate after the last '}' (no '}' → empty → error)
  J3  drop '\\n', '\\r', every backslash; collapse trailing ',}' → '}'
  J4  json.loads; on failure retry after dropping ' null,' / ' "null",';
      on second failure → {} and the row is *kept* with error=True
  J5  normalize values: empty-ish → "", else str(value)

Two implementations with identical semantics:
  * `repair_and_parse` — pure Python, used inside the mapInPandas
    extraction harness (vectorized over an Arrow batch).
  * `repaired_content_expr` / `parsed_map_expr` — native Column
    expressions (regexp_replace chain + from_json) for JVM-side use; the
    two-stage retry becomes a coalesce of two from_json attempts.
"""

from __future__ import annotations

import json
import math
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_END_MARKERS = ("<|eot_id|>", "</s>")


def _is_empty_value(v) -> bool:
    """Python twin of functions.text.is_empty_expr (reference
    webapp/llm_processing/utils.py:147-169)."""
    if v is None:
        return True
    if isinstance(v, str):
        s = v.strip()
        return s == "" or s == "?"
    if isinstance(v, float) and math.isnan(v):
        return True
    if isinstance(v, (int, bool, float)):
        return False
    return False  # containers (lists/dicts) are kept


def repair_content(content: str) -> str:
    """J1-J3: produce the repaired JSON candidate string."""
    if content is None:
        content = ""
    if content.endswith("<|eot_id|>"):
        content = content[: -len("<|eot_id|>")]
    if content.endswith("</s>"):
        content = content[: -len("</s>")]
    content = content[: content.rfind("}") + 1]
    content = content.replace("\n", "").replace("\r", "").replace("\\", "")
    content = re.sub(r",\s*}", "}", content)
    return content


def repair_and_parse(content: str) -> tuple[dict, str, bool]:
    """Full J1-J5. Returns (normalized_dict, repaired_content, error)."""
    repaired = repair_content(content)
    try:
        raw = json.loads(repaired)
        error = False
    except Exception:
        retry = repaired.replace(" null,", "").replace(' "null",', "")
        try:
            raw = json.loads(retry)
            repaired = retry
            error = False
        except Exception:
            raw = {}
            error = True
    if not isinstance(raw, dict):
        return {}, repaired, True
    out = {}
    for k, v in raw.items():
        if _is_empty_value(v):
            out[k] = ""
        elif isinstance(v, (list, dict)):
            out[k] = v  # structured payloads (e.g. triples) stay structured
        else:
            out[k] = str(v)
    return out, repaired, error


# --- Column-expression variant ------------------------------------------------


def repaired_content_expr(col: Column) -> Column:
    """J1-J3 as a regexp chain (JVM-side)."""
    c = F.coalesce(col, F.lit(""))
    c = F.regexp_replace(c, r"<\|eot_id\|>$", "")
    c = F.regexp_replace(c, r"</s>$", "")
    # truncate after last '}': no '}' anywhere → empty string
    c = F.when(c.contains("}"), F.regexp_replace(c, r"[^}]*$", "")).otherwise(
        F.lit("")
    )
    c = F.regexp_replace(c, "[\n\r\\\\]", "")
    # (?U): Java \s is ASCII-only, but the Python twin's re.sub matches
    # Unicode whitespace (NBSP-padded model output) — the two
    # implementations must agree on the error flag
    c = F.regexp_replace(c, r"(?U),\s*}", "}")
    return c


def parsed_map_expr(col: Column) -> Column:
    """J4 as coalesce(from_json(repaired), from_json(null-scrubbed)).

    Narrowed contract vs the Python twin's J5: from_json keeps each
    value's raw JSON token ('true', '1.50'), while repair_and_parse
    applies Python str() ('True', '1.5'). The stub/extraction grammar
    emits strings only, where both agree; consumers comparing against
    the Python harness on boolean/number-valued JSON must normalize."""
    repaired = repaired_content_expr(col)
    first = F.from_json(repaired, "map<string,string>")
    retry_src = F.replace(
        F.replace(repaired, F.lit(" null,"), F.lit("")),
        F.lit(' "null",'),
        F.lit(""),
    )
    second = F.from_json(retry_src, "map<string,string>")
    return F.coalesce(first, second)


def json_error_expr(col: Column) -> Column:
    return parsed_map_expr(col).isNull()
