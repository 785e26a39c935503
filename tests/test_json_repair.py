"""JSON-repair kernel — the reference's postprocess table, ported verbatim.

Every case from webapp/llm_processing/tests/test_postprocess_grammar.py:33-85
plus the failed-request path (routes.py:955-960): the row always survives,
errors are flagged not raised.
"""

import pytest
from pyspark.sql import functions as F

from llmaix_spark.functions import json_repair as jr


CASES = [
    # (content, expected_dict, expected_error)
    ('{"name": "John", "age": "30"}', {"name": "John", "age": "30"}, False),
    ('{"name": "John"}<|eot_id|>', {"name": "John"}, False),
    ('{"name": "John"}</s>', {"name": "John"}, False),
    (
        '{"name": "John"} Here is your answer, hope it helps!',
        {"name": "John"},
        False,
    ),
    ('{"name": "John", "age": "30",}', {"name": "John", "age": "30"}, False),
    # null → "" (routes.py:995-1000 via is_empty_string_nan_or_none)
    ('{"name": "John", "age": null}', {"name": "John", "age": ""}, False),
    # numbers stringified
    ('{"age": 30}', {"age": "30"}, False),
    # '?' value is empty-ish
    ('{"name": "?"}', {"name": ""}, False),
    # malformed → {} + error, row kept
    ('{"name": "John", "age: ', {}, True),
    # missing content (failed request) → empty → error
    ("", {}, True),
    (None, {}, True),
    # ' null,' scrub retry path (routes.py:985-987)
    ('{"a": null, "b": "x"}', {"a": "", "b": "x"}, False),
    # backslashes stripped before parse (routes.py:977)
    ('{"name": "Jo\\hn"}', {"name": "John"}, False),
    # newlines inside content removed
    ('{"name":\n "John"}', {"name": "John"}, False),
]


@pytest.mark.parametrize("content,expected,err", CASES)
def test_repair_and_parse(content, expected, err):
    got, _repaired, got_err = jr.repair_and_parse(content)
    assert got == expected
    assert got_err == err


def test_structured_values_survive():
    d, _, err = jr.repair_and_parse(
        '{"triples": [{"subj": "A", "pred": "p", "obj": "B"}], "n": 1}'
    )
    assert not err
    assert d["triples"] == [{"subj": "A", "pred": "p", "obj": "B"}]
    assert d["n"] == "1"


def test_expr_variant_matches_python(spark):
    """The JVM regexp/from_json chain must agree with the Python kernel on
    flat string maps."""
    flat_cases = [c for c, exp, err in CASES if c is not None]
    df = spark.createDataFrame([(c,) for c in flat_cases], ["content"])
    rows = df.select(
        "content",
        jr.parsed_map_expr(F.col("content")).alias("m"),
        jr.json_error_expr(F.col("content")).alias("err"),
    ).collect()
    for r in rows:
        py, _, py_err = jr.repair_and_parse(r["content"])
        assert r["err"] == py_err, r["content"]
        if not py_err:
            got = dict(r["m"])
            # expr variant can't apply the empty-ish → "" normalization on
            # null JSON values: from_json maps null → None
            norm = {k: ("" if v is None or v.strip() in ("", "?") else v) for k, v in got.items()}
            assert norm == py, r["content"]


def test_jvm_repair_unicode_whitespace_trailing_comma(spark):
    """Java \\s is ASCII-only: the ',\\s*}' scrub must also collapse
    NBSP-padded trailing commas like the Python twin's re.sub does, or
    the two sides disagree on the error flag."""
    from pyspark.sql import functions as F

    from llmaix_spark.functions.json_repair import (
        json_error_expr,
        repair_and_parse,
        repaired_content_expr,
    )

    raw = '{"a": "x", }'
    d, _rep, err = repair_and_parse(raw)
    assert not err and d == {"a": "x"}
    df = spark.createDataFrame([(raw,)], ["content"])
    [row] = df.select(
        repaired_content_expr(F.col("content")).alias("r"),
        json_error_expr(F.col("content")).alias("e"),
    ).collect()
    assert row["r"] == '{"a": "x"}'
    assert row["e"] is False
