"""Text-analysis + multimodal plumbing tests."""

import pytest
from pyspark.sql import functions as F

from llmaix_spark.operators import multimodal as mm
from llmaix_spark.operators import textstats as ts


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_token_counts(spark):
    df = spark.createDataFrame([("Hello, world! 42 times",)], ["text"])
    r = df.select(
        ts.token_count_ws(F.col("text")).alias("ws"),
        ts.token_count_bpe(F.col("text")).alias("bpe"),
    ).collect()[0]
    assert r["ws"] == 4
    # Hello , world ! 42 times → 6
    assert r["bpe"] == 6


def test_lang_id(spark):
    cases = [
        ("the cat and the dog of it", "en"),
        ("der hund und die katze ist da", "de"),
        ("el perro y la casa de los gatos", "es"),
        ("le chien et les chats dans un parc", "fr"),
        ("xyzzy plugh", "und"),
    ]
    df = spark.createDataFrame(cases, ["text", "expected"])
    rows = df.select("expected", ts.lang_id_expr(F.col("text")).alias("got")).collect()
    for r in rows:
        assert r["got"] == r["expected"], r


def test_quality_and_ratios(spark):
    df = spark.createDataFrame([("the cat, the hat.",)], ["text"])
    r = df.select(
        ts.punct_ratio(F.col("text")).alias("p"),
        ts.stopword_ratio(F.col("text")).alias("s"),
        ts.mean_word_len(F.col("text")).alias("m"),
        ts.quality_score_expr(F.col("text")).alias("q"),
    ).collect()[0]
    assert abs(r["p"] - 2 / 17) < 1e-9
    assert r["s"] == 0.5  # 'the' twice of 4 tokens
    assert 0 < r["q"] <= 1


def test_text_stats_full_pass(docs):
    out = ts.text_stats(docs)
    assert out.count() == docs.count()
    row = out.filter("doc_id = 0").collect()[0]
    assert row["n_tokens_ws"] > 0 and row["quality"] > 0


def test_doc_fingerprint(docs):
    fp = ts.doc_fingerprint(docs, n=5)
    assert fp.count() > 0
    # deterministic across runs
    a = {r["doc_id"]: r["fp_min"] for r in fp.collect()}
    b = {r["doc_id"]: r["fp_min"] for r in ts.doc_fingerprint(docs, n=5).collect()}
    assert a == b


def test_decode_media_plumbing(spark):
    rows = [
        ("m1", "image", bytearray(b"\x89PNG fake image bytes"), "image/png", 4, 4, None),
        ("m2", "audio", bytearray(b"RIFF fake wav"), "audio/wav", None, None, 1500),
        ("m3", "image", bytearray(b""), "image/png", 0, 0, None),  # error row
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in mm.decode_media(media).collect()}
    assert got["m1"]["decode_error"] is None
    assert len(got["m1"]["feature"]) == mm.FEATURE_DIM
    assert got["m2"]["n_bytes"] == 13
    # empty payload: row survives with an error, batch unaffected
    assert got["m3"]["decode_error"] is not None
    assert got["m3"]["feature"] is None
    # determinism: same bytes → same features
    again = {r["media_id"]: r["feature"] for r in mm.decode_media(media).collect()}
    assert again["m1"] == got["m1"]["feature"]


def test_frame_sample_plan(spark):
    rows = [
        ("v1", "video", None, "video/mp4", None, None, 3500),
        ("v2", "video", None, "video/mp4", None, None, 100),
        ("i1", "image", None, "image/png", 2, 2, None),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    plan = mm.frame_sample_plan(media, every_ms=1000, max_frames=16)
    got = {}
    for r in plan.collect():
        got.setdefault(r["media_id"], []).append(r["offset_ms"])
    assert sorted(got["v1"]) == [0, 1000, 2000, 3000]
    assert got["v2"] == [0]
    assert "i1" not in got


def test_bpe_tokens_multiplication_sign_is_punct(spark):
    """U+00D7/U+00F7 are not letters: 'a×b' is 3 BPE-ish tokens."""
    from pyspark.sql import functions as F

    from llmaix_spark.operators.textstats import token_count_bpe

    df = spark.createDataFrame([("a×b 3÷4",)], ["text"])
    [row] = df.select(token_count_bpe(F.col("text")).alias("n")).collect()
    assert row["n"] == 6


def test_repetition_stats_semantics(spark):
    """Gopher-family repetition signals: hand-computed fixture."""
    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),      # 6 words, 2 distinct; top bigram
                                     # 'a b' x3 of 5 positions
            (2, "one two three"),    # no repetition: dup 0, top 1/2
            (3, "solo"),             # 1 word: no bigrams, dup 0
            (4, None),               # NULL text: all zeros
        ],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: (
            r["n_words"], r["n_distinct_words"],
            r["dup_word_frac"], r["top_bigram_frac"],
        )
        for r in ts.repetition_stats(df).collect()
    }
    assert got[1] == (6, 2, pytest.approx(1 - 2 / 6), pytest.approx(3 / 5))
    assert got[2] == (3, 3, 0.0, pytest.approx(1 / 2))
    assert got[3] == (1, 1, 0.0, 0.0)
    assert got[4] == (0, 0, 0.0, 0.0)


def test_token_entropy_semantics(spark):
    """Shannon entropy of the per-doc token histogram: 0 for one
    repeated token, log2(n) for all-distinct, NULL for tokenless."""
    import math

    from llmaix_spark.operators.textstats import token_entropy

    df = spark.createDataFrame(
        [(1, "spam spam spam spam"), (2, "a b c d"), (3, "a a b b"), (4, None)],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in token_entropy(df).collect()}
    assert got[1]["entropy"] == 0.0 and got[1]["n_words"] == 4
    assert got[2]["entropy"] == round(math.log2(4), 4)
    assert got[3]["entropy"] == 1.0  # two tokens at p=0.5
    assert got[4]["n_words"] == 0 and got[4]["entropy"] is None
