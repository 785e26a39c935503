

def test_tfidf_top_terms_hand_computed(spark):
    """3 docs; 'common' appears in all (idf=ln(1)=0 -> never ranks
    above a discriminative term), 'rare' only in doc 1."""
    import math

    from llmaix_spark.operators.textstats import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "common rare rare"),
            (2, "common mid"),
            (3, "common mid"),
        ],
        "doc_id bigint, text string",
    )
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["tf"], r["score"])
        for r in tfidf_top_terms(docs, top_k=2).collect()
    }
    assert got[(1, 1)] == ("rare", 2, round(2 * math.log(3 / 1), 6))
    # ln(3/3)=0 for 'common'; it still appears but scored 0.0
    assert got[(1, 2)][0] == "common" and got[(1, 2)][2] == 0.0
    mid = round(math.log(3 / 2), 6)
    assert got[(2, 1)] == ("mid", 1, mid)
    assert got[(3, 1)] == ("mid", 1, mid)
