"""Corpus-curation operators (dataset_split / pack_sequences /
decontaminate) — semantics beyond the driver oracles."""

import pytest
from pyspark.sql import functions as F

from llmaix_spark.operators import curation as cu


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_dataset_split_proportions_and_coverage(docs):
    got = cu.dataset_split(docs).groupBy("split").count().collect()
    counts = {r["split"]: r["count"] for r in got}
    n = sum(counts.values())
    assert n == docs.count()
    # hash split at 500 docs: rough proportions, all three present
    assert counts["train"] / n == pytest.approx(0.9, abs=0.1)
    assert set(counts) == {"train", "val", "test"}


def test_dataset_split_stable_under_corpus_growth(docs):
    """The split of an id must not change when the corpus grows — the
    property hash splits exist for (re-runs never leak val into train)."""
    full = {r["doc_id"]: r["split"] for r in cu.dataset_split(docs).collect()}
    half = {
        r["doc_id"]: r["split"]
        for r in cu.dataset_split(docs.filter(F.col("doc_id") % 2 == 0)).collect()
    }
    assert all(full[k] == v for k, v in half.items())


def test_dataset_split_salt_and_weights(spark):
    ids = spark.range(1000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in cu.dataset_split(ids).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in cu.dataset_split(ids, salt="other").collect()
    }
    assert a != b  # a different salt reshuffles
    # non-normalized weights normalize; single split degenerates cleanly
    one = cu.dataset_split(ids, weights={"all": 3.0}).collect()
    assert {r["split"] for r in one} == {"all"}


def test_pack_sequences_semantics(spark):
    df = spark.createDataFrame(
        [(0, "a b c"), (32, "d e"), (64, "f g h i"), (1, "x " * 300)],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["shard"], r["n_tokens"], r["pack_id"])
        for r in cu.pack_sequences(df, budget=5, n_shards=32).collect()
    }
    # shard 0 in id order: 3 tokens (cum 0 → pack 0), 2 tokens (cum 3 →
    # pack 0), 4 tokens (cum 5 → pack 1)
    assert got[0] == (0, 3, 0)
    assert got[32] == (0, 2, 0)
    assert got[64] == (0, 4, 1)
    # an oversize doc stays in its own pack on its shard
    assert got[1] == (1, 300, 0)


def test_decontaminate_flags_exact_ngram_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "one two three four five six seven eight nine")],
        ["doc_id", "text"],
    )
    docs = spark.createDataFrame(
        [
            # contains the benchmark 8-gram "one ... eight"
            (1, "zzz one two three four five six seven eight trailing"),
            # 7-gram overlap only → clean at n=8
            (2, "one two three four five six seven different tail words"),
            (3, "completely unrelated text with enough words to shingle fine"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_shared"], r["contaminated"])
        for r in cu.decontaminate(docs, bench, n=8).collect()
    }
    assert got[1][1] is True and got[1][0] >= 1
    assert got[2] == (0, False)
    assert got[3] == (0, False)


def test_decontaminate_short_docs_never_flag(spark):
    bench = spark.createDataFrame([(1, "a b c d e f g h")], ["doc_id", "text"])
    docs = spark.createDataFrame([(2, "a b c")], ["doc_id", "text"])
    got = cu.decontaminate(docs, bench, n=8).collect()
    assert got[0]["contaminated"] is False


def test_unigram_logprob_semantics(spark):
    """Corpus-fitted unigram LM proxy: common-word docs score higher
    (closer to 0) than rare-word docs; tokenless docs score NULL."""
    df = spark.createDataFrame(
        [(1, "the the the the"), (2, "zyzzyva"), (3, None)],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in cu.unigram_logprob(df).collect()}
    # p(the)=4/5, p(zyzzyva)=1/5
    import math

    assert got[1]["n_words"] == 4
    assert got[1]["mean_logprob"] == pytest.approx(
        round(round(math.log10(4 / 5), 6), 4)
    )
    assert got[2]["mean_logprob"] == pytest.approx(
        round(round(math.log10(1 / 5), 6), 4)
    )
    assert got[1]["mean_logprob"] > got[2]["mean_logprob"]
    assert got[3]["n_words"] == 0 and got[3]["mean_logprob"] is None


def test_unigram_logprob_two_path_routing_invariant(docs):
    """The Zipf-head broadcast path and the tail shuffle path must
    produce identical scores regardless of where the head/tail boundary
    falls — head_k=0 (everything tail), a tiny head (hot tokens
    broadcast, the rest shuffled), and the default (everything head at
    this vocab size) agree row-for-row; materialize_tokens=False (the
    100 TB opt-out) changes the plan, never the result."""
    small = docs.limit(50)
    base = sorted(
        cu.unigram_logprob(small).collect(), key=lambda r: r["doc_id"]
    )
    assert base and any(r["mean_logprob"] is not None for r in base)
    for kw in (
        {"head_k": 0},
        {"head_k": 7},
        {"head_k": 7, "materialize_tokens": False},
    ):
        got = sorted(
            cu.unigram_logprob(small, **kw).collect(),
            key=lambda r: r["doc_id"],
        )
        assert got == base, kw


def test_materialize_packs_spans_recover_documents(spark):
    """The loader contract: slicing a pack's text by its span index
    must recover every original document byte-for-byte, in doc order,
    with the EOS between consecutive docs; pack membership must match
    pack_sequences exactly."""
    rows = [(i, " ".join(f"w{i}x{j}" for j in range(i % 4 + 2)))
            for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    orig = dict(rows)
    packs = {
        (r["shard"], r["pack_id"]): r
        for r in cu.materialize_packs(
            docs, budget=5, n_shards=3, eos="<EOS>"
        ).collect()
    }
    assign = {
        r["doc_id"]: (r["shard"], r["pack_id"])
        for r in cu.pack_sequences(docs, budget=5, n_shards=3).collect()
    }
    seen = set()
    for (shard, pid), row in packs.items():
        spans = [
            tuple(int(x) for x in part.split(":"))
            for part in row["spans"].split(";")
        ]
        assert row["n_docs"] == len(spans)
        assert row["pack_len"] == len(row["text"])
        prev_end = None
        for doc_id, begin, end in spans:
            assert row["text"][begin:end] == orig[doc_id]
            assert assign[doc_id] == (shard, pid)
            if prev_end is not None:  # EOS between consecutive docs
                assert row["text"][prev_end:begin] == "<EOS>"
            prev_end = end
            seen.add(doc_id)
    assert seen == set(orig)  # every document is in exactly one pack


def test_dsir_importance_ranks_target_like_docs_higher(spark):
    """DSIR semantics: documents drawn from the target vocabulary must
    receive strictly higher importance weights than off-distribution
    documents; empty docs score NULL with n_feats 0."""
    vocab_a = ["quark", "lepton", "boson", "gluon", "hadron"]
    vocab_b = ["ledger", "invoice", "audit", "escrow", "accrual"]
    rows = []
    for i in range(40):
        words = [
            (vocab_a if i < 20 else vocab_b)[(i * 3 + j) % 5]
            for j in range(12)
        ]
        rows.append((i, " ".join(words)))
    rows.append((99, "   "))  # token-less doc
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    # target = the first 10 vocab-A documents
    target = docs.filter(F.col("doc_id") < 10)
    got = {
        r["doc_id"]: (r["n_feats"], r["log_weight"])
        for r in cu.dsir_importance(docs, target, n_buckets=512).collect()
    }
    a_w = [got[i][1] for i in range(20)]
    b_w = [got[i][1] for i in range(20, 40)]
    assert min(a_w) > max(b_w), (min(a_w), max(b_w))
    assert got[99] == (0, None)
    assert all(got[i][0] == 12 for i in range(40))


def test_curate_corpus_composition(docs):
    """The composed pipeline = repetition gates ∩ LM band, split
    assignment matching dataset_split; the approx-percentile scale path
    runs and keeps a subset-or-equal population shape."""
    from llmaix_spark.operators.textstats import repetition_stats

    out = cu.curate_corpus(docs).collect()
    assert 0 < len(out) < docs.count()  # every stage drops something
    rows = {r["doc_id"]: r for r in out}
    # survivors satisfy the gates
    for r in out:
        assert r["n_words"] >= 20
        assert r["dup_word_frac"] <= 0.6
        assert r["top_bigram_frac"] <= 0.1
        assert r["mean_logprob"] is not None
    # split agrees with the standalone operator
    splits = {
        r["doc_id"]: r["split"] for r in cu.dataset_split(docs).collect()
    }
    assert all(splits[i] == r["split"] for i, r in rows.items())
    # gate-only population ⊇ survivors, and the band dropped some tails
    rep = {r["doc_id"] for r in repetition_stats(docs).collect()
           if r["n_words"] >= 20 and r["dup_word_frac"] <= 0.6
           and r["top_bigram_frac"] <= 0.1}
    assert set(rows) <= rep and len(rows) < len(rep)
    # approx-percentile path (the 10^12-doc variant) runs; same schema
    approx = cu.curate_corpus(docs, exact_percentile=False)
    assert approx.columns == [
        "doc_id", "n_words", "dup_word_frac", "top_bigram_frac",
        "mean_logprob", "split",
    ]
    assert approx.count() > 0


def test_build_training_corpus_composition(docs):
    """Dedup → decontaminate → curate chain: only group survivors
    appear, no contaminated doc appears, stats match curate_corpus run
    directly on the cleaned population (the model/band must be fitted
    AFTER cleaning, not before)."""
    from llmaix_spark.operators import dedup as dd

    bench = docs.filter(F.col("doc_id") % 97 == 0)
    out = cu.build_training_corpus(
        docs, bench, dedup_pairs_fn=dd.ngram_jaccard_pairs
    ).collect()
    assert out
    ids = {r["doc_id"] for r in out}
    groups = {
        r["doc_id"]: r["keep"]
        for r in dd.dedup_groups(
            docs, 0.5, pairs_fn=dd.ngram_jaccard_pairs
        ).collect()
    }
    assert all(groups[i] for i in ids)  # survivors only
    survivors = docs.filter(
        F.col("doc_id").isin([i for i, k in groups.items() if k])
    )
    flags = {
        r["doc_id"]: r["contaminated"]
        for r in cu.decontaminate(survivors, bench).collect()
    }
    assert all(not flags[i] for i in ids)  # decontaminated
    clean = survivors.filter(
        F.col("doc_id").isin([i for i, c in flags.items() if not c])
    )
    direct = sorted(
        cu.curate_corpus(clean).collect(), key=lambda r: r["doc_id"]
    )
    assert sorted(out, key=lambda r: r["doc_id"]) == direct


def test_stratified_sample_semantics(docs):
    """Per-stratum rates roughly honored; survival deterministic and
    stable under corpus growth; independent of the split hash."""
    got = cu.stratified_sample(docs, {"de": 0.3, "fr": 0.6}).collect()
    by = {}
    for r in got:
        by.setdefault(r["stratum"], set()).add(r["doc_id"])
    totals = {
        r["lang"]: r["count"]
        for r in docs.groupBy("lang").count().collect()
    }
    assert len(by.get("de", ())) / totals["de"] == pytest.approx(0.3, abs=0.15)
    assert len(by.get("fr", ())) / totals["fr"] == pytest.approx(0.6, abs=0.15)
    for lang in totals:
        if lang not in ("de", "fr"):
            assert len(by.get(lang, ())) == totals[lang]  # default keep-all
    # growth stability: the half-corpus sample is the full sample's subset
    half = {
        r["doc_id"]
        for r in cu.stratified_sample(
            docs.filter(F.col("doc_id") % 2 == 0), {"de": 0.3, "fr": 0.6}
        ).collect()
    }
    full_ids = {r["doc_id"] for r in got}
    assert half == {i for i in full_ids if i % 2 == 0}


def test_domain_mixture_rates_and_gate(spark):
    """Two domains at 4:1 — the rare one keeps rate 1.0, the common
    one downsamples to sqrt(s_rare/s_common) = sqrt(1/4) = 0.5; the
    hash gate keeps roughly that fraction and is deterministic."""
    import math

    from llmaix_spark.operators.curation import domain_mixture

    rows = [(i, "big" if i < 400 else "small") for i in range(500)]
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = domain_mixture(docs).collect()
    rates = {r["domain"]: r["keep_rate"] for r in out}
    assert rates["small"] == 1.0
    assert rates["big"] == round(math.sqrt(100 / 400), 6) == 0.5
    kept = {d: sum(1 for r in out if r["domain"] == d) for d in rates}
    assert kept["small"] == 100          # rate-1 domain keeps everything
    assert 160 <= kept["big"] <= 240     # ~200 expected at rate 0.5
    # deterministic: same input -> identical surviving id set
    again = {r["doc_id"] for r in domain_mixture(docs).collect()}
    assert again == {r["doc_id"] for r in out}


def test_bpe_pair_counts_hand_computed(spark):
    """freq-weighted: 'ab'×3 + 'abc'×1 contribute ab=4, bc=1; the
    single-char word contributes nothing (and must not trip Spark's
    descending sequence(1, 0))."""
    from llmaix_spark.operators.curation import bpe_pair_counts

    docs = spark.createDataFrame(
        [(1, "ab ab abc"), (2, "b ab")], "doc_id bigint, text string"
    )
    got = [(r["pair"], r["pair_count"]) for r in bpe_pair_counts(docs).collect()]
    assert got == [("ab", 4), ("bc", 1)]


def test_sample_k_per_group_exact_and_stable(spark):
    from llmaix_spark.operators.curation import sample_k_per_group

    rows = [(i, "a" if i % 3 else "b") for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = sample_k_per_group(docs, k=10).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r["grp"], []).append(r)
    assert {g: len(v) for g, v in by_grp.items()} == {"a": 10, "b": 10}
    assert {r["rk"] for r in by_grp["a"]} == set(range(1, 11))
    # rerun-stable AND invariant to adding rows in another group
    more = spark.createDataFrame(
        rows + [(i, "c") for i in range(200, 260)],
        "doc_id bigint, lang string",
    )
    again = {
        r["doc_id"]
        for r in sample_k_per_group(more, k=10).collect()
        if r["grp"] == "a"
    }
    assert again == {r["doc_id"] for r in by_grp["a"]}
