"""Corpus-curation operators for LLM training-data pipelines.

Three operations every large-scale pretraining pipeline runs between
dedup and tokenization, each pure DataFrame API with an exact ANSI-SQL
twin (driver oracles in plans/queries.py):

  dataset_split     deterministic hash-based train/val/test assignment —
                    stable under reprocessing, no RNG, no shuffle
  pack_sequences    shard-local context-window packing by cumulative
                    token count — the batch-construction step before
                    tokenized examples are written
  decontaminate     n-gram overlap flagging against a held-out benchmark
                    set — the standard eval-contamination sweep

Scale notes inline per operator; none of the three ever materializes
unbounded state on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from llmaix_spark.operators.dedup import word_shingles
from llmaix_spark.operators.linking import stable_hash60_expr
from llmaix_spark.operators.textstats import token_count_ws


def split_thresholds(
    weights: dict[str, float], buckets: int = 10000
) -> list[tuple[str, int]]:
    """(name, exclusive upper bucket) pairs tiling [0, buckets)
    completely — the single source of the threshold arithmetic for
    split_expr and its tests (integer rounding of cumulative weights;
    the last split absorbs the remainder)."""
    assert weights and all(w > 0 for w in weights.values())
    total = sum(weights.values())
    names = list(weights)
    out, cum = [], 0.0
    for name in names[:-1]:
        cum += weights[name] / total
        out.append((name, int(cum * buckets + 0.5)))
    out.append((names[-1], buckets))
    return out


def split_expr(
    id_col, weights: dict[str, float], salt: str = "split",
    buckets: int = 10000,
):
    """Split-name Column for a deterministic hash split.

    bucket = stable_hash60(id || ':' || salt) % buckets; each split owns
    a contiguous bucket range sized by its weight (integer thresholds,
    last split absorbs the rounding remainder). Re-running over a grown
    corpus never reassigns an existing id (the classic property hash
    splits are chosen for), and the shared md5-based hash makes the
    assignment bit-identical in any engine (CLAUDE.md cross-engine
    hash)."""
    bucket = F.pmod(
        stable_hash60_expr(
            F.concat(id_col.cast("string"), F.lit(":" + salt))
        ),
        F.lit(buckets),
    )
    pairs = split_thresholds(weights, buckets)
    expr = None
    for name, upper in pairs[:-1]:
        cond = bucket < F.lit(upper)
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    last = F.lit(pairs[-1][0])
    return last if expr is None else expr.otherwise(last)


def dataset_split(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
    buckets: int = 10000,
) -> DataFrame:
    """Assign every document to a split: (doc_id, split). Pure
    projection — no shuffle, no RNG, no driver state; safe at any scale
    and stable across runs and engines."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    return docs.select(
        F.col(id_col).alias("doc_id"),
        split_expr(F.col(id_col), weights, salt, buckets).alias("split"),
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 256,
    n_shards: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_counter=None,
) -> DataFrame:
    """Shard-local streaming pack: documents are sharded by id, ordered
    by id within the shard, and cut into packs every `budget` cumulative
    tokens — pack_id = floor(exclusive_prefix_sum / budget). Returns
    (doc_id, shard, n_tokens, pack_id).

    `token_counter` is the Column-builder the budget is measured in —
    default whitespace tokens (textstats.token_count_ws); a training
    pipeline packs on real tokenizer budgets, so pass
    textstats.token_count_bpe (the GPT-style pre-tokenizer families) or
    any Column expression mapping text → count. The packing arithmetic
    is counter-agnostic.

    Semantics: a document whose tokens overflow its pack stays in it
    (training loaders split/truncate at tokenization); packs are
    deterministic in (shard, id) order. Scale: the window partitions by
    shard, so packing parallelizes across n_shards — size n_shards to
    the cluster (a GLOBAL ordered window would funnel the corpus through
    one task). Growing the corpus only appends to each shard's tail."""
    counter = token_counter or token_count_ws
    shard = F.pmod(F.col(id_col), F.lit(n_shards)).cast("bigint")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        shard.alias("shard"),
        counter(F.col(text_col)).cast("bigint").alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    cum_excl = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return base.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(cum_excl / budget).cast("bigint").alias("pack_id"),
    )


def materialize_packs(
    docs: DataFrame,
    budget: int = 256,
    n_shards: int = 32,
    eos: str = "</s>",
    id_col: str = "doc_id",
    text_col: str = "text",
    token_counter=None,
) -> DataFrame:
    """The physical shard-writing step after `pack_sequences`: one row
    per (shard, pack_id) holding the EOS-joined pack text in (shard,
    doc_id) order plus the char-offset span index a training loader
    needs to recover document boundaries. Returns
    (shard, pack_id, n_docs, pack_len, text, spans) — `spans` is the
    compact string "doc_id:begin:end;…" (begin inclusive, end
    exclusive, offsets into `text`; a string, not array<struct>, so
    the cross-engine value compare stays exact).

    Scale: pack assignment is pack_sequences (shard-partitioned
    window, never global); the join back to the text is 1:1 on doc_id;
    the concat is ONE groupBy (shard, pack_id) whose state is a single
    pack's documents — bounded by budget, not the corpus. The span
    arithmetic runs per-pack over the collected struct list
    (bind_array once — landmine #2: an unbound computed array
    re-evaluates per lambda access)."""
    from llmaix_spark.functions.arrays import bind_array

    packs = pack_sequences(
        docs, budget, n_shards, id_col, text_col, token_counter
    )
    joined = packs.join(
        docs.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        ),
        "doc_id",
    )
    per_pack = joined.groupBy("shard", "pack_id").agg(
        F.array_sort(
            F.collect_list(F.struct("doc_id", "text"))
        ).alias("items")
    )
    eos_len = len(eos)

    def _spans(items):
        acc0 = F.struct(
            F.lit(0).alias("off"), F.lit("").alias("s")
        )
        return F.aggregate(
            items,
            acc0,
            lambda acc, it: F.struct(
                (acc["off"] + F.length(it["text"]) + F.lit(eos_len)).alias(
                    "off"
                ),
                F.concat(
                    acc["s"],
                    F.when(acc["s"] == "", F.lit("")).otherwise(F.lit(";")),
                    it["doc_id"].cast("string"),
                    F.lit(":"),
                    acc["off"].cast("string"),
                    F.lit(":"),
                    (acc["off"] + F.length(it["text"])).cast("string"),
                ).alias("s"),
            ),
            lambda acc: acc["s"],
        )

    return per_pack.select(
        "shard",
        "pack_id",
        F.size("items").cast("bigint").alias("n_docs"),
        bind_array(
            F.col("items"),
            lambda items: F.length(
                F.array_join(
                    F.transform(items, lambda s: s["text"]), eos
                )
            ),
        ).cast("bigint").alias("pack_len"),
        bind_array(
            F.col("items"),
            lambda items: F.array_join(
                F.transform(items, lambda s: s["text"]), eos
            ),
        ).alias("text"),
        bind_array(F.col("items"), _spans).alias("spans"),
    )


def unigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    head_k: int = 50_000,
    materialize_tokens: bool = True,
) -> DataFrame:
    """Cheap language-model quality proxy (the CCNet-family filter,
    unigram variant): fit a corpus unigram model IN the same job and
    score each document by its mean log10 token probability — gibberish
    and boilerplate-stuffed documents score far from the corpus medians.
    Returns (doc_id, n_words, mean_logprob); documents with no tokens
    score NULL.

    Scale — the scoring join is the hazard: token frequency is Zipf, so
    a plain shuffle-join of the token-INSTANCE table against the vocab
    on `tok` lands "the" (~5% of all instance rows at corpus scale) on
    one reducer once the vocab outgrows the broadcast threshold. The
    join is therefore TWO-PATH: the `head_k` most frequent tokens
    (TakeOrderedAndProject off the vocab — never a full sort; K≈50k
    covers ~95% of Zipf mass) are explicitly broadcast and scored
    map-side with NO exchange of the instance table, and only tail
    tokens — each rarer than the rank-K boundary by construction, so no
    hot key can cross it — take the shuffle-join. Head routing uses a
    deterministic (count desc, tok) tie-break; the per-token arithmetic
    is identical on both paths, so results do not depend on routing.
    The fit itself is a map-side-combinable groupBy (no skew: partial
    counts combine before the exchange) and the corpus total rides a
    broadcast 1-row aggregate.

    `materialize_tokens` localCheckpoints the exploded token-instance
    table, which three consumers share (fit, head scoring, tail
    anti-join). That state is ~corpus-sized: right at sandbox/dev scale
    where it kills 3 re-scans, wrong at 100 TB where re-running a
    narrow tokenize off the parquet scan is cheaper than writing a
    corpus to executor storage — pass False there (the size gate is the
    caller's corpus knowledge; the plan is identical either way). The
    vocab checkpoint stays unconditional — it is |vocab|-sized, not
    corpus-sized, and feeds three consumers too.

    Cross-engine determinism: the per-token log10 is rounded to 6dp
    BEFORE averaging (1-ulp libm differences die there), the mean to
    4dp."""
    from llmaix_spark.operators.textstats import _tokens

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_tokens(F.col(text_col))).alias("tok"),
    )
    if materialize_tokens:
        toks = toks.localCheckpoint(eager=False)
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    freq = freq.localCheckpoint(eager=False)  # head + tail-join + total
    total = freq.agg(F.sum("c").alias("n_total"))
    head = freq.orderBy(F.desc("c"), "tok").limit(head_k)
    lp = F.round(F.log10(F.col("c") / F.col("n_total")), 6).alias("lp")
    scored_head = (
        toks.join(F.broadcast(head), "tok")
        .join(F.broadcast(total))
        .select("doc_id", lp)
    )
    scored_tail = (
        toks.join(F.broadcast(head.select("tok")), "tok", "left_anti")
        .join(freq, "tok")
        .join(F.broadcast(total))
        .select("doc_id", lp)
    )
    per_doc = scored_head.unionByName(scored_tail).groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.round(F.avg("lp"), 4).alias("mean_logprob"),
    )
    ids = docs.select(F.col(id_col).alias("doc_id"))
    return ids.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_words", F.lit(0)).cast("bigint").alias("n_words"),
        "mean_logprob",
    )


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "sample",
    buckets: int = 10000,
) -> DataFrame:
    """Deterministic per-stratum downsampling — the data-mixing step of
    a pretraining pipeline (e.g. keep 30% of language X, all of Y):
    a document survives iff stable_hash60(id:salt) % buckets falls
    under its stratum's rate. Pure projection+filter like
    dataset_split: no RNG, no shuffle, stable under corpus growth
    (an id's fate never changes when more data arrives) and
    bit-identical across engines (shared md5 hash). Returns the
    surviving (doc_id, stratum) rows.

    Independence note: uses a different salt than dataset_split, so
    sampling and splitting are independent hash draws — the same salt
    would correlate survival with the train/val/test assignment."""
    bucket = F.pmod(
        stable_hash60_expr(
            F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))
        ),
        F.lit(buckets),
    )
    rate = None
    for name, r in rates.items():
        cond = F.col(stratum_col) == name
        thresh = F.lit(int(r * buckets + 0.5))
        rate = (
            F.when(cond, thresh) if rate is None else rate.when(cond, thresh)
        )
    thresh_col = (
        F.lit(int(default_rate * buckets + 0.5))
        if rate is None
        else rate.otherwise(F.lit(int(default_rate * buckets + 0.5)))
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(stratum_col).alias("stratum"),
        bucket.alias("_b"),
        thresh_col.alias("_t"),
    ).filter(F.col("_b") < F.col("_t")).select("doc_id", "stratum")


def curate_corpus(
    docs: DataFrame,
    max_dup_word_frac: float = 0.6,
    max_top_bigram_frac: float = 0.1,
    min_words: int = 20,
    lo_pct: float = 0.05,
    hi_pct: float = 0.95,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    exact_percentile: bool = True,
) -> DataFrame:
    """End-to-end corpus curation: the composition every pretraining
    pipeline runs — repetition gates (Gopher family) + LM-quality band
    (CCNet family) + deterministic split — in ONE job. Returns
    (doc_id, n_words, dup_word_frac, top_bigram_frac, mean_logprob,
    split) for the documents that survive:

      1. repetition gates: n_words ≥ min_words, dup_word_frac ≤
         max_dup_word_frac, top_bigram_frac ≤ max_top_bigram_frac;
      2. LM band: mean unigram log-probability within the
         [lo_pct, hi_pct] percentiles of the GATED population (both
         tails are suspect: too-low = gibberish, too-high =
         boilerplate);
      3. survivors get the hash-based train/val/test split.

    Scale: the stats come from repetition_stats + unigram_logprob
    (both scale-audited — see their docstrings), joined 1:1 on doc_id;
    the gated table is lazily localCheckpointed (the band aggregate and
    the final filter both consume it). The percentile is a 1-row
    aggregate broadcast back — with exact_percentile=True (default,
    the oracle contract) it is F.percentile, which gathers the gated
    means into one aggregation buffer: exact, but at 10^12 docs pass
    exact_percentile=False to use approx_percentile (same plan shape,
    thresholds approximate — the filter semantics are unchanged).
    Thresholds are rounded to 6dp and the band compares the 4dp-rounded
    means against the rounded thresholds (cross-engine contract)."""
    from llmaix_spark.operators.textstats import repetition_stats

    rep = repetition_stats(docs, id_col, text_col)
    lm = unigram_logprob(docs, id_col, text_col)
    gated = (
        rep.join(lm.select("doc_id", "mean_logprob"), "doc_id")
        .filter(
            (F.col("n_words") >= min_words)
            & (F.col("dup_word_frac") <= max_dup_word_frac)
            & (F.col("top_bigram_frac") <= max_top_bigram_frac)
            & F.col("mean_logprob").isNotNull()
        )
        .localCheckpoint(eager=False)
    )
    pct = (
        (lambda c, p: F.percentile(c, F.lit(p)))
        if exact_percentile
        else (lambda c, p: F.approx_percentile(c, F.lit(p), F.lit(10000)))
    )
    band = gated.agg(
        F.round(pct(F.col("mean_logprob"), lo_pct), 6).alias("lo"),
        F.round(pct(F.col("mean_logprob"), hi_pct), 6).alias("hi"),
    )
    return (
        gated.join(F.broadcast(band))
        .filter(
            (F.col("mean_logprob") >= F.col("lo"))
            & (F.col("mean_logprob") <= F.col("hi"))
        )
        .select(
            "doc_id",
            "n_words",
            "dup_word_frac",
            "top_bigram_frac",
            "mean_logprob",
            split_expr(
                F.col("doc_id"),
                weights or {"train": 0.9, "val": 0.05, "test": 0.05},
            ).alias("split"),
        )
    )


def dsir_importance(
    docs: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR-style hashed importance weights (Data Selection via
    Importance Resampling, Xie et al. 2023 — public method): score each
    raw-corpus document by how target-like its hashed unigram profile
    is — log10 w(x) = Σ_tokens lr(bucket(tok)), where
    lr(b) = log10 p̂_target(b) − log10 p̂_raw(b) under Laplace-α
    smoothing over `n_buckets` hashed features. Data mixing then keeps
    the top-weight documents (deterministic here — no Gumbel noise).
    Returns (doc_id, n_feats, log_weight); token-less docs → NULL.

    Scale: both distribution fits are map-side-combinable groupBys on
    the BUCKET key (≤ n_buckets groups — hash-bucketing flattens the
    Zipf token skew that forced unigram_logprob's two-path join: 'the'
    partial-aggregates into one of n_buckets counters map-side, it
    never crosses an exchange as a key of its own); the log-ratio
    table is ≤ n_buckets rows → broadcast, so scoring is a narrow
    map-side join + one per-doc groupBy — the only corpus exchange.

    Cross-engine contract: bucket = stable_hash60(tok) % n_buckets
    (shared md5 hash), each log10 term rounded to 6dp BEFORE the
    subtraction (identical decimal inputs ⇒ bit-identical doubles ⇒
    bit-identical difference on both engines), per-doc sum rounded to
    4dp — the unigram_logprob rounding discipline."""
    from llmaix_spark.operators.linking import stable_hash60_expr
    from llmaix_spark.operators.textstats import _tokens

    B = int(n_buckets)

    def _bucketed(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(_tokens(F.col(text_col))).alias("tok"),
        ).select(
            "doc_id",
            F.pmod(stable_hash60_expr(F.col("tok")), F.lit(B)).alias("b"),
        )

    # fit + scoring share the raw bucket-instance table (landmine #1)
    raw_b = _bucketed(docs).localCheckpoint(eager=False)
    tgt_counts = (
        _bucketed(target).groupBy("b").agg(F.count(F.lit(1)).alias("ct"))
    )
    raw_counts = raw_b.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    t_tot = tgt_counts.agg(F.sum("ct").alias("tt"))
    r_tot = raw_counts.agg(F.sum("cr").alias("tr"))
    # every scored bucket exists in raw_counts by construction (the
    # scored tokens ARE the raw corpus); target-absent buckets keep
    # the smoothing mass via coalesce(ct, 0)
    lt = F.round(
        F.log10((F.coalesce(F.col("ct"), F.lit(0)) + F.lit(alpha))
                / (F.col("tt") + F.lit(alpha * B))), 6
    )
    lraw = F.round(
        F.log10((F.col("cr") + F.lit(alpha))
                / (F.col("tr") + F.lit(alpha * B))), 6
    )
    # broadcast audit: ratio is ≤ n_buckets rows (caller-bounded
    # constant, never data-scaled) carrying one double each
    ratio = (
        raw_counts.join(tgt_counts, "b", "left")
        .join(F.broadcast(t_tot))
        .join(F.broadcast(r_tot))
        .select("b", (lt - lraw).alias("lr"))
    )
    per_doc = (
        raw_b.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_feats"),
            F.round(F.sum("lr"), 4).alias("log_weight"),
        )
    )
    ids = docs.select(F.col(id_col).alias("doc_id"))
    return ids.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_feats", F.lit(0)).cast("bigint").alias("n_feats"),
        "log_weight",
    )


def build_training_corpus(
    docs: DataFrame,
    benchmark: DataFrame,
    dedup_threshold: float = 0.5,
    dedup_pairs_fn=None,
    contam_n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    **curate_kwargs,
) -> DataFrame:
    """The full training-corpus construction chain in one job — the
    composition a pretraining data pipeline actually ships:

      1. near-dup dedup: connected components over the similarity-pair
         graph, keep one survivor (min id) per group;
      2. benchmark decontamination: drop survivors sharing any word
         `contam_n`-gram with the held-out set;
      3. quality curation: repetition gates + LM-quality percentile
         band + deterministic split (curate_corpus).

    Order matters and is the published order: dedup FIRST (a document
    duplicated 1000× would otherwise dominate the unigram model and
    the percentile band), decontaminate before fitting quality models
    so benchmark text never leaks into the corpus statistics. The
    unigram model and the percentile band are fitted on the CLEANED
    population only.

    Scale: composes dedup_groups (LSH pairs by default), decontaminate
    (hash-keyed join) and curate_corpus — each scale-audited in its own
    docstring; the glue is two survivor semi-joins on doc_id. Returns
    curate_corpus's (doc_id, n_words, dup_word_frac, top_bigram_frac,
    mean_logprob, split)."""
    from llmaix_spark.operators.dedup import dedup_groups

    base = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    groups = dedup_groups(
        base, dedup_threshold, pairs_fn=dedup_pairs_fn
    )
    # lazily materialize the survivor set: decontaminate consumes it
    # twice (shingles + id frame) and its lineage is the whole dedup CC
    # DAG (CLAUDE.md landmine #1 — without the cut the CC re-executes
    # per consumer)
    surv = base.join(
        groups.filter(F.col("keep")).select("doc_id"), "doc_id"
    ).localCheckpoint(eager=False)
    flags = decontaminate(
        surv,
        benchmark.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        ),
        n=contam_n,
    )
    # same for the clean set: curate_corpus scans its input ~5× (word
    # stats, bigram shingles, unigram tokens, id frames)
    clean = surv.join(
        flags.filter(~F.col("contaminated")).select("doc_id"), "doc_id"
    ).localCheckpoint(eager=False)
    return curate_corpus(clean, **curate_kwargs)


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Flag training documents sharing any word n-gram with a held-out
    benchmark set (the standard pretraining decontamination sweep,
    n=8..13 in published pipelines). Returns
    (doc_id, n_shared, contaminated).

    Scale: both sides reduce to 8-byte n-gram hashes before the join —
    the shuffle keys on the hash, the benchmark side is distinct-ed
    first and is typically tiny relative to the corpus (AQE broadcasts
    it when it fits), and the count aggregates map-side. Exact modulo
    60-bit hash collisions, which can only ADD a flag, never miss one."""
    doc_sh = (
        word_shingles(docs, n, id_col, text_col, distinct=False)
        .select("doc_id", stable_hash60_expr(F.col("shingle")).alias("sh_h"))
        .dropDuplicates(["doc_id", "sh_h"])
    )
    bench_sh = (
        word_shingles(benchmark, n, id_col, text_col, distinct=False)
        .select(stable_hash60_expr(F.col("shingle")).alias("sh_h"))
        .distinct()
    )
    shared = (
        doc_sh.join(bench_sh, "sh_h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    ids = docs.select(F.col(id_col).alias("doc_id"))
    return ids.join(shared, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_shared", F.lit(0)).cast("bigint").alias("n_shared"),
        (F.coalesce("n_shared", F.lit(0)) > 0).alias("contaminated"),
    )


def contamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The benchmark-owner's view of contamination (decontaminate is
    the trainer's view): per BENCHMARK document, how many training
    documents share any word n-gram with it and how many distinct
    n-grams leak — the evidence table a contamination writeup reports.
    Returns (bench_doc, n_train_docs, n_shared_grams) for every
    benchmark doc, zeros included.

    Scale: identical join geometry to decontaminate — both sides
    reduce to 8-byte n-gram hashes, the join keys on the hash, and the
    two distinct-counts aggregate on the (tiny) benchmark grain."""
    bench_sh = (
        word_shingles(benchmark, n, id_col, text_col, distinct=False)
        .select(
            F.col("doc_id").alias("bench_doc"),
            stable_hash60_expr(F.col("shingle")).alias("sh_h"),
        )
        .dropDuplicates(["bench_doc", "sh_h"])
    )
    train_sh = (
        word_shingles(docs, n, id_col, text_col, distinct=False)
        .select(
            F.col("doc_id").alias("train_doc"),
            stable_hash60_expr(F.col("shingle")).alias("sh_h"),
        )
        .dropDuplicates(["train_doc", "sh_h"])
    )
    hits = bench_sh.join(train_sh, "sh_h").groupBy("bench_doc").agg(
        F.countDistinct("train_doc").cast("bigint").alias("n_train_docs"),
        F.countDistinct("sh_h").cast("bigint").alias("n_shared_grams"),
    )
    ids = benchmark.select(F.col(id_col).alias("bench_doc"))
    return ids.join(hits, "bench_doc", "left").select(
        "bench_doc",
        F.coalesce("n_train_docs", F.lit(0))
        .cast("bigint")
        .alias("n_train_docs"),
        F.coalesce("n_shared_grams", F.lit(0))
        .cast("bigint")
        .alias("n_shared_grams"),
    )


def domain_mixture(
    docs: DataFrame,
    domain_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mix",
    buckets: int = 1_000_000,
) -> DataFrame:
    """Temperature-based domain re-mixing (T=2, i.e. exponent 0.5 —
    the multilingual-pretraining recipe): target share of domain d is
    sqrt(s_d)/Σ_e sqrt(s_e) where s_d is its natural share, so
    over-represented domains are downsampled toward the flattened
    distribution and the rarest domain keeps rate 1 (downsample-only,
    no duplication). Unlike stratified_sample the per-domain rates are
    COMPUTED from corpus statistics, then applied through the same
    deterministic hash gate (stable under corpus growth, shared
    cross-engine md5 hash).

    sqrt (not pow(x, 0.5)) on both engines — sqrt is IEEE
    correctly-rounded, pow is not guaranteed to be. The keep decision
    thresholds on round(rate·buckets) so an order-of-summation ulp in
    Σ sqrt(s_e) cannot flip a row's fate off-grid.

    Scale: one map-side-combinable count per domain; all rate algebra
    stays on the domain-cardinality DF (crossJoin of one-row broadcast
    aggregates); the corpus itself sees one broadcast join + filter —
    no wide shuffle of the big table.
    """
    # the chained scalar aggregates (tot → w → ws → r → m) each embed
    # this corpus rollup as a subtree — without a materialization the
    # plan scans the corpus ~9× (one per broadcast branch). Checkpoint
    # the domain-cardinality table once; everything downstream is
    # arithmetic over a handful of rows.
    counts = (
        docs.groupBy(F.col(domain_col).alias("domain"))
        .agg(F.count(F.lit(1)).cast("double").alias("n_d"))
        .localCheckpoint(eager=False)
    )
    tot = counts.agg(F.sum("n_d").alias("n_tot"))
    w = counts.crossJoin(F.broadcast(tot)).withColumn(
        "w_raw", F.sqrt(F.col("n_d") / F.col("n_tot"))
    )
    ws = w.agg(F.sum("w_raw").alias("w_sum"))
    r = w.crossJoin(F.broadcast(ws)).withColumn(
        "ratio",
        (F.col("w_raw") / F.col("w_sum")) / (F.col("n_d") / F.col("n_tot")),
    )
    m = r.agg(F.max("ratio").alias("mr"))
    rates = r.crossJoin(F.broadcast(m)).select(
        "domain",
        F.round(F.col("ratio") / F.col("mr") * buckets, 0)
        .cast("bigint")
        .alias("thresh"),
        F.round(F.col("ratio") / F.col("mr"), 6).alias("keep_rate"),
    )
    gate = F.pmod(
        stable_hash60_expr(
            F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))
        ),
        F.lit(buckets),
    )
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(domain_col).alias("domain"),
            gate.alias("_b"),
        )
        .join(F.broadcast(rates), "domain")
        .where(F.col("_b") < F.col("thresh"))
        .select("doc_id", "domain", "keep_rate")
    )


def bpe_pair_counts(
    docs: DataFrame,
    top_k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """The BPE vocabulary-induction inner loop (Sennrich et al. 2016):
    corpus-weighted adjacent character-pair frequencies — the argmax
    pair is the next merge a tokenizer trainer would take. Returns the
    ``top_k`` pairs as (pair, pair_count), deterministically ordered
    by (count DESC, pair ASC) so the cut line never depends on engine
    sort stability.

    Scale: the heavy corpus pass is ONE map-side-combinable word-count
    groupBy; pair expansion then runs over the (tiny) distinct-word
    table, weighted by freq — at 100 TB the distinct vocabulary is
    millions of rows, not trillions, so the quadratic-ish char
    expansion never touches the raw corpus. Single-char words are
    guarded BEFORE sequence() (Spark's sequence(1, 0) DESCENDS —
    repo landmine #3)."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: F.length(t) > 0,
    )
    wf = (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs_arr = F.when(
        F.length("word") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length("word") - 1),
            lambda i: F.col("word").substr(i, F.lit(2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        wf.select("freq", F.explode(pairs_arr).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("freq").cast("bigint").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), F.col("pair"))
        .limit(top_k)
    )


def sample_k_per_group(
    docs: DataFrame,
    k: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "topk",
) -> DataFrame:
    """Exact-size deterministic sample: the ``k`` rows of each group
    whose salted content hash ranks smallest — the eval-set carving
    primitive (stratified_sample/domain_mixture are RATE-based and
    only approximate the requested size; this is exact, and still
    stable under reruns because rank position depends only on each
    row's own hash). Ties are impossible (the hash includes the
    unique id), so the cut line is well-defined.

    Scale: one shuffle on the group key; per-group window state is
    O(1) (a running count). For few groups × huge rows-per-group the
    single-reducer-per-group window is the bottleneck — at that shape
    switch to a two-phase top-k (per-partition k-smallest, then
    merge), which this hash-rank formulation supports unchanged.
    """
    from pyspark.sql import Window

    h = stable_hash60_expr(
        F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))
    )
    w = Window.partitionBy("grp").orderBy(F.col("_h").asc())
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(group_col).alias("grp"),
            h.alias("_h"),
        )
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= k)
        .select("doc_id", "grp", "rk")
    )


def balance_classes(
    df: DataFrame,
    class_col: str,
    id_col: str,
    seed_salt: str = "balance",
) -> DataFrame:
    """Deterministic class rebalancing: undersample every class to the
    size of the smallest one, keeping the rows that sort first by the
    shared 60-bit content hash of (salt || id) — a seeded-but-
    reproducible uniform draw with no RNG state, so the same rows
    survive on any cluster, any partitioning, any engine.

    Plan: one tiny class-count aggregate (min over a group-by,
    broadcast scalar), one rank window PARTITIONED BY class on the
    (hash, id) order — the per-class sort is the balanced-sampling
    analogue of sample_k_per_group and never sees the corpus in one
    task. Emits (id, class, rank) for the kept rows.
    """
    h = stable_hash60_expr(
        F.concat_ws("|", F.lit(seed_salt), F.col(id_col).cast("string"))
    )
    counts = df.groupBy(F.col(class_col)).agg(
        F.count(F.lit(1)).alias("_n")
    )
    min_n = counts.agg(F.min("_n").cast("bigint").alias("min_n"))
    w = Window.partitionBy(class_col).orderBy("_h", id_col)
    ranked = df.select(
        F.col(id_col),
        F.col(class_col),
        h.alias("_h"),
    ).select(
        id_col,
        class_col,
        F.row_number().over(w).cast("bigint").alias("sample_rank"),
    )
    return (
        ranked.crossJoin(F.broadcast(min_n))
        .where(F.col("sample_rank") <= F.col("min_n"))
        .select(id_col, class_col, "sample_rank")
    )
