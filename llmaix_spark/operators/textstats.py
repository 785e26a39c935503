"""Text-analysis operators for training-data pipelines.

All JVM-side column expressions (regexp/array builtins — whole-stage
codegen): language ID (marker-token heuristic), quality scoring
(length/punct/stopword ratios), token counting (whitespace + a BPE-ish
regex) and document fingerprinting (min-hash of word 5-grams,
winnowing-lite). Each is reproducible in ANSI SQL for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from llmaix_spark.operators.linking import stable_hash60_expr

LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "is", "in"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu"],
    "es": ["el", "la", "de", "los", "y", "es", "en"],
    "fr": ["le", "la", "les", "et", "est", "un", "dans"],
}

STOPWORDS = sorted(set(sum(LANG_MARKERS.values(), [])))


def _tokens(col: Column) -> Column:
    return F.filter(
        F.split(F.lower(F.trim(col)), r"\s+"), lambda t: F.length(t) > 0
    )


def token_count_ws(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(_tokens(col))


def token_count_bpe(col: Column) -> Column:
    """BPE-ish token count: word pieces + standalone punctuation (the
    pre-tokenizer regex families used by GPT-style BPEs, simplified)."""
    return F.size(
        # letter ranges exclude U+00D7 (×) and U+00F7 (÷) like standard
        # Latin-1 letter classes, so 'a×b' counts as 3 tokens, not 1;
        # the SQL oracle (queries.py) carries the identical class
        F.regexp_extract_all(col, F.lit(r"[A-Za-zÀ-ÖØ-öø-ÿ]+|[0-9]+|[^\sA-Za-zÀ-ÖØ-öø-ÿ0-9]"), 0)
    )


def _marker_hits(col: Column, markers: list[str]) -> Column:
    return F.size(F.filter(_tokens(col), lambda t: t.isin(markers)))


def lang_scores(col: Column) -> dict[str, Column]:
    return {lang: _marker_hits(col, ms) for lang, ms in LANG_MARKERS.items()}


def lang_id_expr(col: Column) -> Column:
    """Argmax of marker-token hits with fixed priority order en>de>es>fr
    on ties; 'und' (undetermined) when no marker appears."""
    scores = lang_scores(col)
    best = F.greatest(*scores.values())
    out = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):  # earlier langs win ties
        out = F.when(
            (scores[lang] == best) & (best > 0), F.lit(lang)
        ).otherwise(out)
    return out


def punct_ratio(col: Column) -> Column:
    n_punct = F.length(F.regexp_replace(col, r"[^.,!?;:]", ""))
    return n_punct / F.greatest(F.length(col), F.lit(1))


def stopword_ratio(col: Column) -> Column:
    toks = _tokens(col)
    hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def mean_word_len(col: Column) -> Column:
    toks = _tokens(col)
    total = F.aggregate(
        toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
    )
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score_expr(col: Column) -> Column:
    """Composite [0,1] quality score: length band + word-shape + stopword
    presence — the reference's 'is this report usable' gate
    (webapp/llm_processing/utils.py:147-169 empty-predicate) widened into
    a graded signal for corpus filtering."""
    n = F.length(col)
    len_score = F.when(n < 20, n / 20.0).when(n > 2000, F.lit(0.5)).otherwise(F.lit(1.0))
    wl = mean_word_len(col)
    shape_score = F.when((wl >= 2.5) & (wl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.5))
    sw = stopword_ratio(col)
    sw_score = F.when(sw > 0.0, F.lit(1.0)).otherwise(F.lit(0.6))
    return F.round((len_score + shape_score + sw_score) / 3.0, 6)


def ngram_hash_array(text_col, n: int):
    """60-bit rolling-hash word n-grams as an array Column (one hash
    per n-gram position, document order preserved). Each TOKEN is
    md5-hashed once, the n-gram hash is the rotate-XOR composition of
    its n token hashes — n× fewer md5 evaluations than hashing shingle
    strings and no string materialization at all. Shared by
    doc_fingerprint and dedup.dup_ngram_spans; the SQL twin is
    queries._fingerprint_sql's gram expression."""
    toks = F.filter(
        F.split(F.trim(text_col), r"\s+"), lambda t: F.length(t) > 0
    )
    th = F.transform(toks, lambda t: stable_hash60_expr(t))

    def rot(col, k: int):
        # mask BEFORE shifting: (x & 2^(60-k)-1) << k never exceeds 2^60,
        # so checked-arithmetic engines (DuckDB) don't overflow and the
        # result is identical to (x << k) & mask
        low = col.bitwiseAND(F.lit((1 << (60 - k)) - 1))
        return F.shiftleft(low, k).bitwiseOR(F.shiftright(col, 60 - k))

    def gram(arr, i):
        g = None
        for j in range(n):
            term = rot(F.element_at(arr, i + F.lit(j + 1)), 7 * j)
            g = term if g is None else g.bitwiseXOR(term)
        return g

    # bind the token-hash array ONCE as a lambda variable: referencing the
    # raw `th` expression inside the gram lambda would re-evaluate the
    # whole md5 transform for every element_at (observed 12× slowdown)
    return F.element_at(
        F.transform(
            F.array(th),
            lambda arr: F.when(
                F.size(arr) >= n,
                F.transform(
                    F.sequence(F.lit(0), F.size(arr) - n),
                    lambda i: gram(arr, i),
                ),
            ).otherwise(F.array().cast("array<bigint>")),
        ),
        1,
    )


def doc_fingerprint(
    docs: DataFrame, n: int = 5, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Winnowing-lite fingerprint: min/max/count-distinct of 60-bit hashes
    over word n-grams. Two docs sharing fp_min almost surely share a
    passage — the cheap first-pass dup blocker. Dedup is
    count(DISTINCT hash) inside the aggregation (8-byte shuffle, 2⁻⁶⁰
    collision odds, bit-identical in the SQL oracle)."""
    # fully narrow (r6): the stats are per-doc over the doc's own gram
    # array, so explode + shuffle + groupBy is pure overhead — array_min/
    # array_max/size(array_distinct) compute them in place, zero
    # exchanges. The size()>=1 filter reproduces explode's semantics
    # (docs with no grams emit no row).
    grams = ngram_hash_array(F.col(text_col), n)
    return (
        docs.select(F.col(id_col).alias("doc_id"), grams.alias("_g"))
        .where(F.size("_g") >= 1)
        .select(
            "doc_id",
            F.array_min("_g").alias("fp_min"),
            F.array_max("_g").alias("fp_max"),
            F.size(F.array_distinct("_g")).cast("long").alias("fp_n"),
        )
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality signals per document (the
    published pretraining filter family: drop documents dominated by
    repeated tokens / n-grams). Returns
    (doc_id, n_words, n_distinct_words, dup_word_frac, top_bigram_frac):

      dup_word_frac   = 1 - distinct_words / words
      top_bigram_frac = occurrences of the most frequent word bigram
                        / total bigram positions (words - 1)

    Both NULL-safe (0 when the doc has too few words). Scale: one
    explode + two map-side-combinable aggregations keyed on
    (doc_id[, bigram]) — shuffle rows are (id, 8-byte-ish) pairs, no
    driver state, no window."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_tokens(F.col(text_col))).alias("tok"),
    )
    word_agg = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.countDistinct("tok").alias("n_distinct_words"),
    )
    # bigrams via the shared shingle builder (bind_array inside — the
    # token array is never re-evaluated per element); NOT lowercased,
    # matching the dedup shingle convention — word counts above use the
    # lowercased token stream. The driver oracle mirrors each side under
    # the testdata's single-spaced-text precondition (its SQL splits on
    # ' ', this operator on \s+ — see SQL_QUALITY_REPETITION note)
    from llmaix_spark.operators.dedup import word_shingles

    bi = word_shingles(docs, 2, id_col, text_col, distinct=False)
    top_bi = (
        bi.groupBy("doc_id", "shingle")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram_n"))
    )
    ids = docs.select(F.col(id_col).alias("doc_id"))
    out = (
        ids.join(word_agg, "doc_id", "left")
        .join(top_bi, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0)).cast("bigint").alias("n_words"),
            F.coalesce("n_distinct_words", F.lit(0))
            .cast("bigint")
            .alias("n_distinct_words"),
            F.round(
                F.coalesce(
                    F.lit(1.0)
                    - F.try_divide(
                        F.col("n_distinct_words"), F.col("n_words")
                    ),
                    F.lit(0.0),
                ),
                6,
            ).alias("dup_word_frac"),
            F.round(
                F.coalesce(
                    F.try_divide(
                        F.col("top_bigram_n"), F.col("n_words") - 1
                    ),
                    F.lit(0.0),
                ),
                6,
            ).alias("top_bigram_frac"),
        )
    )
    return out


def token_entropy(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Shannon entropy of the token histogram (bits) — the
    third standard repetition/quality signal next to dup_word_frac and
    top_bigram_frac: near-zero entropy = one token repeated (spam),
    log2(n_words) = all tokens distinct. Returns
    (doc_id, n_words, entropy); tokenless docs score NULL entropy.

    Scale: one (doc_id, tok) groupBy (map-side combinable) and one
    doc_id groupBy — both narrow-keyed, no windows, no driver state.
    Cross-engine contract: each -p·log2(p) term is rounded to 8dp
    before the sum, the sum to 4dp (float addition is order-dependent;
    rounding absorbs the ulp noise exactly as unigram_logprob's mean
    does)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_tokens(F.col(text_col))).alias("tok"),
    )
    # 2 consumers (n_words rollup + the entropy terms join) — checkpoint
    # or the corpus explode + groupBy re-executes per branch
    tc = (
        toks.groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    # the single-pass identity H = log2(n) − (Σ c·log2(c))/n would save
    # the join, but loses the per-term rounding contract — keep the
    # explicit two-step form (tc is doc-distinct-token-sized, narrow)
    per_doc = tc.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_words")
    )
    terms = tc.join(per_doc, "doc_id").select(
        "doc_id",
        "n_words",
        F.round(
            -(F.col("c") / F.col("n_words"))
            * F.log2(F.col("c") / F.col("n_words")),
            8,
        ).alias("term"),
    )
    ent = terms.groupBy("doc_id", "n_words").agg(
        F.round(F.sum("term"), 4).alias("entropy")
    )
    ids = docs.select(F.col(id_col).alias("doc_id"))
    return ids.join(ent, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_words", F.lit(0)).cast("bigint").alias("n_words"),
        "entropy",
    )


def text_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One narrow pass emitting all per-doc stats."""
    c = F.col(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(c).alias("n_chars"),
        token_count_ws(c).alias("n_tokens_ws"),
        token_count_bpe(c).alias("n_tokens_bpe"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
        F.round(stopword_ratio(c), 6).alias("stopword_ratio"),
        F.round(mean_word_len(c), 6).alias("mean_word_len"),
        lang_id_expr(c).alias("lang_pred"),
        quality_score_expr(c).alias("quality"),
    )


def tfidf_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The shared TF-IDF scored table (doc_id, term, tf, score):
    score = round(tf · ln(N/df), 6). tf is one map-side-combinable
    groupBy over the exploded corpus; df aggregates the
    already-unique tf table (no second corpus pass); N rides a 1-row
    broadcast crossJoin. Consumers: tfidf_top_terms, search_rank."""
    tf = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(_tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        # 2 consumers (df rollup + the idf join) — checkpoint or the
        # corpus explode + groupBy re-executes per branch
        .localCheckpoint(eager=False)
    )
    df_tbl = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    n = docs.select(
        F.count(F.lit(1)).cast("double").alias("n_docs")
    )
    return (
        tf.join(df_tbl, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("score"),
        )
    )


def search_rank(
    docs: DataFrame,
    terms: list[str],
    top_k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keyword AND-search with TF-IDF ranking: documents containing
    EVERY query term, ranked by the summed per-term score, top-k with
    a (score desc, doc_id) total order.

    Plan shape: the scored table filters to the query terms FIRST
    (an isin over a literal list — pushed into the tf aggregation's
    probe side), the AND-semantics fall out of count(*) == len(terms)
    on the per-doc aggregate, and the global top-k is orderBy+limit —
    Catalyst plans TakeOrderedAndProject (per-partition heaps + a
    driver merge of k rows), NEVER a global sort. The rank column is
    attached by a window over the ALREADY-LIMITED k rows.
    """
    if not terms:
        raise ValueError("search_rank needs at least one term")
    uniq = sorted(set(terms))
    scored = tfidf_scores(docs, id_col, text_col)
    hits = (
        scored.where(F.col("term").isin(uniq))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.round(F.sum("score"), 6).alias("score"),
        )
        .where(F.col("n_terms") == len(uniq))
        .select("doc_id", "score")
    )
    top = hits.orderBy(F.desc("score"), F.asc("doc_id")).limit(top_k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    # single-partition window is fine HERE: it sees only the k
    # already-limited rows, never the corpus
    return top.select(
        F.row_number().over(w).cast("bigint").alias("rank"),
        "doc_id",
        "score",
    )


def tfidf_top_terms(
    docs: DataFrame,
    top_k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Classic TF-IDF keyword extraction: per document, the ``top_k``
    terms by tf·ln(N/df), tie-broken lexicographically. Score is
    ROUNDED to 6dp before ranking so rank boundaries are identical
    across engines (repo oracle rule: threshold on the rounded value).

    Plan: tf = one map-side-combinable groupBy(doc, word) over the
    exploded corpus; df = groupBy(word) over the ALREADY-AGGREGATED tf
    table (rows are unique per (doc, word), so count(*) == document
    frequency — no second corpus pass); N rides a 1-row broadcast
    cross join. The idf join keys on word — a Zipf-skewed key, but the
    probe side is the tf table (≤ one row per doc·word) and AQE's
    skew-join split handles a stopword's partition at scale; the final
    per-doc top-k window partitions on doc_id (doc-bounded state).
    """
    scored = tfidf_scores(docs, id_col, text_col)
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= top_k)
        .select("doc_id", "rank", "term", "tf", "score")
    )


def search_phrase(
    docs: DataFrame,
    phrase: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase search over the positional token index: documents
    containing the terms of ``phrase`` CONSECUTIVELY, with occurrence
    counts — the positional-index query an AND-of-terms search
    (search_rank) cannot answer.

    Plan: ONE corpus scan builds the positional index already filtered
    to the phrase's term set (the isin prunes inside the explode
    stage), and that small posting-list table is localCheckpointed —
    every phrase slot then reads the materialized postings instead of
    re-scanning the corpus (without it Catalyst re-derives the explode
    per join branch: N corpus scans for an N-term phrase). Slot i
    joins on (doc, pos₀+i) — narrow equi-joins on (doc, pos), the
    classic inverted-index adjacency merge. Occurrences can overlap
    ("a a a" contains "a a" twice); counting is one map-side-
    combinable groupBy on doc.
    """
    if len(phrase) < 2:
        raise ValueError("search_phrase needs at least two terms")
    tok = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("pos", "term"),
        )
        .where(F.col("term").isin(sorted(set(phrase))))
        .localCheckpoint(eager=False)  # consumers: one per phrase slot
    )
    cur = (
        tok.where(F.col("term") == phrase[0])
        .select("doc_id", F.col("pos").alias("p0"))
    )
    for i, term in enumerate(phrase[1:], 1):
        nxt = tok.where(F.col("term") == term).select(
            "doc_id", (F.col("pos") - i).alias("p0")
        )
        cur = cur.join(nxt, ["doc_id", "p0"])
    return cur.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occ")
    )


def bm25_rank(
    docs: DataFrame,
    terms: list[str],
    top_k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25-ranked keyword AND-search (Robertson/Spärck Jones) — the
    length-normalized successor of search_rank's TF-IDF: documents
    containing EVERY query term ranked by
    Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b + b·dl/avgdl)), top-k.

    Cross-engine determinism: idf is the Lucene-style always-positive
    log10(1 + (N-df+0.5)/(df+0.5)) (the raw Robertson idf goes negative
    past df > N/2 and inverts the tf preference) PRE-ROUNDED at 6dp before entering the product
    (the drift_psi recipe — transcendentals are the only non-portable
    IEEE ops); the tf-normalization chain is pure +,*,/ on identical
    doubles with the oracle mirroring the exact parenthesization; each
    per-term score is rounded at 6dp and the per-doc total folds the
    term scores IN TERM ORDER (aggregate over an array_sort'ed
    collect_list — float addition only commutes pairwise, a plain
    sum() would be partition-order-dependent at ≥3 terms).

    Plan shape: tf and dl both derive from ONE exploded-corpus
    aggregate (dl = Σ tf re-aggregated from the tf table, no second
    scan); df and avgdl are tiny broadcast sides; the final cut is
    TakeOrderedAndProject on (rounded score DESC, doc_id).
    """
    if not terms:
        raise ValueError("bm25_rank needs at least one term")
    uniq = sorted(set(terms))
    tf = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(_tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        .localCheckpoint(eager=False)  # consumers: dl, df, query hits
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("bigint").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (
            F.sum("dl").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
    )
    df_tbl = (
        tf.where(F.col("term").isin(uniq))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    )
    idf6 = F.round(
        F.log10(
            F.lit(1.0)
            + (F.col("n_docs").cast("double") - F.col("df").cast("double")
               + F.lit(0.5))
            / (F.col("df").cast("double") + F.lit(0.5))
        ),
        6,
    )
    hits = (
        tf.where(F.col("term").isin(uniq))
        .join(F.broadcast(df_tbl), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    tfnorm = (
        F.col("tf").cast("double") * F.lit(k1 + 1.0)
    ) / (
        F.col("tf").cast("double")
        + F.lit(k1)
        * (
            F.lit(1.0 - b)
            + F.lit(b) * F.col("dl").cast("double") / F.col("avgdl")
        )
    )
    scored = hits.select(
        "doc_id",
        "term",
        F.round(idf6 * tfnorm, 6).alias("tscore"),
    )
    per_doc = (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.expr(
                "round(aggregate(array_sort(collect_list("
                "struct(term, tscore))), CAST(0.0 AS DOUBLE), "
                "(a, x) -> a + x.tscore), 6)"
            ).alias("score"),
        )
        .where(F.col("n_terms") == len(uniq))
        .select("doc_id", "score")
    )
    top = per_doc.orderBy(F.desc("score"), F.asc("doc_id")).limit(top_k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    # single-partition window is fine HERE: it sees only the k rows
    return top.select(
        F.row_number().over(w).cast("bigint").alias("rank"),
        "doc_id",
        "score",
    )
