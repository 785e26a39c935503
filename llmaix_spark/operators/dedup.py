"""Deduplication operators for training-data pipelines.

Five strategies over a `documents(doc_id, text, ...)` table, each pure
DataFrame API (JVM-side hashing via md5/conv — shared bit-for-bit with the
DuckDB oracle):

  exact_dedup          hash-groupBy on normalized text          1 shuffle
  ngram_jaccard_pairs  exact all-pairs jaccard via shingle join (small SF
                       oracle path; quadratic in dup-cluster size only)
  minhash_dedup_pairs  MinHash + banded LSH → candidates → exact-jaccard
                       verify (the 100 TB path: shuffles only on shingle /
                       band keys, never all-pairs)
  simhash              32-bit SimHash per doc + banded hamming pairs
  embedding_dup_pairs  cosine near-dup over array<float> embeddings

Design note for scale: every pairing operator keys its shuffles on
content-derived values (shingle, band, byte) so co-occurrence is local;
`distinct()` before verification collapses multi-band collisions; AQE
skew-join handles pathological shingles (stopword-only docs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from llmaix_spark.operators.linking import _MINHASH_AB, _P, stable_hash60_expr


def _norm_text(col):
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup on normalized text: one map-side-combinable groupBy.
    Returns (keep_id, n_dups) — survivor is min id per content group."""
    return (
        docs.groupBy(_norm_text(F.col(text_col)).alias("_norm"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
        .select("keep_id", "n_dups")
    )


def dedup_lines(
    lines: DataFrame,
    min_repeat: int = 2,
    id_col: str = "doc_id",
    idx_col: str = "line_idx",
    line_col: str = "line",
    sep: str = "\n",
) -> DataFrame:
    """Cross-document LINE-level dedup — the C4/CCNet boilerplate step
    (C4 drops repeated lines corpus-wide keeping the first occurrence;
    CCNet dedups paragraphs by hash): a line's FIRST occurrence
    (minimal (doc_id, line_idx)) always survives; later occurrences
    survive only while the line appears in fewer than `min_repeat`
    distinct documents. Returns (doc_id, text) rebuilt from the
    surviving lines in original order — documents whose every line was
    boilerplate come back with '' (they stay joinable, the caller
    decides whether an empty doc is droppable).

    Input is the exploded (doc_id, line_idx, line) table — splitting
    is corpus-specific (newlines, sentence windows, fixed word
    chunks), so the operator takes the lines, not the raw text. NULL
    lines are splitter artifacts, not content: they are dropped before
    grouping (md5(NULL) is NULL and would silently vanish in the hash
    equi-join anyway — review finding; pass '' for an intentional
    blank line, it hashes and dedups like any other), but their docs
    still appear in the output (via the pre-filter id set).

    Scale: lines reduce to 8-byte content hashes; ONE
    map-side-combinable groupBy per hash carries (n_docs,
    first_occurrence = min(struct(doc_id, line_idx)) — both partial-
    aggregable, so a boilerplate line appearing in 10⁹ docs combines
    map-side and never concentrates on a reducer as raw rows); the
    per-hash verdict table joins back on the hash (AQE handles the
    residual skew of the join itself) and the doc rebuild is a groupBy
    with array_sort(collect_list(struct)) — per-doc state, line-count
    bounded, no window over the corpus. `keyed` is lazily
    localCheckpointed: three consumers (stats aggregate, join probe
    side, the id set) would otherwise re-run the caller's scan +
    explode 3× (landmine #1)."""
    h = stable_hash60_expr(F.col(line_col)).alias("_h")
    keyed = lines.select(
        F.col(id_col).alias("doc_id"),
        F.col(idx_col).alias("line_idx"),
        F.col(line_col).alias("line"),
        h,
    ).localCheckpoint(eager=False)
    ids = keyed.select("doc_id").distinct()
    keyed = keyed.filter(F.col("line").isNotNull())
    stats = keyed.groupBy("_h").agg(
        F.countDistinct("doc_id").alias("_nd"),
        F.min(F.struct("doc_id", "line_idx")).alias("_first"),
    )
    kept = keyed.join(stats, "_h").filter(
        (F.col("_nd") < min_repeat)
        | (
            (F.col("doc_id") == F.col("_first.doc_id"))
            & (F.col("line_idx") == F.col("_first.line_idx"))
        )
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_idx", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias("text")
    )
    return ids.join(rebuilt, "doc_id", "left").select(
        "doc_id", F.coalesce("text", F.lit("")).alias("text")
    )


def word_shingles(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    distinct: bool = True,
) -> DataFrame:
    """Word n-gram shingles per doc via posexplode + window-free slide
    (built with transform over token index — no Python). distinct=False
    skips the dedup shuffle for consumers that dedup later on the (much
    cheaper) 8-byte shingle hash instead of the string."""
    from llmaix_spark.functions.arrays import bind_array

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # NB: Spark's sequence(0, -1) DESCENDS — guard short docs explicitly.
    # bind_array: element_at on the raw split() expr would re-split the
    # text per access (see functions/arrays.py).
    sh = bind_array(
        toks,
        lambda t: F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(t) - n),
                lambda i: F.concat_ws(
                    " ",
                    *[F.element_at(t, i + F.lit(j + 1)) for j in range(n)],
                ),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    out = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(sh).alias("shingle")
    )
    return out.distinct() if distinct else out


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact n-gram Jaccard similarity join: explode shingles, join on
    shingle, count common, filter J ≥ threshold. Returns
    (doc_a, doc_b, jaccard). This is the *exact* (oracle-checkable)
    variant; use minhash_dedup_pairs at scale."""
    # three consumers (count + both join sides) — materialize or the
    # explode runs 3×; lazy localCheckpoint is GC-released (landmine #1)
    sh = word_shingles(docs, n, id_col, text_col).localCheckpoint(eager=False)
    cnt = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ca = cnt.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    cb = cnt.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    j = (
        common.join(ca, "doc_a")
        .join(cb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")
    )


def containment_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Asymmetric n-gram *containment* join: C(A→B) = |A∩B| / |A| over
    distinct word shingles. Jaccard misses superstring duplicates — a
    short doc fully embedded in a much longer one has J ≈ |A|/|B| → 0
    but C(A→B) = 1 — which is exactly the boilerplate/quote-inclusion
    case a training-data dedup pass must catch (the reference's dedup
    surface is symmetric-only; this extends it). Returns
    (doc_a, doc_b, n_common, containment_a, containment_b) for pairs
    where EITHER direction ≥ threshold, thresholded on the rounded
    value so both engines agree at the boundary.

    Scale note: like ngram_jaccard_pairs this is the exact
    (oracle-checkable) variant — the shingle equi-join only pairs docs
    sharing a shingle, but a stop-shingle could still fan out; at scale
    feed LSH candidates (minhash bands bound containment from below by
    J ≥ C·|A|/(|A|+|B|)) or df-cap the shingle join."""
    sh = word_shingles(docs, n, id_col, text_col).localCheckpoint(eager=False)
    cnt = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    ca = cnt.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    cb = cnt.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    j = (
        common.join(ca, "doc_a")
        .join(cb, "doc_b")
        .withColumn(
            "containment_a",
            F.round(F.col("n_common") / F.col("n_a"), 6),
        )
        .withColumn(
            "containment_b",
            F.round(F.col("n_common") / F.col("n_b"), 6),
        )
    )
    return j.filter(
        F.greatest("containment_a", "containment_b") >= threshold
    ).select("doc_a", "doc_b", "n_common", "containment_a", "containment_b")


def jaccard_prefix_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Prefix-filtered EXACT Jaccard self-join (PPJoin-family).

    Same output contract as ngram_jaccard_pairs — every pair with
    J ≥ threshold, no false negatives — but candidates come only from a
    join on each record's *prefix* tokens instead of all tokens.

    Prefix-filtering principle (Chaudhuri et al. 2006 / Xiao et al.
    PPJoin): order every record's shingle set by one GLOBAL total order
    (ascending document frequency, ties by shingle — rarest first) and
    keep the first ``|x| - ceil(t*|x|) + 1`` shingles. For any pair with
    J ≥ t the overlap is ≥ ceil(t/(1+t)·(|x|+|y|)) ≥ ceil(t·max(|x|,|y|)),
    which exceeds both records' skipped-suffix sizes, so the two prefixes
    must share a shingle. Joining on prefix shingles therefore finds
    every qualifying pair; exact verification then removes false
    positives — the result is bit-identical to the all-pairs join.

    Scale notes (100 TB): the candidate join keys on the RAREST shingles
    of each record (ascending-df order), so bucket sizes are the inverse
    of the frequency skew — stopword shingles never become join keys
    unless a record consists of nothing else. Prefix size is ~(1-t)·|x|,
    so exchange volume is a (1-t) fraction of the full shingle table,
    and the per-record window partitions by doc_id (bounded by document
    length, never corpus-wide). The length filter (t·|x| ≤ |y| ≤ |x|/t)
    prunes candidates before the verify join.
    """
    sh = (
        word_shingles(docs, n, id_col, text_col)
        .select("doc_id", "shingle")
        .localCheckpoint(eager=False)  # 3 consumers: freq, verify a/b
    )
    from pyspark.sql import Window

    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    # global canonical order: (df asc, shingle asc) is total, so every
    # record ranks its shingles identically
    w = Window.partitionBy("doc_id").orderBy("df", "shingle")
    wn = Window.partitionBy("doc_id")
    ranked = (
        sh.join(freq, "shingle")
        .select(
            "doc_id",
            "shingle",
            F.row_number().over(w).alias("pos"),
            F.count(F.lit(1)).over(wn).alias("n_sh"),
        )
    )
    # round before ceil: float dust on t*n must not shorten the prefix
    # (ceil(7.0000000000000009) = 8 would skip a required token)
    alpha = F.ceil(F.round(F.lit(threshold) * F.col("n_sh"), 9))
    # both sides of the candidate self-join consume the prefix table —
    # materialize it once or the freq join + two Windows run twice
    prefix = ranked.filter(
        F.col("pos") <= F.col("n_sh") - alpha + 1
    ).localCheckpoint(eager=False)
    a = prefix.alias("a")
    b = prefix.alias("b")
    t = F.lit(threshold)
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # length filter — implied by J >= t, prunes before verify
            & (F.col("b.n_sh") >= t * F.col("a.n_sh"))
            & (F.col("a.n_sh") >= t * F.col("b.n_sh")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # Verify shape note (r6): an array_intersect variant (collect each
    # doc's shingle set, join onto cand) was measured 2× SLOWER here —
    # ~409k candidate rows × two ~2 KB STRING arrays is a heavier
    # payload than the exploded narrow join it replaced. It wins only
    # for 8-byte hash sets (see minhash_dedup_pairs); the string-exact
    # contract here keeps the exploded join.
    cnt = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    j = (
        common.join(
            cnt.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")),
            "doc_a",
        )
        .join(
            cnt.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")
    )


def doc_minhash_signatures(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """MinHash over word shingles, same 16 hash fns as entity linking.
    Pass `shingles` (doc_id, shingle) to reuse an already-materialized
    shingle table — minhash_dedup_pairs does, so the signature scheme
    lives in exactly one place."""
    sh = (
        shingles
        if shingles is not None
        else word_shingles(docs, n, id_col, text_col)
    )
    # accept either a (doc_id, shingle) string table or a pre-hashed
    # (doc_id, sh_h) table — the signature scheme is identical (sh_h IS
    # stable_hash60(shingle), the value this expression consumes)
    base = (
        F.col("sh_h")
        if "sh_h" in sh.columns
        else stable_hash60_expr(F.col("shingle"))
    )
    # reduce the (md5-derived) base hash ONCE per shingle in its own
    # projection: embedding it in all 16 hash-fn columns leaves 16
    # copies of the md5 chain in the plan
    pre = sh.select("doc_id", (base % F.lit(_P)).alias("_hp"))
    h = F.col("_hp")
    hashed = pre.select(
        "doc_id",
        *[
            ((F.lit(a) * h + F.lit(b)) % F.lit(_P)).alias(f"h{i}")
            for i, (a, b) in enumerate(_MINHASH_AB)
        ],
    )
    agg = hashed.groupBy("doc_id").agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(len(_MINHASH_AB))]
    )
    return agg


def minhash_dedup_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    bands: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash+LSH candidate generation, exact-jaccard verification.

    The scale path: candidates come only from band-bucket collisions
    (shuffle on band value), then the exact jaccard of the *candidate
    pairs only* is computed — never all pairs. Output schema matches
    ngram_jaccard_pairs; at J ≥ 0.5 with b=8/r=2 pair-recall ≥ 0.98.
    """
    k = len(_MINHASH_AB)
    rows = k // bands
    # the shingle table feeds three consumers (signatures + both sides of
    # the verification join) — materialize it or the explode runs 3×.
    # localCheckpoint (lazy) instead of persist(): the checkpointed RDD is
    # released by the ContextCleaner when the returned DataFrame goes out
    # of scope, so repeated calls don't leak caches (a bare persist() here
    # outlives every call — CLAUDE.md landmine #1).
    #
    # The table carries the 8-byte shingle HASH, not the string: the
    # per-doc dedup shuffle and the verification join both key on sh_h,
    # cutting exchange bytes ~5× vs ~40-char shingle strings (round-2
    # verdict item 6). Signatures are unchanged (they always consumed
    # stable_hash60(shingle)); n_common/jaccard are exact modulo 60-bit
    # hash collisions inside a candidate pair (~1e-13 per doc — and a
    # collision can only LOWER a jaccard, never create a false pair).
    sh_cached = (
        word_shingles(docs, n, id_col, text_col, distinct=False)
        .select(
            "doc_id", stable_hash60_expr(F.col("shingle")).alias("sh_h")
        )
        .dropDuplicates(["doc_id", "sh_h"])
        .localCheckpoint(eager=False)
    )
    sigs = doc_minhash_signatures(docs, n, id_col, text_col, shingles=sh_cached)
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        *[
                            F.col(f"h{b * rows + r}").cast("string")
                            for r in range(rows)
                        ],
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # exact verify on per-doc 8-byte-hash SETS: |A∩B| via array_intersect
    # per candidate row instead of the exploded cand ⋈ sh ⋈ sh → groupBy
    # (which shuffles |cand|·|doc| rows). Sets are per-doc bounded; the
    # arrays move once to meet the candidate pairs — guide §3.3.
    sets = sh_cached.groupBy("doc_id").agg(
        F.collect_list("sh_h").alias("_set")
    )
    j = (
        cand.join(
            sets.select(
                F.col("doc_id").alias("doc_a"), F.col("_set").alias("_sa")
            ),
            "doc_a",
        )
        .join(
            sets.select(
                F.col("doc_id").alias("doc_b"), F.col("_set").alias("_sb")
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("_sa", "_sb")).alias("n_common"),
            F.size("_sa").alias("n_a"),
            F.size("_sb").alias("n_b"),
        )
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")
    )


def containment_pairs_lsh(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    bands: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Containment scoring over banded-LSH candidates — the bounded
    companion to the exact containment_pairs: candidates come from the
    same MinHash band buckets as minhash_dedup_pairs (never all pairs,
    never an uncapped shingle fan-out), then the exact containment of
    the candidate pairs only is computed on 8-byte shingle hashes.

    Recall caveat (documented, inherent): MinHash estimates JACCARD, so
    a short-in-long pair with high containment but tiny Jaccard can
    miss the band buckets; at J ≥ 0.5 pair-recall is ≥ 0.98, below
    that it decays. The exact operator is the oracle baseline; a true
    containment index at scale is LSH Ensemble (Zhu et al., VLDB 2016)
    — partition by set size, re-tune bands per partition — which this
    function's band stage is the building block for."""
    sh_cached = (
        word_shingles(docs, n, id_col, text_col, distinct=False)
        .select(
            "doc_id", stable_hash60_expr(F.col("shingle")).alias("sh_h")
        )
        .dropDuplicates(["doc_id", "sh_h"])
        .localCheckpoint(eager=False)
    )
    k = len(_MINHASH_AB)
    rows = k // bands
    sigs = doc_minhash_signatures(
        docs, n, id_col, text_col, shingles=sh_cached
    )
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        *[
                            F.col(f"h{b * rows + r}").cast("string")
                            for r in range(rows)
                        ],
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    cnt = sh_cached.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sa = sh_cached.select(F.col("doc_id").alias("doc_a"), F.col("sh_h"))
    sb = sh_cached.select(F.col("doc_id").alias("doc_b"), F.col("sh_h"))
    common = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "sh_h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    j = (
        common.join(
            cnt.select(
                F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")
            ),
            "doc_a",
        )
        .join(
            cnt.select(
                F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")
            ),
            "doc_b",
        )
        .withColumn(
            "containment_a", F.round(F.col("n_common") / F.col("n_a"), 6)
        )
        .withColumn(
            "containment_b", F.round(F.col("n_common") / F.col("n_b"), 6)
        )
    )
    return j.filter(
        F.greatest("containment_a", "containment_b") >= threshold
    ).select("doc_a", "doc_b", "n_common", "containment_a", "containment_b")


def lsh_candidate_pairs(
    docs: DataFrame,
    n: int = 3,
    bands: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Banded-LSH candidate generation ONLY — the blocking stage of
    minhash_dedup_pairs without the exact-jaccard verification, exposed
    so blocking quality (reduction ratio / pair completeness) can be
    measured against the exhaustive pair set. Same signature scheme and
    banding as minhash_dedup_pairs (b=8, r=2 over the 16 shared hash
    fns); returns distinct (doc_a, doc_b) with doc_a < doc_b."""
    k = len(_MINHASH_AB)
    rows = k // bands
    sigs = doc_minhash_signatures(docs, n, id_col, text_col)
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        *[
                            F.col(f"h{b * rows + r}").cast("string")
                            for r in range(rows)
                        ],
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )


def dedup_groups(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    pairs_fn=None,
) -> DataFrame:
    """Near-dup *clustering*: connected components over the jaccard-pair
    graph → (doc_id, group_id, keep). group_id = min doc id in the
    component; keep marks the survivor. Reuses the canonicalization CC
    (size-adaptive driver/iterative), so the same machinery that merges
    entity surfaces dedups documents.

    `pairs_fn` defaults to the banded-LSH generator — the 100 TB path
    (shuffles on shingle/band keys, candidate pairs only). Pass
    `ngram_jaccard_pairs` explicitly for the exact all-shared-shingle
    variant (the small-SF oracle path: quadratic inside any group sharing
    one hot shingle, so never the default at scale)."""
    from llmaix_spark.operators.canonicalize import connected_components

    pairs_fn = pairs_fn or minhash_dedup_pairs
    pairs = pairs_fn(docs, threshold, n, id_col=id_col, text_col=text_col)
    # CC picks the lexicographic min — encode ids as zero-padded 20-digit
    # strings of (id + 2^63), computed in DECIMAL(20,0) so the full int64
    # range round-trips: string order == numeric order for NEGATIVE ids
    # too (a bare lpad of '-123' can't cast back and the assignment join
    # silently dropped those docs), and 20 digits hold 2^64-1 so nothing
    # truncates (lpad silently truncates overlong input — at 12 chars the
    # 19-digit stable_hash60 ids would collide).
    off = F.lit("9223372036854775808").cast("decimal(20,0)")  # 2^63
    pad = lambda c: F.lpad(  # noqa: E731
        (F.col(c).cast("decimal(20,0)") + off)
        .cast("decimal(20,0)")
        .cast("string"),
        20,
        "0",
    )
    edges = pairs.select(
        pad("doc_a").alias("norm_a"), pad("doc_b").alias("norm_b")
    )
    cc = connected_components(edges)
    unpad = lambda c: (  # noqa: E731
        F.col(c).cast("decimal(21,0)") - off
    ).cast("bigint")
    ids = docs.select(F.col(id_col).alias("doc_id"))
    assigned = ids.join(
        cc.select(
            unpad("norm").alias("doc_id"),
            unpad("component").alias("group_id"),
        ),
        "doc_id",
        "left",
    ).withColumn("group_id", F.coalesce("group_id", F.col("doc_id")))
    return assigned.select(
        "doc_id",
        "group_id",
        (F.col("doc_id") == F.col("group_id")).alias("keep"),
    )


def dedup_savings(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    size_col: str = "n_chars",
    pairs_fn=None,
) -> DataFrame:
    """The dedup ROI report: per near-dup group (size ≥ 2), how much a
    quality-aware dedup pass saves — (group_id, n_docs, survivor_doc,
    chars_total, chars_dropped). The survivor is the LARGEST member
    (max size_col, min doc_id tiebreak) — the CCNet keep-the-longest
    policy, deliberately different from dedup_groups' min-id `keep` so
    both canonicalization policies are value-pinned. Builds on
    dedup_groups (same CC machinery, same pairs_fn contract); the
    survivor window partitions by group — bounded by the largest
    near-dup cluster, never a global sort."""
    from pyspark.sql import Window

    groups = dedup_groups(
        docs, threshold, n, id_col=id_col, text_col=text_col,
        pairs_fn=pairs_fn,
    )
    members = groups.join(
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(size_col).alias("sz"),
        ),
        "doc_id",
    )
    w = Window.partitionBy("group_id").orderBy(
        F.desc("sz"), F.asc("doc_id")
    )
    ranked = members.select(
        "group_id",
        "doc_id",
        "sz",
        F.row_number().over(w).alias("rk"),
    )
    out = ranked.groupBy("group_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.max(F.when(F.col("rk") == 1, F.col("doc_id")))
        .cast("bigint")
        .alias("survivor_doc"),
        F.sum("sz").cast("bigint").alias("chars_total"),
        (
            F.sum("sz") - F.max(F.when(F.col("rk") == 1, F.col("sz")))
        )
        .cast("bigint")
        .alias("chars_dropped"),
    )
    return out.where(F.col("n_docs") >= 2)


# --- SimHash -------------------------------------------------------------------

SIMHASH_BITS = 32


def simhash(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """32-bit SimHash over distinct word tokens: bit b is set iff the sum
    of (2*bit_b(hash(tok)) - 1) over tokens is positive. All bit
    arithmetic via shiftright/& — JVM-side, and reproducible in ANSI SQL."""
    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
        )
        .filter(F.length("tok") > 0)
        .distinct()
    )
    # hash ONCE per token in a projection: embedding the md5-derived
    # expression in every per-bit aggregate leaves 32 copies in the plan
    # (subexpression elimination does not reliably cover partial-agg
    # inputs) — the projection guarantees one evaluation
    hashed = toks.select(
        "doc_id", stable_hash60_expr(F.col("tok")).alias("_h")
    )
    sums = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                (F.shiftright(F.col("_h"), b).bitwiseAND(F.lit(1)) * 2 - 1)
            ).alias(f"s{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    sig = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{b}") > 0, F.lit(2**b)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return sums.select("doc_id", sig.cast("bigint").alias("simhash"))


def simhash_dup_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming.

    ADAPTIVE banding: the 32 bits are sliced into max_hamming+1
    contiguous bands, so by pigeonhole any pair within the radius shares
    at least one identical band — join on (band_idx, band_val), verify
    with bit_count(xor). Exact w.r.t. the hamming predicate for ANY
    radius (a fixed 4-byte banding is exact only to 3 bits — one flipped
    bit per byte evades every band). max_hamming=3 reduces to the
    classic byte banding. A radius ≥ SIMHASH_BITS admits EVERY pair
    (max hamming over 32 bits is 32), where banding can no longer cover
    the predicate (a pair differing in all bits shares no band) — that
    degenerate request short-circuits to the explicit all-pairs join it
    semantically is.
    """
    if max_hamming >= SIMHASH_BITS:
        s = simhash(docs, id_col, text_col)
        a = s.select(
            F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a")
        )
        b = s.select(
            F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b")
        )
        every = a.join(b, F.col("doc_a") < F.col("doc_b"))
        ham_all = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        return every.select("doc_a", "doc_b", ham_all.alias("hamming"))
    n_bands = min(max_hamming + 1, SIMHASH_BITS)
    base_w, extra = divmod(SIMHASH_BITS, n_bands)
    slices = []  # (offset, width): first `extra` bands get one more bit
    off = 0
    for bi in range(n_bands):
        w = base_w + (1 if bi < extra else 0)
        slices.append((off, w))
        off += w
    s = simhash(docs, id_col, text_col)
    bands_ = s.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", o).bitwiseAND(F.lit((1 << w) - 1))
                    for o, w in slices
                ]
            )
        ).alias("byte_idx", "byte_val"),
    )
    a = bands_.alias("a")
    b = bands_.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.byte_idx") == F.col("b.byte_idx"))
            & (F.col("a.byte_val") == F.col("b.byte_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.filter(ham <= max_hamming).select(
        "doc_a", "doc_b", ham.alias("hamming")
    )


# --- embedding cosine ------------------------------------------------------------


def cosine_expr(a, b):
    """Cosine similarity of two array<numeric> columns, double precision,
    sequential fold (deterministic summation order). try_divide: a
    zero-magnitude vector (padding row, failed embed) yields NULL —
    a plain division raises DIVIDE_BY_ZERO under ANSI mode (Spark 4
    default) and would abort every cosine-based job on one bad row;
    NULL fails every >= threshold filter, so the row simply drops out.

    (A single-fold struct-accumulator variant — dot/na/nb in one pass
    with the cosine in aggregate's finish lambda — was MEASURED SLOWER
    at sf0.1: 26→34 s on the bucketed kNN join, 3× simple folds beat
    1× struct-allocating fold in the interpreted higher-order path.
    The pairwise-scoring hot paths use the Arrow-batched numpy scorer
    in similarity._cosine_batch_udf instead; this expression remains
    the exact/composable form.)"""
    da = F.transform(a, lambda x: x.cast("double"))
    db = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(da, db, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(da, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(db, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.try_divide(dot, na * nb)


def embedding_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (brute-force all-pairs — the
    small-SF oracle path; the scale path is similarity.ivf_topk's
    bucketing applied pairwise)."""
    a = embeddings.select(
        F.col(id_col).alias("vec_a"), F.col(vec_col).alias("ea")
    )
    b = embeddings.select(
        F.col(id_col).alias("vec_b"), F.col(vec_col).alias("eb")
    )
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    cos = cosine_expr(F.col("ea"), F.col("eb"))
    return pairs.select(
        "vec_a", "vec_b", F.round(cos, round_dp).alias("cosine")
    ).filter(F.col("cosine") >= threshold)


def embedding_dup_pairs_ivf(
    embeddings: DataFrame,
    threshold: float = 0.4,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 4,
) -> DataFrame:
    """Bucketed embedding near-dup pairs — the 100 TB path.

    Vectors are IVF-assigned to their nearest centroid (one broadcast
    pass, similarity.assign_buckets) and cosine is computed only WITHIN
    buckets: cost drops from O(N²) to Σ|bucket|² with a shuffle keyed on
    the bucket id, and the bucket column doubles as a write-partition key
    for pruned scans. Recall is limited to same-bucket pairs — true
    near-duplicates (cosine ≈ 1) land in the same bucket by construction;
    mid-similarity cross-bucket pairs are missed (measured vs the exact
    generator in tests). Brute-force `embedding_dup_pairs` stays the
    small-SF oracle path."""
    from llmaix_spark.operators.similarity import assign_buckets

    bucketed, _cent = assign_buckets(
        embeddings, n_centroids, id_col, vec_col, round_dp
    )
    # both sides of the self-join consume the assignment — materialize it
    # once (lazy localCheckpoint: GC-released, no persist leak)
    bucketed = bucketed.localCheckpoint(eager=False)
    a = bucketed.select(
        "bucket", F.col("vec_id").alias("vec_a"), F.col("v").alias("ea")
    )
    b = bucketed.select(
        "bucket", F.col("vec_id").alias("vec_b"), F.col("v").alias("eb")
    )
    pairs = a.join(b, ["bucket"]).filter(F.col("vec_a") < F.col("vec_b"))
    cos = cosine_expr(F.col("ea"), F.col("eb"))
    return pairs.select(
        "vec_a", "vec_b", F.round(cos, round_dp).alias("cosine")
    ).filter(F.col("cosine") >= threshold)


def dup_ngram_spans(
    docs: DataFrame,
    n: int = 3,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document repeated n-gram detection (the bounded n-gram
    variant of Lee et al. 2022's suffix-array substring dedup — the
    C4/Pile "repeated span" diagnostic): per document, how many of its
    word n-gram positions carry an n-gram that also occurs in at least
    ``min_docs`` distinct documents. Complements dedup_lines (line
    granularity) and ngram_jaccard (whole-doc similarity) with
    span-level duplication mass.

    Returns (doc_id, n_ngrams, dup_ngrams, dup_frac) for EVERY input
    document (short docs report 0 / 0 / 0.0).

    Scale: n-grams are 60-bit rolling hashes (textstats.ngram_hash_array
    — one md5 per token, no shingle strings), so the shuffle key is
    8 bytes. The per-hash doc-frequency groupBy partitions by h and the
    stats join reuses that partitioning; the final per-doc rollup is a
    map-side-combinable count pair. No windows, no driver collects.
    """
    from llmaix_spark.operators.textstats import ngram_hash_array

    # two consumers (df stats + the per-doc join) — materialize or the
    # explode + per-token md5 hashing runs twice (landmine #1 lazy form)
    hs = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(ngram_hash_array(F.col(text_col), n)).alias("h"),
    ).localCheckpoint(eager=False)
    stats = hs.groupBy("h").agg(F.countDistinct("doc_id").alias("nd"))
    per_doc = (
        hs.join(stats, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(
                F.when(F.col("nd") >= min_docs, 1).otherwise(0)
            ).alias("dup_ngrams"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_ngrams", F.lit(0)).cast("bigint").alias("n_ngrams"),
            F.coalesce("dup_ngrams", F.lit(0))
            .cast("bigint")
            .alias("dup_ngrams"),
            F.when(F.col("n_ngrams").isNull(), F.lit(0.0))
            .otherwise(
                F.round(
                    F.col("dup_ngrams").cast("double")
                    / F.col("n_ngrams").cast("double"),
                    4,
                )
            )
            .alias("dup_frac"),
        )
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 3,
    window: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003
    — the MOSS selection rule): hash every k-gram of the token stream,
    then from each window of ``window`` consecutive k-gram hashes keep
    the minimum (rightmost on ties). Guarantees: any shared run of
    window+k-1 tokens yields at least one shared fingerprint, and the
    selected density is ~2/(window+1) — the position-robust near-dup
    index that plain positional fingerprints (fingerprint op) lose on
    any insertion.

    Plan shape: one posexplode, then THREE window passes over the same
    (doc, pos) sort — lead() chains to build k-grams, min_by over a
    rows-frame for the winner, one distinct. min_by's key is
    struct(h, -pos): lexicographic struct comparison = min hash then
    rightmost, no second pass to resolve the argmin. Everything is
    per-document — the only exchange is the hash partition on doc_id,
    and at 100 TB each task winnows its documents independently.

    Returns distinct (doc_id, pos, fp): 1-based k-gram start position
    and the 60-bit shared-contract fingerprint hash.
    """
    if k < 1 or window < 1:
        raise ValueError("winnow_fingerprints needs k >= 1, window >= 1")
    from pyspark.sql import Window as W

    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("pos0", "term"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")
    w_ord = W.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("term")] + [
        F.lead("term", i).over(w_ord) for i in range(1, k)
    ]
    grams = tok.select(
        "doc_id",
        "pos",
        *([F.lead("term", k - 1).over(w_ord).alias("_last")] if k > 1 else []),
        F.concat_ws(" ", *parts).alias("gram"),
    )
    if k > 1:
        grams = grams.where(F.col("_last").isNotNull())
    g = grams.select(
        "doc_id", "pos", stable_hash60_expr(F.col("gram")).alias("h")
    )
    w_frame = (
        W.partitionBy("doc_id").orderBy("pos").rowsBetween(-(window - 1), 0)
    )
    winner = F.expr("min_by(struct(pos, h), struct(h, -pos))")
    sel = (
        g.select(
            "doc_id",
            F.col("pos").alias("end_pos"),
            winner.over(w_frame).alias("_w"),
        )
        .where(F.col("end_pos") >= window)  # full windows only
        .select(
            "doc_id",
            F.col("_w.pos").cast("bigint").alias("pos"),
            F.col("_w.h").alias("fp"),
        )
        .distinct()
    )
    return sel
