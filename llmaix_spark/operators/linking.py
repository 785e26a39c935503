"""Entity linking — blocking + candidate scoring (the first wide stage).

The reference links PII mentions by exact substring match ∪ fuzzy
WRatio/QRatio ≥ 90 ∪ umlaut-variant expansion
(webapp/llm_processing/utils.py:171-244, webapp/report_redaction/
utils.py:413-437) — all O(n·m) single-machine loops. The scalable recast
(SURVEY §2.11):

  mentions (distinct normalized surfaces, salted count)      1 shuffle
  → char-3-gram shingles → 16-fn MinHash signature           narrow
  → banded LSH buckets (b=8, r=2) → in-bucket self-join      1 shuffle
  → verify candidates with normalized-Levenshtein ≥ θ        narrow
  → match edges

Everything is built-in Column expressions (md5/conv/levenshtein — JVM,
codegen'd); no Python in the path. Umlaut expansion becomes
normalize-then-match: both sides are umlaut-folded + lowercased first, so
`Müller`/`Mueller` collapse *exactly* and never reach the fuzzy stage.

LSH parameters: b=8 bands × r=2 rows. For a 1-char typo in a ~15-char
name (3-gram Jaccard ≈ 0.65-0.75) pair-recall is ≥ 0.99; unrelated names
(J < 0.2) almost never collide, and false collisions are killed by the
verify step anyway — LSH affects recall only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from llmaix_spark.functions.fuzzy import ratio_expr
from llmaix_spark.functions.text import norm_surface_expr

# deterministic MinHash parameters: x -> (a*x + b) mod P, P = 2^31 - 1
# (h is pre-reduced mod P so a*h < 2^62 never overflows a bigint)
_P = 2_147_483_647
_MINHASH_AB = [
    (1_103_515_245, 12_345),
    (214_013, 2_531_011),
    (134_775_813, 1),
    (22_695_477, 1_234_567),
    (1_664_525, 1_013_904_223),
    (69_069, 362_437),
    (1_013_904_223, 1_664_525),
    (48_271, 399_268_537),
    (16_807, 1_345_678),
    (65_539, 999_999_937),
    (1_229_782_938, 777_777_777),
    (987_654_321, 192_837_465),
    (557_788_991, 665_544_332),
    (321_321_321, 123_123_123),
    (909_090_909, 808_080_808),
    (111_111_113, 222_222_227),
]
N_HASHES = len(_MINHASH_AB)
BANDS = 8
ROWS = N_HASHES // BANDS


def stable_hash60_expr(col) -> F.Column:
    """60-bit deterministic hash shared with the DuckDB oracle:
    first 15 hex chars of md5 → bigint."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def mention_table(triples_raw: DataFrame) -> DataFrame:
    """triples_raw → mentions(surface, norm, n_refs).

    One shuffle (groupBy surface, map-side combinable). Hot entities
    (power-law mention frequency) are exactly the keys this groupBy
    sees most — partial aggregation absorbs the skew; the downstream
    joins operate on *distinct* surfaces where skew no longer exists.
    """
    surfaces = triples_raw.select(
        F.explode(
            F.array(F.col("subj_surface"), F.col("obj_surface"))
        ).alias("surface")
    ).filter(F.col("surface").isNotNull() & (F.length("surface") > 0))
    return (
        surfaces.groupBy("surface")
        .agg(F.count(F.lit(1)).alias("n_refs"))
        .withColumn("norm", norm_surface_expr(F.col("surface")))
    )


def _shingles(norms: DataFrame, n: int = 3) -> DataFrame:
    """norm → exploded char-n-gram shingles (norms shorter than n use the
    whole string as their single shingle)."""
    sh = F.when(F.length("norm") < n, F.array(F.col("norm"))).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length("norm") - (n - 1)),
            lambda i: F.col("norm").substr(i, F.lit(n)),
        )
    )
    return norms.select("norm", F.explode(sh).alias("shingle"))


def minhash_signatures(norms: DataFrame, n: int = 3) -> DataFrame:
    """norm → sig array<bigint> of N_HASHES MinHash values (one shuffle:
    groupBy norm with per-column min — fully map-side combinable)."""
    sh = _shingles(norms, n)
    # hash ONCE per shingle in a projection (16 hash-fn columns each
    # embedded the whole md5 chain otherwise)
    pre = sh.select(
        "norm",
        (stable_hash60_expr(F.col("shingle")) % F.lit(_P)).alias("_hp"),
    )
    h = F.col("_hp")
    hashed = pre.select(
        "norm",
        *[
            ((F.lit(a) * h + F.lit(b)) % F.lit(_P)).alias(f"h{i}")
            for i, (a, b) in enumerate(_MINHASH_AB)
        ],
    )
    agg = hashed.groupBy("norm").agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(N_HASHES)]
    )
    return agg.select(
        "norm", F.array(*[f"h{i}" for i in range(N_HASHES)]).alias("sig")
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    max_bucket_size: int | None = 5000,
    threshold: float = 90.0,
) -> DataFrame:
    """Banded LSH: two norms are candidates iff they agree on all ROWS
    hashes of at least one band. One shuffle on the bucket key; the
    in-bucket self-join is the classic LSH quadratic hotspot — three
    guards keep it bounded at scale:

      * a length pre-filter inside the join condition: ratio ≥ θ implies
        |len_a − len_b| ≤ (1−θ/100)·max(len) — pairs violating it can
        never verify, so they are dropped before materialization;
      * `max_bucket_size`: buckets larger than this are *skipped*
        (a band shared by 10⁵ norms is low-information — e.g. every
        surface containing one common word; pairs inside it that are
        real matches almost surely share a selective band too). The cap
        turns worst-case O(Σ|bucket|²) into O(Σ min(|bucket|,K)²);
      * `distinct()` collapses multi-band collisions before the
        levenshtein verify. AQE skew-join splits what remains.
    """
    bands = signatures.select(
        "norm",
        F.length("norm").alias("_len"),
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        *[
                            F.col("sig")[b * ROWS + r].cast("string")
                            for r in range(ROWS)
                        ],
                    )
                    for b in range(BANDS)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    if max_bucket_size:
        sizes = bands.groupBy("band_idx", "band_val").agg(
            F.count(F.lit(1)).alias("_bn")
        )
        bands = bands.join(
            sizes.filter(F.col("_bn") <= max_bucket_size),
            ["band_idx", "band_val"],
        ).drop("_bn")
    a = bands.alias("a")
    b = bands.alias("b")
    max_rel_diff = 1.0 - threshold / 100.0
    len_gate = (
        F.abs(F.col("a._len") - F.col("b._len"))
        <= max_rel_diff * F.greatest(F.col("a._len"), F.col("b._len"))
    )
    return a.join(
        b,
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.band_val") == F.col("b.band_val"))
        & (F.col("a.norm") < F.col("b.norm"))
        & len_gate,
    ).select(
        F.col("a.norm").alias("norm_a"), F.col("b.norm").alias("norm_b")
    )


def verify_pairs(
    pairs: DataFrame, threshold: float = 90.0
) -> DataFrame:
    """Candidate scoring: normalized-Levenshtein ratio ≥ threshold
    (the reference's fuzzy gate of 90,
    webapp/report_redaction/utils.py:431-433). Pure JVM `levenshtein`.

    Dedup AFTER scoring: multi-band collisions are cheaper to re-score
    (narrow, codegen'd levenshtein) than to shuffle — distinct() here
    moves ~100× fewer rows than deduping the raw candidate stream."""
    return pairs.filter(
        ratio_expr(F.col("norm_a"), F.col("norm_b")) >= F.lit(threshold)
    ).distinct()


def match_edges(
    triples_raw: DataFrame, threshold: float = 90.0, shingle_n: int = 3
) -> tuple[DataFrame, DataFrame]:
    """Full linking stage. Returns (mentions, edges(norm_a, norm_b)).

    No separate norms.distinct() pass: minhash_signatures ends in a
    groupBy(norm), so duplicate norms (case variants of one surface)
    collapse there for free — one less shuffle."""
    mentions = mention_table(triples_raw)
    sigs = minhash_signatures(mentions.select("norm"), shingle_n)
    pairs = lsh_candidate_pairs(sigs, threshold=threshold)
    edges = verify_pairs(pairs, threshold)
    return mentions, edges
