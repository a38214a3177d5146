"""§2 I — Dedup: exact, keyed, and LLM-pipeline near-duplicate detection.

Reference correspondence: re-run idempotency dedup and latest-rule dedup
(SURVEY §2 I). Extended per BASELINE.json with the training-data dedup
family: exact hash, token-set Jaccard, SimHash, and MinHash-LSH.

100 TB design (SURVEY §7 Phase 4): the brute-force O(n²) pair queries here
are the *oracles*; each carries its banded/sketched scale path —
- exact dup: hash-groupBy (1 shuffle on the digest, fully scalable);
- near-dup: MinHash-LSH banding (q_dedup_minhash_lsh) replaces the
  quadratic self-join — candidates per band-bucket only;
- SimHash: 16-bit fingerprints bucket by value; pairs are compared only
  within hamming-ball buckets at scale (here: aggregated pair counts).
Never a raw crossJoin on the full corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuny_courses_spark.registry import register
from cuny_courses_spark.sources.loaders import load


@register(
    "q_distinct_rows",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def q_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT (Catalyst rewrites to an aggregate)."""
    return load(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority"
    ).distinct()


@register(
    "q_dedup_exact_hash",
    oracle="""
SELECT count(*) AS n_docs,
       count(DISTINCT md5(text)) AS n_distinct,
       CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_exact_dups
FROM documents
""",
)
def q_dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate detection via content digest (testdata has 0 exact
    dups — the query asserts that). At 100 TB: one shuffle on the digest."""
    d = load(spark, sf_dir, "documents")
    h = F.md5("text")
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(h).alias("n_distinct"),
        (F.count(F.lit(1)) - F.countDistinct(h)).cast("long").alias("n_exact_dups"),
    )


@register(
    "q_dedup_drop_duplicates",
    oracle="""
SELECT user_id, event_type, min(event_id) AS event_id
FROM events
GROUP BY user_id, event_type
""",
)
def q_dedup_drop_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup keeping a DETERMINISTIC representative (min event_id) via
    window row_number — raw ``dropDuplicates`` keeps an arbitrary row and is
    never used for checked output (SURVEY §2 I)."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id")
    )


def _tokens() -> "F.Column":
    """Distinct whitespace tokens (lazy: Columns need an active session)."""
    return F.array_distinct(F.split(F.col("text"), " "))


def _shingles() -> "F.Column":
    """Distinct 3-token shingles — the MinHash input. Token *sets* are
    useless on a 31-word shared vocabulary (71k of 125k pairs ≥ 0.6);
    shingles preserve order and isolate the ~24 planted near-dups
    (measured: 25 pairs ≥ 0.6, next bin at 0.1).

    Built as arrays_zip of three slices of ONE split, not element_at(split,
    i) inside the lambda: higher-order functions don't whole-stage-codegen,
    so an embedded split() is re-evaluated PER ELEMENT in interpreted mode
    (~100 re-splits per doc; with Catalyst's pushed-down Generate pruning
    evaluating the whole expression twice more, the old form cost 12.7 s at
    sf0.1 vs 247 ms for this one — measured, identical output). The whole
    expression stays narrow: no shuffle to build shingles at any scale."""
    s = F.split(F.col("text"), " ")
    k = F.greatest(F.size(s) - 2, F.lit(0))
    z = F.arrays_zip(F.slice(s, 1, k), F.slice(s, 2, k), F.slice(s, 3, k))
    return F.array_distinct(
        F.transform(z, lambda t: F.concat_ws(" ", t["0"], t["1"], t["2"]))
    )


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents as (doc_id, t: distinct shingles, n: |t|), with the shingle
    expression materialized in its OWN projection: a single select computing
    both ``sh`` and ``size(sh)`` evaluates the expression twice per row
    (interpreted Project, no common-subexpression elimination for lambdas);
    two stacked selects compute it once — CollapseProject declines to
    re-inline a non-cheap expression referenced twice."""
    sh = _shingles()
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", sh.alias("t"))
        .select("doc_id", "t", F.size("t").alias("n"))
    )


_O_SHINGLES = (
    "list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1), "
    "i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] "
    "|| ' ' || string_split(text, ' ')[i+2]))"
)


@register(
    "q_dedup_near_jaccard",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, {_O_SHINGLES} AS t, len({_O_SHINGLES}) AS n
    FROM documents
)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       round(CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
             / (a.n + b.n - len(list_intersect(a.t, b.t))), 4) AS jaccard
FROM toks a JOIN toks b ON a.doc_id < b.doc_id
WHERE 5 * len(list_intersect(a.t, b.t))
      >= 3 * (a.n + b.n - len(list_intersect(a.t, b.t)))
  AND len(list_intersect(a.t, b.t)) > 0
""",
)
def q_dedup_near_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-shingle Jaccard ≥ 0.6 pairs via an inverted-index equi-join:
    explode distinct shingles, self-join on the shingle, count shared
    shingles per pair (|∩|), then test 5·|∩| ≥ 3·|∪| in integer arithmetic
    (float-free cut; the reported jaccard is the rounded ratio).

    Scale (SURVEY §7 Phase 4): the pair space never materializes — only
    pairs sharing ≥1 shingle exist, produced by a hash equi-join keyed on
    the shingle plus one groupBy(a,b) shuffle. Hot shingles are the skew
    risk at 100 TB (stopword-like shingles touch every doc); AQE skew-join
    handles moderate skew. Above the scale threshold
    (session.is_small_input) the registered query SWAPS to the
    document-frequency-capped index (``near_dup_pairs_df_capped``): hot
    shingles are dropped from the index only, the verify step stays exact,
    and the capped output is bit-equal to this form on the fixtures
    (tests/test_internal.py) and oracle-checked under the forced large
    profile (tests/test_scale_profile.py). Never a nested-loop /
    crossJoin.
    """
    from cuny_courses_spark.session import is_small_input

    if not is_small_input(sf_dir):
        return near_dup_pairs_df_capped(spark, sf_dir)
    return near_dup_pairs_exact(spark, sf_dir)


def near_dup_pairs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UNCAPPED exact inverted-index form (see q_dedup_near_jaccard
    for strategy rationale) — profile-free, so certificates can referee
    against true exact pairs even under a forced large profile (r4
    review: the capped swap as referee would count a correct LSH pair the
    capped index missed as a precision leak)."""
    d = _doc_shingles(spark, sf_dir)
    tok = d.select("doc_id", "n", F.explode("t").alias("s"))
    # shuffle_hash, not the size-estimate's broadcast: both sides are the
    # full postings relation (identical size — broadcast build buys nothing
    # and serializes the whole index through the driver), and at 100 TB a
    # shuffle on the shingle is the only correct distribution anyway; sort
    # on shingle strings (SMJ) is pure overhead for an equi-count. Measured
    # at sf0.1: 3.5 s broadcast → 1.4 s shuffle-hash for the pair counts.
    # Postings carry the doc's shingle count (r7): na/nb come out of the
    # pair aggregation itself (max of a per-doc constant) instead of
    # joining the pair relation back against a per-doc sizes relation
    # twice — at amplified scale sizes exceeds the 8 MB broadcast bound
    # and those joins became full pair-relation shuffles.
    return (
        tok.select(F.col("doc_id").alias("doc_id_a"), F.col("n").alias("na"), "s")
        .join(
            tok.select(
                F.col("doc_id").alias("doc_id_b"), F.col("n").alias("nb"), "s"
            ).hint("shuffle_hash"),
            "s",
        )
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .groupBy("doc_id_a", "doc_id_b")
        .agg(
            F.count(F.lit(1)).alias("i"),
            F.max("na").alias("na"),
            F.max("nb").alias("nb"),
        )
        .withColumn("u", F.col("na") + F.col("nb") - F.col("i"))
        .filter(5 * F.col("i") >= 3 * F.col("u"))
        .select(
            "doc_id_a",
            "doc_id_b",
            F.round(F.col("i").cast("double") / F.col("u"), 4).alias("jaccard"),
        )
    )


_MERSENNE = (1 << 31) - 1  # Mersenne prime: (a·h + b) mod p stays in 62 bits


def _minhash_coeffs(n: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic universal-hash coefficients (a odd-ish, b) mod p."""
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, _MERSENNE), rng.randrange(0, _MERSENNE))
        for _ in range(n)
    ]


@register(
    "q_dedup_minhash_lsh",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, {_O_SHINGLES} AS t, len({_O_SHINGLES}) AS n
    FROM documents
), exact AS (
    SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
    FROM toks a JOIN toks b ON a.doc_id < b.doc_id
    WHERE 5 * len(list_intersect(a.t, b.t))
          >= 3 * (a.n + b.n - len(list_intersect(a.t, b.t)))
      AND len(list_intersect(a.t, b.t)) > 0
)
SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs,
       TRUE AS recall_floor_met,
       TRUE AS precision_ok
FROM exact
""",
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall CERTIFICATE for MinHash-LSH dedup (r3 verdict #4): runs the
    production banded-LSH pipeline (``minhash_lsh_pairs``) AND the exact
    inverted-index Jaccard twin (q_dedup_near_jaccard) in one query,
    emitting a single row: the exact near-dup pair count,
    ``recall_floor_met`` = |LSH ∩ exact| ≥ 0.9·|exact| (integer-arithmetic
    comparison, vacuously true on an empty exact set), and
    ``precision_ok`` = LSH ⊆ exact (the LSH path verifies candidates with
    the same exact-Jaccard cut, so a leaked pair means a real bug). The
    oracle recomputes the exact pair count with constant-true flags —
    recall regressions now hash-FAIL at the driver instead of hiding
    behind ``no_oracle``. The referee is the UNCAPPED exact form
    (``near_dup_pairs_exact``), never the profile-swapped capped index —
    a capped referee would miscount correct LSH pairs as precision leaks
    (r4 review). Production scale path: ``minhash_lsh_pairs``."""
    from cuny_courses_spark.common import pair_set_certificate

    lsh = minhash_lsh_pairs(spark, sf_dir)
    exact = near_dup_pairs_exact(spark, sf_dir)
    return pair_set_certificate(
        exact, lsh, ["doc_id_a", "doc_id_b"], floor_num=9, floor_den=10
    )


def minhash_band_rows(d: DataFrame) -> DataFrame:
    """(doc_id, t: shingle array) → (doc_id, band_idx, band_hash): the
    MinHash-LSH index rows (32 hashes, 16 bands × 2 rows, seed 42).

    Signatures as 32 codegen MIN aggregates over EXPLODED shingle-hash
    rows — not array_min(transform(...)) per slot: higher-order lambdas
    run interpreted (no whole-stage codegen), so 32 permutation passes
    over every doc's hash array cost ~n_docs·|shingles|·32 interpreted
    steps; the exploded groupBy form is one codegen hash-agg pass with
    32 accumulators and identical values ((a·h+b) mod p over the same
    signed xxhash64 % p inputs). Map-side partial aggregation keeps the
    shuffle at |docs| rows of 32 longs at any scale. Band hash =
    xxhash64 over the band's signature slots (r=2 per band).

    Factored out (r10) so the PERSISTED-INDEX pipeline can band a new
    micro-batch with the exact coefficients the stored corpus index was
    built with — determinism across sessions is what makes an
    incremental probe against yesterday's index sound."""
    n_hashes, n_bands, rows_per_band = 32, 16, 2
    coeffs = _minhash_coeffs(n_hashes)
    h = d.select(
        "doc_id", F.explode("t").alias("s")
    ).select("doc_id", (F.xxhash64("s") % _MERSENNE).alias("h"))
    sig = h.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % _MERSENNE).alias(
                f"m{i}"
            )
            for i, (a, b) in enumerate(coeffs)
        ]
    )
    return sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        *[
                            F.col(f"m{k * rows_per_band + r}")
                            for r in range(rows_per_band)
                        ]
                    )
                    for k in range(n_bands)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs at Jaccard ≥ 0.6, seed=42, implemented
    natively on DataFrame ops: shingle → xxhash64 (seed 42) → 32 universal
    hashes mod 2³¹−1 → signature mins → 16 bands × 2 rows → band-bucket
    equi-join → exact-Jaccard verification of the candidates only.

    The 100 TB dedup path: candidate generation is a hash join keyed on
    (band_idx, band_hash) — near-linear, never O(n²); the quadratic exact
    check runs only on band-colliding candidates. P(candidate | j=0.6) =
    1−(1−0.36)¹⁶ ≈ 0.9992 per pair, so with seed fixed the output is
    deterministic and (with overwhelming probability) equals
    q_dedup_near_jaccard; tests assert recall ≥ 0.9. Everything is
    JVM-side whole-stage-codegen arithmetic (exploded hash rows + 32 MIN
    accumulators) — no Python, no interpreted lambdas in the hot path, no
    ml-lib explode-join overhead.
    """
    d = _doc_shingles(spark, sf_dir)
    bands = minhash_band_rows(d)
    cand = (
        bands.select(F.col("doc_id").alias("doc_id_a"), "band_idx", "band_hash")
        .join(
            bands.select(
                F.col("doc_id").alias("doc_id_b"), "band_idx", "band_hash"
            ),
            ["band_idx", "band_hash"],
        )
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .select("doc_id_a", "doc_id_b")
        .distinct()
    )
    # Exact verification on candidates only. The shingle-array side scales
    # with the corpus, so no broadcast hint: candidates ⋈ docs is a hash
    # equi-join on doc_id (threshold-broadcast at test scale, shuffle at
    # 100 TB, where the candidate set is also the far smaller side).
    docs = d.select("doc_id", "t", "n")
    verified = (
        cand.join(
            docs.select(
                F.col("doc_id").alias("doc_id_a"),
                F.col("t").alias("ta"),
                F.col("n").alias("na"),
            ),
            "doc_id_a",
        )
        .join(
            docs.select(
                F.col("doc_id").alias("doc_id_b"),
                F.col("t").alias("tb"),
                F.col("n").alias("nb"),
            ),
            "doc_id_b",
        )
        .withColumn("i", F.size(F.array_intersect("ta", "tb")))
        .withColumn("u", F.col("na") + F.col("nb") - F.col("i"))
        .filter(5 * F.col("i") >= 3 * F.col("u"))
    )
    return verified.select(
        "doc_id_a",
        "doc_id_b",
        F.round(F.col("i").cast("double") / F.col("u"), 4).alias("jaccard"),
    )


_O_CHARGRAMS = (
    "list_distinct(list_transform(range(1, length(text) - 3), "
    "i -> substring(text, i::BIGINT, 5)))"
)


@register(
    "q_dedup_ngram_jaccard",
    oracle=f"""
WITH grams AS (
    SELECT doc_id, {_O_CHARGRAMS} AS g, len({_O_CHARGRAMS}) AS n
    FROM documents WHERE doc_id < 100
)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       round(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
             / (a.n + b.n - len(list_intersect(a.g, b.g))), 4) AS jaccard
FROM grams a JOIN grams b ON a.doc_id < b.doc_id
WHERE 25 * len(list_intersect(a.g, b.g))
      >= 7 * (a.n + b.n - len(list_intersect(a.g, b.g)))
  AND len(list_intersect(a.g, b.g)) > 0
""",
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-5-gram Jaccard ≥ 0.28 pairs (docs with doc_id < 100) — the
    n-gram flavor of near-dup detection, robust to token-boundary edits
    where word shingles are not. Same inverted-index equi-join shape as
    q_dedup_near_jaccard: explode distinct grams → hash join on the gram →
    per-pair co-occurrence count → integer-arithmetic threshold (25·|∩| ≥
    7·|∪|). The doc_id cap bounds the demonstration corpus; at scale the
    gram index gets a document-frequency cap (ubiquitous grams can't
    certify a high-Jaccard pair alone) plus LSH banding exactly as the
    shingle path. (Char-gram similarity runs hotter than shingle
    similarity on a shared-vocabulary corpus; 0.28 sits just above the
    background mode here.)"""
    text_grams = F.array_distinct(
        F.expr(
            "transform(sequence(1, greatest(length(text) - 4, 0)), "
            "i -> substring(text, i, 5))"
        )
    )
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", text_grams.alias("g"), F.size(text_grams).alias("n"))
    )
    tok = d.select("doc_id", F.explode("g").alias("s"))
    inter = (
        tok.select(F.col("doc_id").alias("doc_id_a"), "s")
        .join(tok.select(F.col("doc_id").alias("doc_id_b"), "s"), "s")
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sizes = d.select("doc_id", "n")  # per-doc: threshold/AQE decides, no hint
    return (
        inter.join(
            sizes.withColumnRenamed("n", "na"),
            inter.doc_id_a == sizes.doc_id,
        )
        .drop("doc_id")
        .join(
            sizes.withColumnRenamed("n", "nb"),
            inter.doc_id_b == sizes.doc_id,
        )
        .drop("doc_id")
        .withColumn("u", F.col("na") + F.col("nb") - F.col("i"))
        .filter(25 * F.col("i") >= 7 * F.col("u"))
        .select(
            "doc_id_a",
            "doc_id_b",
            F.round(F.col("i").cast("double") / F.col("u"), 4).alias("jaccard"),
        )
    )


@register(
    "q_sample_hash_stratified",
    oracle="""
SELECT lang,
       count(*) AS n_sampled,
       CAST(min(doc_id) AS BIGINT) AS min_id,
       CAST(max(doc_id) AS BIGINT) AS max_id
FROM documents
WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|42'), 1, 8))::BIGINT % 100
      < CASE WHEN lang = 'en' THEN 10 ELSE 30 END
GROUP BY lang
""",
)
def q_sample_hash_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based stratified sampling — the reproducible
    train/eval-split primitive for training pipelines: a row is sampled iff
    md5(key||salt) mod 100 < rate(stratum). Unlike rand()-based sampleBy,
    membership is a pure function of the key (stable across partitioning,
    re-runs, and engines — md5 is shared with the oracle), which is what
    makes 100 TB splits auditable and incrementally maintainable."""
    d = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|42"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 100
    )
    rate = F.when(F.col("lang") == "en", 10).otherwise(30)
    return (
        d.filter(bucket < rate)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min("doc_id").cast("long").alias("min_id"),
            F.max("doc_id").cast("long").alias("max_id"),
        )
    )


@register(
    "q_dedup_simhash",
    oracle="""
WITH toks AS (
    SELECT DISTINCT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
    FROM documents
), th AS (
    SELECT doc_id, tok,
           ('0x' || substr(md5(tok), 1, 4))::BIGINT AS h
    FROM toks
), bits AS (
    SELECT doc_id, j,
           CASE WHEN sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) > 0
                THEN 1::BIGINT << j ELSE 0 END AS bitval
    FROM th, (SELECT unnest(range(16)) AS j)
    GROUP BY doc_id, j
), sh AS (
    SELECT doc_id, CAST(sum(bitval) AS BIGINT) AS simhash FROM bits GROUP BY doc_id
)
SELECT CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming,
       count(*) AS n_pairs
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
GROUP BY hamming
""",
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash near-dup detection, reported as pair counts per
    hamming distance ≤ 3 (shared-vocab corpus ⇒ many near-equal
    fingerprints; the aggregate keeps output bounded).

    Token hash = first 16 bits of md5 (identical in both engines); bit j of
    the fingerprint is sign(Σ ±1).

    Pair generation is pigeonhole banding, not a pair scan: split the
    16-bit fingerprint into 4 bands of 4 bits — a pair at hamming ≤ 3 has
    its ≤3 differing bits in ≤3 bands, so it matches *exactly* on at least
    one band. Candidates come from a hash equi-join on (band_idx, band
    bits) with recall 1.0 by construction (output identical to the brute
    oracle), then the exact hamming filter. At 100 TB this is the same
    near-linear index-join shape as the MinHash-LSH path; a wider (64-bit)
    fingerprint sharpens band selectivity without changing the plan.
    """
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(_tokens()).alias("tok")
    )
    th = d.select(
        "doc_id",
        F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("long").alias("h"),
    )
    bits = (
        th.select("doc_id", "h", F.explode(F.sequence(F.lit(0), F.lit(15))).alias("j"))
        .groupBy("doc_id", "j")
        .agg(
            F.sum(
                F.when(F.expr("(h >> j) & 1") == 1, 1).otherwise(-1)
            ).alias("s"),
        )
        .select(
            "doc_id",
            F.when(F.col("s") > 0, F.expr("CAST(1 AS BIGINT) << j"))
            .otherwise(F.lit(0).cast("long"))
            .alias("bitval"),
        )
    )
    sh = bits.groupBy("doc_id").agg(F.sum("bitval").cast("long").alias("simhash"))
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band_idx"),
    ).withColumn("band", F.expr("(simhash >> (band_idx * 4)) & 15"))
    a = bands.select(
        F.col("doc_id").alias("da"), F.col("simhash").alias("sa"), "band_idx", "band"
    )
    b = bands.select(
        F.col("doc_id").alias("db"), F.col("simhash").alias("sb"), "band_idx", "band"
    )
    cand = (
        a.join(b, ["band_idx", "band"])
        .filter(F.col("da") < F.col("db"))
        .select("da", "db", "sa", "sb")
        .distinct()  # a pair can collide in several bands — count it once
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.expr("sa ^ sb")).cast("long"))
        .filter(F.col("hamming") <= 3)
        .groupBy("hamming")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# Absolute document-frequency ceiling for the capped inverted index: at
# 100 TB a fractional cap alone is useless (10 % of 1e9 docs per shingle
# still emits 1e16 pairs); the absolute ceiling bounds any shingle's pair
# fan-out to DF_CAP_ABS² regardless of corpus size.
DF_CAP_ABS = 4096


def near_dup_pairs_df_capped(
    spark: SparkSession, sf_dir: str, max_df_frac: float = 0.10
) -> DataFrame:
    """q_dedup_near_jaccard's scale form: EXACT Jaccard pairs with the
    shared-shingle join capped by document frequency.

    Hot shingles are the skew bomb of the inverted-index join at 100 TB —
    a stopword-like shingle occurring in x% of n docs alone emits (xn)²
    candidate pairs. Cap = min(max_df_frac·n, DF_CAP_ABS).

    r5 redesign: the previous form generated DISTINCT candidate pairs from
    the capped index and array-verified every one — on a corpus where
    most pairs share ≥1 shingle (dense vocabulary, the fixture shape) the
    verify step exploded to |candidates| × array_intersect and hung the
    ×100 sweep point, while the count-based exact form finished in ~1 min.
    Now the plan stays COUNT-BASED end to end:

      1. ``i_cold`` = shared-shingle counts from the sub-cap (cold) index
         self-join — the same cheap aggregate as the exact form, with the
         quadratic hot-shingle fan-out removed by construction.
      2. Per-doc hot-shingle counts ``h`` (the hot shingle SET is ≤
         postings/cap entries — broadcastable at any scale). For any
         pair, i_exact ≤ i_cold + min(ha, hb): a SOUND upper bound, so
         prefiltering on it keeps recall EXACT.
      3. Only upper-bound survivors get the array_intersect verify (exact
         i including hot shingles). On a zipf-tail corpus survivors ≈
         emitted pairs; on a hot-free corpus (cap never binds) the bound
         is exact and the verify re-derives the same i.

    The one place the cap can cost recall is candidate GENERATION, not
    the prefilter: a pair whose every shared shingle is hot never enters
    ``i_cold`` at all. That requires ≥ 0.375·(na+nb) shingles each in
    >max_df_frac of the corpus — absent from zipf-shaped corpora and from
    every fixture/oracle check below; the prefilter and verify stay exact
    for any pair the cold index surfaces.

    r5: the cold index carries ``xxhash64(shingle)`` (8-byte long), not
    the ~25-byte shingle string — the postings self-join is the dominant
    shuffle and shrinks ~3×. The PREFILTER and VERIFY are collision-proof:
    a collision can only merge two distinct shingles' postings, which
    INFLATES ``ic``/``df``/``h`` — the upper bound i ≤ ic + min(ha, hb)
    stays sound (every true shared shingle still matches its own hash),
    and emitted values come from the string-array verify, never from the
    hashed counts. Candidate GENERATION is collision-safe only with
    overwhelming probability (r5 ADVICE): a collision that pushes a merged
    posting list over the df cap reclassifies both shingles as hot and
    drops them from the cold index, so a pair whose only shared shingles
    are those two could lose candidacy — a birthday-bounded ~2⁻⁶⁴-per-pair
    event on xxhash64, not a structural guarantee.

    r7: postings carry the doc's shingle count (na/nb from the pair
    aggregation itself — the containment treatment; the former per-doc
    sizes relation exceeded the 8 MB broadcast bound at ×100 and its two
    joins shuffled the pair relation), the h-lookup joins only the
    hot-DOC counts (count-gated broadcast, empty when the cap never
    binds), and a prepare-time ``hot.count()`` gate dispatches hot-free
    corpora — both provided SF dirs and the sweep corpus — straight to
    ``near_dup_pairs_exact``'s sizes-on-postings plan (the prefilter +
    array verify are dead machinery when iub ≡ i). Same-session ×100
    A/B: 32→ ~12 s. The gate is sound on hashes: collisions only
    INFLATE df, so an empty hashed hot set proves no string shingle is
    hot.

    Tests assert bit-equality with q_dedup_near_jaccard's exact form on
    the fixtures and oracle-match under the forced large profile.
    """
    d = _doc_shingles(spark, sf_dir)
    # Postings carry the doc's shingle count (r7, the q_dedup_containment
    # treatment): na/nb come out of the pair aggregation itself (max of a
    # per-doc constant) instead of joining the multi-M-row pair relation
    # back against a per-doc sizes relation TWICE — at ×100 (500 k docs)
    # sizes exceeds the 8 MB auto-broadcast bound, so those two joins were
    # full pair-relation shuffles (the dominant cost of the 32 s r6
    # point).
    post = d.select("doc_id", "n", F.explode("t").alias("s0")).select(
        "doc_id", "n", F.xxhash64("s0").alias("s")
    )
    n_docs = d.count()
    cap = min(int(max_df_frac * n_docs), DF_CAP_ABS)
    dfreq = post.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    # The hot shingle set is ≤ postings/cap entries — tiny; localCheckpoint
    # materializes it ONCE so the gate count, the anti-join, and the
    # semi-join below all read the checkpointed rows instead of each
    # re-running the full postings aggregation (r7 review finding).
    hot_set = dfreq.filter(F.col("df") > cap).select("s").localCheckpoint()
    # Prepare-time gate (r7, plan-cached once per corpus like the
    # star/topk counts): when NO shingle exceeds the cap — both provided
    # SF dirs and the replica-disjoint sweep corpus — the whole
    # prefilter/verify superstructure is dead machinery: iub ≡ i, the
    # hot-count joins are no-ops, and the array verify re-derives counts
    # the string postings join already produced exactly. Dispatch to the
    # exact sizes-on-postings plan instead (×10: 4.8 → ~2.9 s; the gate
    # itself is sound on hashes — a collision only INFLATES df, so an
    # empty hashed hot set proves no string shingle is hot either). Hot
    # corpora keep the full capped path below unchanged.
    if hot_set.count() == 0:
        return near_dup_pairs_exact(spark, sf_dir)
    hot = F.broadcast(hot_set)
    cold = post.join(hot, "s", "left_anti")
    hcnt = (
        post.join(hot, "s", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("h"))
    )
    i_cold = (
        cold.select(
            F.col("doc_id").alias("doc_id_a"), F.col("n").alias("na"), "s"
        )
        # shuffle_hash for the same reason as q_dedup_near_jaccard: equal-
        # sized sides, shingle-keyed shuffle is the scale distribution.
        .join(
            cold.select(
                F.col("doc_id").alias("doc_id_b"),
                F.col("n").alias("nb"),
                "s",
            ).hint("shuffle_hash"),
            "s",
        )
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .groupBy("doc_id_a", "doc_id_b")
        .agg(
            F.count(F.lit(1)).alias("ic"),
            F.max("na").alias("na"),
            F.max("nb").alias("nb"),
        )
    )
    # Hot-count lookup: ONLY docs containing a hot shingle appear in hcnt
    # — EMPTY whenever the cap never binds (the common corpus shape; both
    # provided SF dirs and the sweep corpus have zero hot shingles), in
    # which case the broadcast is a no-op relation, never a shuffle of
    # the pair relation. The count gate is the star/topk mini-CBO
    # pattern: prepare-time count, plan-cached once per corpus;
    # adversarially hot corpora (many hot docs) fall back to shuffle_hash
    # rather than an unbounded broadcast.
    from cuny_courses_spark.operators.joins import _STAR_BCAST_ROWS

    small_h = hcnt.count() <= _STAR_BCAST_ROWS
    ha = hcnt.select(F.col("doc_id").alias("doc_id_a"), F.col("h").alias("ha"))
    hb = hcnt.select(F.col("doc_id").alias("doc_id_b"), F.col("h").alias("hb"))
    if small_h:
        ha, hb = F.broadcast(ha), F.broadcast(hb)
    else:
        ha, hb = ha.hint("shuffle_hash"), hb.hint("shuffle_hash")
    # NARROW prefilter (counts only): the pair relation is huge (every
    # shared-shingle pair), so the wide shingle ARRAYS must never ride it
    # — r5: joining arrays before the prefilter spilled ~80 GB at the
    # ×100 doc point; this order spills nothing.
    surv = (
        i_cold.join(ha, "doc_id_a", "left")
        .join(hb, "doc_id_b", "left")
        # Sound prefilter on the upper bound (recall-exact, step 2 above).
        .withColumn(
            "iub",
            F.col("ic")
            + F.least(
                F.coalesce("ha", F.lit(0)), F.coalesce("hb", F.lit(0))
            ),
        )
        .filter(
            5 * F.col("iub") >= 3 * (F.col("na") + F.col("nb") - F.col("iub"))
        )
        .select("doc_id_a", "doc_id_b", "na", "nb")
    )
    # Exact verify only for survivors (≈ emitted pairs on zipf corpora;
    # exactly the emitted pairs when the cap never binds).
    arrays = d.select("doc_id", "t")
    verified = (
        surv.join(
            arrays.select(
                F.col("doc_id").alias("doc_id_a"), F.col("t").alias("ta")
            ),
            "doc_id_a",
        )
        .join(
            arrays.select(
                F.col("doc_id").alias("doc_id_b"), F.col("t").alias("tb")
            ),
            "doc_id_b",
        )
        .withColumn("i", F.size(F.array_intersect("ta", "tb")))
        .withColumn("u", F.col("na") + F.col("nb") - F.col("i"))
        .filter((5 * F.col("i") >= 3 * F.col("u")) & (F.col("i") > 0))
    )
    return verified.select(
        "doc_id_a",
        "doc_id_b",
        F.round(F.col("i").cast("double") / F.col("u"), 4).alias("jaccard"),
    )


@register(
    "q_dedup_cluster_labels",
    oracle=f"""
WITH RECURSIVE toks AS (
    SELECT doc_id, {_O_SHINGLES} AS t, len({_O_SHINGLES}) AS n
    FROM documents
), pairs AS (
    SELECT a.doc_id AS pa, b.doc_id AS pb
    FROM toks a JOIN toks b ON a.doc_id < b.doc_id
    WHERE 5 * len(list_intersect(a.t, b.t))
          >= 3 * (a.n + b.n - len(list_intersect(a.t, b.t)))
      AND len(list_intersect(a.t, b.t)) > 0
), sym AS (
    SELECT pa AS a, pb AS b FROM pairs
    UNION ALL
    SELECT pb, pa FROM pairs
), reach AS (
    SELECT a, b FROM sym
    UNION
    SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
)
SELECT a AS doc_id, CAST(least(a, min(b)) AS BIGINT) AS cluster_id
FROM reach GROUP BY a
""",
)
def q_dedup_cluster_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster canonicalization: connected components over the
    Jaccard ≥ 0.6 pair graph, labeling every clustered doc with its
    component's min doc_id — the step that turns pairwise dedup output
    into keep/drop decisions (keep the canonical min, drop the rest).

    Iterative min-label propagation on DataFrames (the MapReduce
    connected-components pattern): each round, every node takes the min of
    its own and its neighbors' labels; converges in O(diameter) rounds
    (≤ log n with path-doubling variants; near-dup components are tiny and
    dense, so plain propagation converges in 2-3 rounds). Per round: one
    equi-join + one groupBy — all shuffles keyed, no driver data beyond a
    convergence counter; ``localCheckpoint`` truncates the per-iteration
    lineage so plans stay O(1). The DuckDB oracle computes the same
    components via a recursive-CTE transitive closure — tractable only
    because the fixture graph is small; the iterative form is the one that
    scales.
    """
    pairs = q_dedup_near_jaccard(spark, sf_dir).select("doc_id_a", "doc_id_b")
    edges = (
        pairs.union(pairs.select("doc_id_b", "doc_id_a"))
        .toDF("src", "dst")
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(64):  # safety bound only; convergence is CHECKED below
        neigh = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy("dst")
            .agg(F.min("label").alias("nmin"))
        )
        new = (
            labels.join(neigh, labels.doc_id == neigh.dst, "left")
            .select(
                labels.doc_id.alias("doc_id"),
                F.least(
                    labels.label, F.coalesce(F.col("nmin"), labels.label)
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new
        if changed == 0:
            converged = True
            break
    if not converged:
        # Never silently return partial propagation: a component with
        # diameter > the bound would get wrong labels. (At real scale,
        # switch to path-doubling — O(log n) rounds — before raising this.)
        raise RuntimeError(
            "q_dedup_cluster_labels: label propagation did not converge "
            "within 64 rounds (component diameter too large)"
        )
    return labels.select(
        "doc_id", F.col("label").cast("long").alias("cluster_id")
    )


@register(
    "q_dedup_fuzzy_levenshtein",
    oracle="""
WITH p AS (
    SELECT p_partkey, p_name, string_split(p_name, ' ')[1] AS blk
    FROM part WHERE p_partkey < 300
)
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
FROM p a JOIN p b ON a.blk = b.blk AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 12
""",
)
def q_dedup_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (edit-distance) near-dup pairs over part names, BLOCKED on the
    first token — the record-linkage flavor of dedup: candidates come from
    an equi-join on a cheap blocking key, never an all-pairs scan, and the
    quadratic Levenshtein verify runs only within blocks (same candidate/
    verify shape as the shingle and LSH paths; at 100 TB the blocking key
    gets coarser hashes or q-gram LSH, the join shape is unchanged).
    Classic dynamic-programming Levenshtein on both engines, so distances
    agree exactly."""
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 300)
        .select(
            "p_partkey",
            "p_name",
            F.split(F.col("p_name"), " ").getItem(0).alias("blk"),
        )
    )
    a = p.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
        "blk",
    )
    b = p.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
        "blk",
    )
    return (
        a.join(b, "blk")
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("dist") <= 12)
        .select("key_a", "key_b", "dist")
    )


@register(
    "q_dedup_keep_canonical",
    oracle=f"""
WITH RECURSIVE toks AS (
    SELECT doc_id, {_O_SHINGLES} AS t, len({_O_SHINGLES}) AS n
    FROM documents
), pairs AS (
    SELECT a.doc_id AS pa, b.doc_id AS pb
    FROM toks a JOIN toks b ON a.doc_id < b.doc_id
    WHERE 5 * len(list_intersect(a.t, b.t))
          >= 3 * (a.n + b.n - len(list_intersect(a.t, b.t)))
      AND len(list_intersect(a.t, b.t)) > 0
), sym AS (
    SELECT pa AS a, pb AS b FROM pairs
    UNION ALL
    SELECT pb, pa FROM pairs
), reach AS (
    SELECT a, b FROM sym
    UNION
    SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
), labels AS (
    SELECT a AS doc_id, CAST(least(a, min(b)) AS BIGINT) AS cluster_id
    FROM reach GROUP BY a
)
SELECT lang,
       count(*) AS n_before,
       CAST(count(*) - sum(CASE WHEN l.doc_id IS NOT NULL
                                 AND l.doc_id <> l.cluster_id
                                THEN 1 ELSE 0 END) AS BIGINT) AS n_after,
       CAST(sum(CASE WHEN l.doc_id IS NOT NULL AND l.doc_id <> l.cluster_id
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id
GROUP BY lang
""",
)
def q_dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup APPLICATION step: turn near-dup cluster labels into
    keep/drop decisions — keep each cluster's canonical doc (its min
    doc_id, the cluster_id by construction) plus every unclustered doc,
    and report per-language corpus shrinkage (before/after/dropped).

    Composes the registered q_dedup_cluster_labels (iterative min-label
    connected components — the scale path) and left-joins the labels back
    to the corpus: a doc is dropped iff it is labeled and not its own
    cluster id. The drop set scales with near-dup density, not corpus
    size; the join is doc_id-keyed (broadcast at test scale, shuffle at
    100 TB). Oracle recomputes the same decision through the recursive-CTE
    closure."""
    labels = q_dedup_cluster_labels(spark, sf_dir)
    d = load(spark, sf_dir, "documents").select("doc_id", "lang")
    j = d.join(labels, "doc_id", "left")
    dropped = F.when(
        F.col("cluster_id").isNotNull()
        & (F.col("doc_id") != F.col("cluster_id")),
        1,
    ).otherwise(0)
    return j.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_before"),
        (F.count(F.lit(1)) - F.sum(dropped)).cast("long").alias("n_after"),
        F.sum(dropped).cast("long").alias("n_dropped"),
    )


@register(
    "q_dedup_containment",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, {_O_SHINGLES} AS t, len({_O_SHINGLES}) AS n
    FROM documents
)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       CAST((2 * len(list_intersect(a.t, b.t)) * 10000 + least(a.n, b.n))
            // (2 * least(a.n, b.n)) AS DOUBLE) / 10000.0 AS containment,
       CASE WHEN a.n <= b.n THEN a.doc_id ELSE b.doc_id END AS contained_doc
FROM toks a JOIN toks b ON a.doc_id < b.doc_id
WHERE 5 * len(list_intersect(a.t, b.t)) >= 4 * least(a.n, b.n)
  AND len(list_intersect(a.t, b.t)) > 0
""",
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC near-dup detection: shingle containment |A∩B|/min(|A|,|B|)
    ≥ 0.8 — catches excerpt/superset duplicates (a doc quoted inside a
    longer one) that symmetric Jaccard misses entirely (a 100-shingle doc
    inside a 10 000-shingle doc has Jaccard ≈ 0.01 but containment 1.0) —
    the dedup rule LLM corpora need for boilerplate-wrapped reposts.

    Same inverted-index plan as q_dedup_near_jaccard (shared-shingle
    equi-join → pair count → size join-back), same integer-arithmetic cut
    (5·|∩| ≥ 4·min — float-free), and the same 100 TB posture: pair space
    ∝ shared-shingle pairs, hot-shingle skew handled by AQE + the
    df-capped index twin; `contained_doc` marks the smaller side (ties →
    a) as the removal candidate for the canonical-keep stage.

    r7 (r6 VERDICT #3, resolved differently than asked): the measured
    2.8× gap vs the DuckDB inverted-index twin was NOT the postings
    shuffle — it was the two joins of the multi-M-row PAIR relation back
    against sizes (×10 decomposition: pair-count 2.4 s, +sizes-joins
    ≈ +2.2 s). Postings now carry the doc's shingle count, so na/nb come
    out of the pair aggregation itself (max of a per-doc constant — the
    DuckDB twin's any_value) and the pair relation never rides another
    join. The near_jaccard-style xxhash64 postings WAS ported and A/B'd:
    because the count IS the output here, hashing forces an exact
    array-intersect verify on survivors, and the verify's two extra
    tokenization passes cost more than the 8-byte key saves (×10:
    hashed+verify 4.72 s, string-exact sizes-on-postings 2.76 s vs twin
    1.72 s = 1.6×; ×100: 15.1 s vs 12.3 s). The string-keyed exact count
    keeps correctness unconditional with the faster plan at both
    factors."""
    d = _doc_shingles(spark, sf_dir)
    post = d.select("doc_id", "n", F.explode("t").alias("s"))
    return (
        post.select(
            F.col("doc_id").alias("doc_id_a"), F.col("n").alias("na"), "s"
        )
        .join(
            post.select(
                F.col("doc_id").alias("doc_id_b"), F.col("n").alias("nb"), "s"
            ).hint("shuffle_hash"),
            "s",
        )
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .groupBy("doc_id_a", "doc_id_b")
        .agg(
            F.count(F.lit(1)).alias("i"),
            F.max("na").alias("na"),
            F.max("nb").alias("nb"),
        )
        .withColumn("m", F.least("na", "nb"))
        .filter(5 * F.col("i") >= 4 * F.col("m"))
        .select(
            "doc_id_a",
            "doc_id_b",
            # Exact half-up 4 dp of i/m (small-denominator rational — the
            # q_ts_ewma round() seam; common.S_r4_ratio rationale).
            F.expr(
                "CAST((2 * i * 10000 + m) div (2 * m) AS DOUBLE) / 10000.0"
            ).alias("containment"),
            F.when(F.col("na") <= F.col("nb"), F.col("doc_id_a"))
            .otherwise(F.col("doc_id_b"))
            .alias("contained_doc"),
        )
    )


_SPAN_K = 5  # gram width: ≥5-token repeats are structure, not vocabulary


def gram_postings(toks: DataFrame, k: int) -> DataFrame:
    """k-gram POSTINGS (doc_id, pos, g) over ``toks`` (doc_id, t:
    array<string>) — the slice-zip gram form (one split, whole-stage-
    friendly). Factored out (r13) so the incremental span-dedup path
    can gram a micro-batch with EXACTLY the builder the persisted
    postings index was built with — determinism across sessions is the
    soundness condition, same as minhash_band_rows' fixed seeds."""
    m = F.greatest(F.size("t") - (k - 1), F.lit(0))
    z = F.arrays_zip(*[F.slice("t", 1 + j, m) for j in range(k)])
    gram_arr = F.transform(
        z, lambda s: F.concat_ws(" ", *[s[str(j)] for j in range(k)])
    )
    return toks.select("doc_id", gram_arr.alias("ga")).select(
        "doc_id", F.posexplode("ga").alias("pos", "g")
    )


def span_stats_from_positions(dpos: DataFrame, k: int) -> DataFrame:
    """Per-doc (n_spans, dup_tokens) from duplicated gram-start
    positions (doc_id, pos): gaps-and-islands merge of consecutive
    starts; a run of r starts covers r + k − 1 tokens."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    spans = (
        dpos.withColumn("grp", F.col("pos") - F.row_number().over(w))
        .groupBy("doc_id", "grp")
        .agg(F.min("pos").alias("a"), F.max("pos").alias("b"))
    )
    return spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("b") - F.col("a") + k).cast("long").alias("dup_tokens"),
    )


def substring_span_per_doc(toks: DataFrame, k: int) -> DataFrame:
    """Per-doc maximal duplicated-span stats over ``toks`` (doc_id,
    t: array<string>): position p is duplicated when the k-gram at p
    occurs in ≥2 distinct docs; consecutive duplicated positions merge
    (gaps-and-islands) into maximal spans of run + k − 1 tokens.
    Returns (doc_id, n_spans, dup_tokens) for affected docs only —
    the distributed core of q_dedup_substring_spans, factored out so
    the hypothesis property test can drive it on arbitrary corpora."""
    grams = gram_postings(toks, k)
    dupg = (
        grams.groupBy("g")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("g")
    )
    dpos = grams.join(dupg.hint("shuffle_hash"), "g").select("doc_id", "pos")
    return span_stats_from_positions(dpos, k)


@register(
    "q_dedup_substring_spans",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
grams AS (
    SELECT doc_id, i AS pos,
           t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                || ' ' || t[i+4] AS g
    FROM toks, UNNEST(range(1, len(t) - {_SPAN_K} + 2)) AS u(i)
),
dupg AS (
    SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= 2
),
dpos AS (SELECT gr.doc_id, gr.pos FROM grams gr JOIN dupg USING (g)),
isl AS (
    SELECT doc_id, pos,
           pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
    FROM dpos
),
spans AS (
    SELECT doc_id, grp, min(pos) AS a, max(pos) AS b
    FROM isl GROUP BY doc_id, grp
),
per_doc AS (
    SELECT doc_id, count(*) AS n_spans,
           CAST(sum(b - a + {_SPAN_K}) AS BIGINT) AS dup_tokens
    FROM spans GROUP BY doc_id
),
tot AS (
    SELECT CAST(sum(len(t)) AS BIGINT) AS corpus_tokens FROM toks
),
dtot AS (
    SELECT CAST(sum(dup_tokens) AS BIGINT) AS corpus_dup_tokens,
           CAST(floor(1000000.0 * sum(dup_tokens)
                      / (SELECT corpus_tokens FROM tot)) AS BIGINT)
               AS shrink_ppm
    FROM per_doc
)
SELECT p.doc_id, p.n_spans, p.dup_tokens,
       CAST(len(tk.t) AS BIGINT) AS n_tokens,
       dtot.corpus_dup_tokens, tot.corpus_tokens, dtot.shrink_ppm
FROM per_doc p
JOIN toks tk USING (doc_id)
CROSS JOIN tot CROSS JOIN dtot
""",
)
def q_dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT SUBSTRING-SPAN dedup (the ExactSubstr leg of LLM-corpus
    dedup, re-expressed as bucketed k-gram postings instead of a
    suffix array): a token position is DUPLICATED when the 5-token
    gram starting there also occurs in ANOTHER document; maximal runs
    of consecutive duplicated positions merge into spans (a run of r
    gram starts covers r + k − 1 tokens). Emits one row per affected
    doc — span count, duplicated-token count, doc length — plus the
    corpus totals and the shrinkage (ppm of corpus tokens removable
    by cutting every duplicated span), the number a corpus-cleaning
    pipeline actually acts on.

    Plan (scales where a suffix array cannot): tokenize narrow →
    posexplode grams (|tokens| rows, no driver state) → one groupBy on
    the gram string marks cross-doc grams (count(DISTINCT doc_id) ≥ 2,
    partial-agg friendly) → one shuffle join back to postings → the
    gaps-and-islands window per doc (row_number over doc_id — bounded
    by doc length). At 100 TB the gram groupBy/join would key on a
    128-bit digest instead of the string to shrink shuffle width; the
    string key here keeps the oracle comparison unconditional. Gram
    construction reuses the `_shingles` slice-zip form — ONE split,
    whole-stage-friendly, never element_at(split) inside a lambda."""
    toks = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    per_doc = substring_span_per_doc(toks, _SPAN_K)
    tot = toks.agg(
        F.sum(F.size("t")).cast("long").alias("corpus_tokens")
    )
    dtot = (
        per_doc.agg(
            F.sum("dup_tokens").cast("long").alias("corpus_dup_tokens")
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "corpus_dup_tokens",
            "corpus_tokens",
            F.floor(
                F.lit(1000000.0)
                * F.col("corpus_dup_tokens")
                / F.col("corpus_tokens")
            ).cast("long").alias("shrink_ppm"),
        )
    )
    return (
        per_doc.join(
            toks.select(
                "doc_id", F.size("t").cast("long").alias("n_tokens")
            ),
            "doc_id",
        )
        .crossJoin(F.broadcast(dtot))
        .select(
            "doc_id", "n_spans", "dup_tokens", "n_tokens",
            "corpus_dup_tokens", "corpus_tokens", "shrink_ppm",
        )
    )
