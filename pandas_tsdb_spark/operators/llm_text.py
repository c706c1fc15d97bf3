"""§2.9 LLM-pipeline text operators: dedup (exact / token-set /
MinHash-LSH / SimHash), tokenize, tf-idf, stats, quality, fingerprint,
language-ID.

Scale designs:
- dedup_exact partitions by the TEXT HASH, not the text, so the shuffle
  key is 16 bytes regardless of document size.
- dedup_minhash is the 100 TB near-dup path: distinct (doc, 3-shingle)
  -> ONE xxhash64 per shingle -> k=16 one-permutation-hashing signature
  slots in ONE aggregation pass -> 4-row bands -> candidate pairs only
  where a band collides -> size-ratio prune -> exact Jaccard
  verification on the candidates (64-bit hashes, not strings). Work is
  proportional to collisions, never all-pairs. Shingles (not unigrams) keep the similarity space
  non-degenerate on small vocabularies — see the op docstring for the
  measured failure mode. Identical texts collide in every band, so
  recall on exact duplicates is 1.0 (asserted in tests).
- dedup_simhash: 32-bit sign-sum fingerprint in one aggregation pass
  (32 conditional sums); equal-fingerprint groups are near-dup clusters.
- lang_id: two-pass n-gram profiling (top-20 char trigrams per language
  -> overlap score -> argmax). On this synthetic corpus every language
  shares one vocabulary, so accuracy is chance — the pipeline shape is
  what matters and the whole thing is SQL-expressible and oracle-checked.
- Hash choice: md5 (bit-identical in Spark and DuckDB) for anything
  oracle-checked; xxhash64 (JVM-side, cheaper) for engine-internal
  minhash/simhash where the oracle is a structural test instead.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pandas_tsdb_spark.catalog import Tables
from pandas_tsdb_spark.registry import query

STOPWORDS = ("a", "the")

_TOKS = "string_split(lower(text), ' ')"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return Tables(spark, sf_dir).documents


def _spread_hint(df: DataFrame, key: str = "doc_id") -> str:
    """SQL-hint twin of _spread for monolithic-SQL builders (see
    catalog.Tables.sql_views): same decision inputs, same
    RepartitionByExpression exchange via the REPARTITION hint, or the
    empty string when the source is already genuinely parallel."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = target
    if n_files >= target and df.rdd.getNumPartitions() >= target:
        return ""
    return f"/*+ REPARTITION({target}, {key}) */"


def _spread(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """Fan an UNDER-SPLIT source out to the cluster before a CPU-heavy
    per-row stage (shingling, n-gram scoring): one narrow exchange of
    the raw rows, keyed so downstream per-key aggregation needs no
    second shuffle. No-op when the scan is already genuinely parallel —
    which a many-file 100 TB table always is; this exists for
    few-big-files sources where scan parallelism caps at the file count
    (measured on the one-file 64x fixture: the signature stage of
    dedup_minhash ran on 9 of 32 cores, 26 s -> 2.9 s from this).

    The no-op test requires many FILES, not just many partitions:
    Spark splits a single file into defaultParallelism byte ranges, but
    a parquet split only yields rows if a row-group STARTS inside it —
    a big single-file scan can report 32 partitions of which only
    #row-groups are non-empty (measured at 256x docs: 2 of 32 splits
    held rows, all per-doc CPU ran on 2 cores, lang_id 21x slower than
    linear). Partition count alone is a lie; file count is not."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:  # non-file source: trust partition count
        n_files = target
    if n_files >= target and df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, key)


def _tokens_col() -> F.Column:
    return F.split(F.lower(F.col("text")), " ")


def _shingles_col(n: int = 3) -> F.Column:
    """w-shingles (n-token windows) of the lowercased text.

    Built as zip_with over n shifted slices of the token array — NOT
    transform(sequence(...), i -> element_at(toks, i+j)): a lambda that
    captures the split() expression re-evaluates the split per INDEX
    (O(len²) per doc; measured 4.6s of dedup_minhash's 5s at sf0.1).
    Slices evaluate the array once per row; zip_with walks them in one
    pass."""
    toks = _tokens_col()
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    parts = [F.slice(toks, i + 1, m) for i in range(n)]
    out = parts[0]
    for p in parts[1:]:
        out = F.zip_with(out, p, lambda a, b: F.concat_ws(" ", a, b))
    return out


def _shingle_hashes_sql(n: int = 3) -> str:
    """SQL-text twin of _shingle_hashes_col for monolithic-SQL builders
    (catalog.Tables.sql_views): the identical token-hash fold — the
    repeated token-array subexpression collapses under codegen CSE
    exactly as the Column form's shared subtree does."""
    th = "transform(split(lower(text), ' '), s -> xxhash64(s))"
    m = f"greatest(size({th}) - {n - 1}, 0)"
    out = f"slice({th}, 1, {m})"
    for i in range(1, n):
        out = f"zip_with({out}, slice({th}, {i + 1}, {m}), (a, b) -> xxhash64(a, b))"
    return out


def _shingle_hashes_col(n: int = 3) -> F.Column:
    """64-bit hashes of the n-token shingles, built WITHOUT ever
    materializing shingle strings: hash each token once
    (transform + xxhash64), then fold n shifted slices of the LONG
    array pairwise with xxhash64(a, b). Long-pair hashing replaces
    per-shingle string allocation + string hashing — measured 2.8x on
    the 16x corpus (explode: 6.96 -> 2.46 s). Same zip_with-over-
    slices shape as _shingles_col (same O(len) discipline)."""
    th = F.transform(_tokens_col(), lambda s: F.xxhash64(s))
    m = F.greatest(F.size(th) - (n - 1), F.lit(0))
    parts = [F.slice(th, i + 1, m) for i in range(n)]
    out = parts[0]
    for p in parts[1:]:
        out = F.zip_with(out, p, lambda a, b: F.xxhash64(a, b))
    return out


@query(
    "dedup_exact",
    oracle="""
    SELECT doc_id, lang, source, n_chars FROM documents
    WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup, keep lowest doc_id per text. Shuffle key = md5(text)
    (constant width); full text only compared within a hash bucket."""
    # ONE spark.sql() call (r9-opt, catalog.Tables.sql_views): ~89 ms
    # of per-call plan construction -> ~35 ms; same single md5-keyed
    # exchange + WindowGroupLimit plan.
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT doc_id, lang, source, n_chars FROM (
      SELECT doc_id, lang, source, n_chars,
             row_number() OVER (PARTITION BY md5(text)
                                ORDER BY doc_id) AS rn
      FROM {v}documents
    ) WHERE rn = 1
    """)


_SIG_SQL = (
    "md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))"
)


def _sig_col() -> F.Column:
    # sort_array, NOT array_sort: array_sort carries a default
    # comparator lambdafunction in the plan, which Catalyst's inferred
    # isnotnull(join-key) filter then re-substitutes below the project
    # (flagged by plan_audit's lambda-in-Filter sweep); sort_array uses
    # native ordering — same ascending result on non-null strings and
    # cheaper to evaluate.
    return F.md5(F.array_join(F.sort_array(F.array_distinct(F.split("text", " "))), " "))


@query(
    "dedup_near",
    oracle=f"""
    SELECT min(doc_id) AS keep_id, count(*) AS group_size
    FROM (SELECT doc_id, {_SIG_SQL} AS sig FROM documents)
    GROUP BY sig
    """,
)
def dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dedup by token-SET signature (n-gram Jaccard = 1.0 groups:
    same words, any order/multiplicity). One hash-agg over md5 sigs."""
    d = _spread(_docs(spark, sf_dir))
    return (
        d.select("doc_id", _sig_col().alias("sig"))
        .groupBy("sig")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("group_size"))
        .drop("sig")
    )


@query(
    "dedup_near_pairs",
    oracle=f"""
    WITH sig AS (SELECT doc_id, {_SIG_SQL} AS sig FROM documents)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM sig a JOIN sig b ON a.sig = b.sig AND a.doc_id < b.doc_id
    """,
)
def dedup_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All near-duplicate pairs (token-set equality), a < b ordered."""
    d = _spread(_docs(spark, sf_dir)).select("doc_id", _sig_col().alias("sig"))
    a, b = d.alias("a"), d.alias("b")
    return a.join(
        b, (F.col("a.sig") == F.col("b.sig")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))


_MINHASH_K = 16
_BAND_ROWS = 4  # 4 bands x 4 rows


@query("dedup_minhash", oracle=None)  # xxhash64 seeds are engine-internal
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH over 3-token SHINGLES + exact-Jaccard verification —
    the scalable near-dup path (see module docstring). Emits candidate
    pairs with exact shingle-jaccard >= 0.5.

    Shingles, not unigrams, are load-bearing at any scale: the fixture
    corpus has a 31-word vocabulary, so unigram token-set Jaccard is
    degenerate (median 0.625 across ALL pairs — measured) and unigram
    LSH banding collides half the corpus into candidates (6.2M pairs at
    sf0.1). 3-shingle Jaccard between non-near-dup docs is ~0 (p99 =
    0.014), so candidates ≈ true near-dups and the verification join is
    proportional to real duplication, not corpus².

    A size-ratio prefilter (j >= 0.5 forces shingle counts within 2x)
    cuts band-collision noise before the verification join.

    Signatures use ONE-PERMUTATION HASHING (Li/Owen/Zhang, NeurIPS'12):
    ONE xxhash64 per shingle — not k=16 seeded hashes — bucketed by
    pmod(h, 16); the min within each bucket is that bucket's signature
    slot. 16x less hash work for the same LSH banding structure; the
    per-(doc, shingle) stream still collapses map-side (partial min)
    before the exchange. Empty buckets (P≈(15/16)^|set|, <0.1% at
    fixture set sizes) are densified from the doc's GLOBAL min hash +
    slot index — a function of the shingle SET, so identical sets get
    identical fillers and exact-dup recall stays 1.0 (asserted in
    tests). [A 16-seed map-side array_min(transform) variant was tried
    and measured 2.1x SLOWER end-to-end: higher-order lambdas are
    interpreted, the exploded column path is whole-stage-codegen'd.]
    Verification intersects 64-bit shingle hashes, not strings — the
    exchange carries 8-byte keys."""
    d = _docs(spark, sf_dir)
    # th_sig explodes the EXPRESSION, not a materialized array column:
    # exploding the materialized column makes InferFiltersFromGenerate
    # re-evaluate the whole shingle pipeline inside a Filter (the 65x
    # trap, flagged by plan_audit). This is the ONLY full-corpus
    # shingle pass in the query — verification below shingles just the
    # candidate docs.
    th_sig = _spread(d).select(
        "doc_id",
        F.explode(F.array_distinct(_shingle_hashes_col(3))).alias("h"),
    )
    # The 16-slot agg / densify / banding blocks are built as SQL TEXT
    # (F.expr / selectExpr), not per-column Column objects: the Column
    # form is ~50 py4j round-trips per block and measured ~0.4 s of
    # pure driver-side plan construction per run — string expressions
    # parse JVM-side in one call each and produce the IDENTICAL
    # analyzed plan (same pmod/min/coalesce/xxhash64 expression tree,
    # asserted by the unchanged signature-equality tests).
    sigs = th_sig.groupBy("doc_id").agg(
        F.expr("count(*) AS set_size"),
        *[
            F.expr(f"min(CASE WHEN pmod(h, {_MINHASH_K}) = {i} THEN h END) AS h{i}")
            for i in range(_MINHASH_K)
        ],
    )
    gmin_sql = "least(" + ", ".join(f"h{i}" for i in range(_MINHASH_K)) + ")"
    sigs = sigs.selectExpr(
        "doc_id",
        "set_size",
        *[f"coalesce(h{i}, {gmin_sql} + {i}) AS h{i}" for i in range(_MINHASH_K)],
    )
    n_bands = _MINHASH_K // _BAND_ROWS
    band_structs = ", ".join(
        "struct({b} AS band_id, xxhash64({cols}) AS band_hash)".format(
            b=b,
            cols=", ".join(
                f"h{b * _BAND_ROWS + r}" for r in range(_BAND_ROWS)
            ),
        )
        for b in range(n_bands)
    )
    bands = sigs.selectExpr(
        "doc_id",
        "set_size",
        f"explode(array({band_structs})) AS band",
    ).select("doc_id", "set_size", "band.band_id", "band.band_hash")
    # Pair generation by GROUP-COLLECT, not a self-join: joining bands
    # to itself re-executes the whole signature pipeline once per side
    # (measured: candidate generation alone was 7.9 s of the 11.3 s
    # total at 16x docs — half of it the duplicated sigs subtree).
    # Collecting each band bucket's members once and expanding pairs
    # in-bucket evaluates sigs ONCE and shuffles the band table once;
    # buckets are collision groups (tiny), so the k^2 in-bucket
    # expansion is bounded exactly like the join was.
    buckets = (
        bands.groupBy("band_id", "band_hash")
        .agg(
            F.collect_list(F.struct("doc_id", "set_size")).alias("ds")
        )
        .filter(F.size("ds") >= 2)
    )
    cands = (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ds, x -> "
                    "transform(filter(ds, y -> y.doc_id > x.doc_id), "
                    "y -> struct(x.doc_id AS doc_a, y.doc_id AS doc_b, "
                    "x.set_size AS size_a, y.set_size AS size_b))))"
                )
            ).alias("p")
        )
        .select("p.*")
        .distinct()
        # j >= 0.5 requires |A|/|B| in [1/2, 2] — prune before the
        # (much more expensive) exact-intersection join.
        .filter(
            (F.col("size_a") <= 2 * F.col("size_b"))
            & (F.col("size_b") <= 2 * F.col("size_a"))
        )
    )
    # exact verification: |A ∩ B| via array_intersect — over ONLY the
    # candidate docs. The raw corpus is semi-joined against the (tiny)
    # candidate-id set BEFORE any shingling, so verification shingles
    # thousands of docs, not the corpus. (The previous shape kept a
    # full spread+shingled corpus table per probe side: the _spread
    # exchange was reused, but the post-exchange shingle computation
    # re-ran per consumer — two extra full-corpus shingle passes,
    # ~5-6 s of the 12.5 s total at 64x docs.)
    #
    # cands is MATERIALIZED (eager localCheckpoint): five consumers
    # hang off it (pair rows + 2 union sides + the two probe semis),
    # and although AQE's exchange reuse usually deduplicates the five
    # identical signature subtrees, it does so nondeterministically
    # across runs (measured 5.9-19.7 s swings). The table is small by
    # construction — band-collision pairs ∝ true near-dups, never
    # corpus² (shingle LSH property above) — so materializing it costs
    # one tiny job and pins the corpus-side work to exactly ONE
    # signature pass. RDD storage is GC-cleaned; no persist leak.
    cands = cands.localCheckpoint(eager=True)
    cand_ids = (
        cands.select(F.col("doc_a").alias("doc_id"))
        .union(cands.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    cand_arrays = (
        d.select("doc_id", "text")
        .join(cand_ids, "doc_id", "left_semi")
        .select("doc_id", F.array_distinct(_shingle_hashes_col(3)).alias("shs"))
    )
    a_sets = cand_arrays.select(
        F.col("doc_id").alias("doc_a"), F.col("shs").alias("sa")
    )
    b_sets = cand_arrays.select(
        F.col("doc_id").alias("doc_b"), F.col("shs").alias("sb")
    )
    inter = (
        cands.join(a_sets, "doc_a")
        .join(b_sets, "doc_b")
        .withColumn("n_inter", F.size(F.array_intersect("sa", "sb")))
    )
    jac = F.col("n_inter") / (F.col("size_a") + F.col("size_b") - F.col("n_inter"))
    return (
        inter.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
    )


@query("dedup_simhash", oracle=None)  # xxhash64 bit-mix is engine-internal
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash over the distinct-token set: per bit, sign of the
    sum of ±1 contributions; one aggregation pass, fingerprint assembled
    with shifts. Equal fingerprints => near-dup cluster."""
    d = _spread(_docs(spark, sf_dir))
    toks = d.select("doc_id", F.explode(F.array_distinct(_tokens_col())).alias("tok"))
    h = F.xxhash64("tok")
    bit_sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{j}")
            for j in range(32)
        ]
    )
    fingerprint = reduce(
        lambda acc, j: acc
        + F.when(F.col(f"b{j}") >= 0, F.lit(2**j).cast("long")).otherwise(0),
        range(32),
        F.lit(0).cast("long"),
    )
    return bit_sums.select("doc_id", fingerprint.alias("simhash"))


@query(
    "text_tokenize",
    oracle=f"""
    SELECT tok, count(*) AS n, count(DISTINCT doc_id) AS n_docs
    FROM (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents)
    WHERE tok NOT IN ('a', 'the')
    GROUP BY tok
    """,
)
def text_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize + stopword filter + corpus term/document frequencies."""
    d = _spread(_docs(spark, sf_dir))
    return (
        d.select("doc_id", F.explode(_tokens_col()).alias("tok"))
        .filter(~F.col("tok").isin(*STOPWORDS))
        .groupBy("tok")
        .agg(F.count("*").alias("n"), F.countDistinct("doc_id").alias("n_docs"))
    )


@query(
    "text_tfidf",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
    df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.tok, tf.tf, df.df,
           round(tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0), 6) AS tfidf
    FROM tf JOIN df USING (tok) CROSS JOIN n
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf-idf per (doc, term), smoothed idf = ln((N+1)/(df+1)) + 1.

    ONE pass over the raw token stream: df derives from tf — tf's rows
    ARE the distinct (doc, term) pairs, so df(tok) = count(*) over tf,
    replacing the old second explode + countDistinct branch (which
    re-evaluated the whole scan+split subtree). The two consumers of tf
    share an identical exchange -> Spark reuses it (ReusedExchange in
    the plan); the df aggregation partial-combines to |vocabulary| rows
    per task before its exchange. The document-frequency side is tiny
    (vocabulary) -> broadcast; the corpus size joins as a broadcast
    1-row literal."""
    # r9-opt, two moves (A/B + final-plan evidence in
    # OPTIMIZATION_r09.md):
    # (1) PAIRS SHARING: repartition AFTER the tf aggregate. The spread
    #     exchange partitions by doc_id, so groupBy(doc_id, tok)
    #     aggregates WITHOUT a shuffle — which left no shared boundary
    #     between the tf and df branches, and the post-execution final
    #     plan showed the full explode + three HashAggregates running
    #     TWICE (AQE reused only the raw-text spread stage). The
    #     explicit exchange of the (doc_id, tok, tf) PAIRS — narrow
    #     rows, far fewer than token instances, no hot-key skew
    #     (doc_id leads the hash) — is the boundary both consumers
    #     reuse: one corpus tokenize pass at any scale. Interleaved A/B
    #     at sf0.1 under load: 1.34 -> 0.76 s median (idle: wash);
    #     256x: 10.1 -> 9.6 s.
    #     count(CASE WHEN tf >= 1 THEN true END) == count(*) (tf >= 1
    #     by construction): the non-foldable predicate keeps tf
    #     referenced in the df branch — a plain count gets simplified
    #     to count(1), tf pruned, the inner agg collapses to a distinct
    #     and the subtrees no longer canonicalize equal (reuse dies).
    # (2) ONE spark.sql() call (catalog.Tables.sql_views): 149 ms of
    #     per-call plan construction -> ~70 ms.
    # corpus size joins as a broadcast 1-row aggregate (the oracle's
    # CROSS JOIN n), NOT an eager d.count() at plan-build time: the
    # eager count was a full extra driver-blocking job per run (~0.1 s
    # at sf0.1), and a blocking action inside a plan builder is the
    # wrong shape for a shared-cluster driver anyway. Float literals
    # carry the D suffix (bare SQL floats parse as DECIMAL); the
    # (N+1)/(df+1) doubles are identical either way.
    t = Tables(spark, sf_dir)
    v = t.sql_views()
    spread = _spread_hint(t.documents)
    return spark.sql(f"""
    WITH spread AS (SELECT {spread} doc_id, text FROM {v}documents),
    tok AS (SELECT doc_id, explode(split(lower(text), ' ')) AS tok
            FROM spread),
    tf0 AS (SELECT doc_id, tok, count(*) AS tf FROM tok
            GROUP BY doc_id, tok),
    tf AS (SELECT /*+ REPARTITION(doc_id, tok) */ doc_id, tok, tf
           FROM tf0),
    df AS (SELECT tok, count(CASE WHEN tf >= 1 THEN true END) AS df
           FROM tf GROUP BY tok),
    n AS (SELECT count(*) AS n_docs FROM {v}documents)
    SELECT /*+ BROADCAST(df), BROADCAST(n) */ tf.doc_id, tf.tok, tf.tf,
           df.df,
           round(tf.tf * (ln((n.n_docs + 1.0D) / (df.df + 1.0D)) + 1.0D),
                 6) AS tfidf
    FROM tf JOIN df USING (tok) CROSS JOIN n
    """)


@query(
    "text_stats",
    oracle=f"""
    SELECT doc_id, n_chars, length(text) AS n_chars_calc,
           len({_TOKS}) AS n_tokens,
           len(list_distinct({_TOKS})) AS n_unique,
           CAST(len(list_distinct({_TOKS})) AS DOUBLE) / len({_TOKS}) AS ttr,
           CAST(length(replace(text, ' ', '')) AS DOUBLE) / len({_TOKS})
               AS avg_word_len
    FROM documents
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc length/word-count/type-token-ratio/avg-word-length.
    n_chars_calc cross-checks the stored n_chars column (FIXTURES.md).
    Integer/integer divisions are bit-identical across engines — raw."""
    d = _spread(_docs(spark, sf_dir))
    toks = _tokens_col()
    n_tokens = F.size(toks).cast("bigint")
    n_unique = F.size(F.array_distinct(toks)).cast("bigint")
    return d.select(
        "doc_id",
        "n_chars",
        F.length("text").cast("bigint").alias("n_chars_calc"),
        n_tokens.alias("n_tokens"),
        n_unique.alias("n_unique"),
        (n_unique.cast("double") / n_tokens).alias("ttr"),
        (
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / n_tokens
        ).alias("avg_word_len"),
    )


@query(
    "text_quality",
    oracle=f"""
    SELECT doc_id, lang,
           round(0.4 * least(len({_TOKS}) / 50.0, 1.0)
               + 0.3 * (CAST(len(list_distinct({_TOKS})) AS DOUBLE) / len({_TOKS}))
               + 0.3 * (1.0 - CAST(len(list_filter({_TOKS}, x -> x IN ('a', 'the')))
                               AS DOUBLE) / len({_TOKS})), 6) AS quality
    FROM documents
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score: length saturation + lexical diversity +
    (1 - stopword ratio), the standard pre-training filter shape."""
    toks = _tokens_col()
    n_tok = F.size(toks).cast("double")
    n_uniq = F.size(F.array_distinct(toks)).cast("double")
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast("double")
    score = (
        0.4 * F.least(n_tok / 50.0, F.lit(1.0))
        + 0.3 * (n_uniq / n_tok)
        + 0.3 * (1.0 - n_stop / n_tok)
    )
    return _spread(_docs(spark, sf_dir)).select(
        "doc_id", "lang", F.round(score, 6).alias("quality")
    )


@query(
    "text_fingerprint",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
    SELECT doc_id,
           md5(array_to_string(toks, ' ')) AS fp,
           CASE WHEN len(toks) >= 3 THEN
               list_aggregate(list_transform(generate_series(1, len(toks) - 2),
                   i -> md5(concat_ws(' ', toks[i], toks[i+1], toks[i+2]))), 'min')
           END AS min_shingle_fp
    FROM t
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: whole-text md5 + min 3-token-shingle md5
    (a 1-permutation MinHash, cross-engine-stable because md5 is)."""
    d = _spread(_docs(spark, sf_dir)).withColumn("toks", _tokens_col())
    shingle = lambda i: F.md5(
        F.concat_ws(
            " ",
            F.element_at("toks", i),
            F.element_at("toks", i + F.lit(1)),
            F.element_at("toks", i + F.lit(2)),
        )
    )
    min_shingle = F.array_min(
        F.transform(F.sequence(F.lit(1), F.size("toks") - 2), shingle)
    )
    return d.select(
        "doc_id",
        F.md5(F.array_join("toks", " ")).alias("fp"),
        F.when(F.size("toks") >= 3, min_shingle).alias("min_shingle_fp"),
    )


@query(
    "text_token_regex",
    oracle=r"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
               AS n_bpe_tokens,
           len(list_distinct(regexp_extract_all(lower(text), '[a-z]+')))
               AS n_word_types
    FROM documents
    """,
)
def text_token_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split vs a BPE-ish regex
    (letter runs | digit runs | single punctuation) — the standard cheap
    proxy for LLM token budgeting. POSIX-simple pattern so the Spark
    (Java regex) and DuckDB (RE2) dialects agree; all JVM-side."""
    d = _spread(_docs(spark, sf_dir))
    bpe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(bpe), 0)).cast("bigint").alias(
            "n_bpe_tokens"
        ),
        F.size(
            F.array_distinct(
                F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), 0)
            )
        )
        .cast("bigint")
        .alias("n_word_types"),
    )


LANG_ID_ORACLE = """
WITH tg AS (
    SELECT doc_id, lang, unnest(list_transform(generate_series(1, length(text) - 2),
                                               i -> substring(text, i, 3))) AS tg
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= '1'
), profile AS (
    SELECT lang, tg FROM (
        SELECT lang, tg, row_number() OVER (PARTITION BY lang
                   ORDER BY count(*) DESC, tg) AS rk
        FROM tg GROUP BY lang, tg
    ) WHERE rk <= 20
), scores AS (
    SELECT d.doc_id, d.lang AS true_lang, p.lang AS cand_lang,
           count(*) AS score
    FROM documents d JOIN profile p ON contains(d.text, p.tg)
    GROUP BY 1, 2, 3
)
SELECT doc_id, true_lang, cand_lang AS pred_lang, score FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
               ORDER BY score DESC, cand_lang) AS rk
    FROM scores
) WHERE rk = 1
"""


@query("lang_id", oracle=LANG_ID_ORACLE)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram language-ID: top-20 char-trigram profile per language,
    trained on a DETERMINISTIC 1/8 SAMPLE of the corpus (md5(doc_id)
    hex prefix — you never profile all of 100 TB to learn 20 trigrams
    per language; the sample is rerun-stable and oracle-mirrorable).
    Docs are then classified by profile overlap (argmax, deterministic
    tie-break).

    Scoring needs NO trigram extraction at all: "distinct profile
    trigram present in this doc" IS substring containment, so each doc
    checks contains(text, tg) against the 5x20 broadcast profile
    arrays — one UTF8String.contains scan per profile trigram, no char
    split, no transform allocation, no per-row hash set. The profile
    branch still extracts trigrams (explode of the transform EXPRESSION
    — see the plan-trap note below) but only over the sample.
    Progression measured at 16x-scaled docs (80k): 39.0 s (full-corpus
    profile, array_intersect scoring) -> 29.7 s (pooled-vocabulary
    intersect) -> 17.8 s (sampled profile) -> 6.3 s (contains scoring).
    Exchanges stay O(|profile|) + O(|docs| x |langs|) at any scale.

    PLAN TRAP (cost 65x when hit): the profile branch must explode the
    transform() EXPRESSION inside the Generate, never a materialized
    array column. Explode over an attribute makes InferFiltersFromGenerate
    add `size(col) > 0 AND isnotnull(col)` on that attribute, and
    predicate pushdown then re-substitutes the alias below the project
    that defined it — re-evaluating the whole trigram transform twice
    per row with split(text) inlined. Measured: 65 s vs 1 s at sf0.1.
    The scoring branch no longer has a Generate at all.
    """
    # ONE spark.sql() call (r9-opt, see catalog.Tables.sql_views):
    # 226 ms of per-call driver-side plan construction -> ~90 ms; the
    # CTE tree parses and analyzes once, every expression below is the
    # identical Catalyst tree the Column chain produced (asserted by
    # oracle equality at all SFs and unchanged plan shape).
    t = Tables(spark, sf_dir)
    v = t.sql_views()
    spread = _spread_hint(t.documents)
    # split to a char array ONCE: substring(text, i, 3) per position is
    # O(len) UTF-8 re-traversal each call => O(len^2) per doc;
    # element_at on the array is O(1). The transform EXPRESSION goes
    # inside the explode (the InferFiltersFromGenerate trap, docstring).
    tgs = (
        "transform(sequence(1, length(text) - 2), i -> "
        "concat(element_at(cs, i), element_at(cs, i + 1), "
        "element_at(cs, i + 2)))"
    )
    # score > 0 after the argmax (not before): identical result — a
    # zero row never outranks a positive one — and the filter runs on
    # |docs| rows instead of becoming a join condition that
    # double-evaluates the scoring lambda.
    return spark.sql(f"""
    WITH spread AS (SELECT {spread} doc_id, text, lang FROM {v}documents),
    samp AS (SELECT lang, text, split(text, '') AS cs FROM spread
             WHERE substring(md5(cast(doc_id as string)), 1, 1) <= '1'),
    tg AS (SELECT lang, explode({tgs}) AS tg FROM samp),
    pr0 AS (SELECT lang, tg, count(*) AS cnt FROM tg GROUP BY lang, tg),
    profile AS (SELECT lang AS cand_lang, tg FROM (
                  SELECT lang, tg, row_number() OVER (
                    PARTITION BY lang ORDER BY cnt DESC, tg) AS rk
                  FROM pr0) WHERE rk <= 20),
    prof_arr AS (SELECT cand_lang, sort_array(collect_list(tg)) AS ptgs
                 FROM profile GROUP BY cand_lang),
    scores AS (SELECT /*+ BROADCAST(p) */ d.doc_id, d.lang AS true_lang,
                      p.cand_lang,
                      cast(size(filter(p.ptgs, t -> contains(d.text, t)))
                           as bigint) AS score
               FROM spread d CROSS JOIN prof_arr p)
    SELECT doc_id, true_lang, cand_lang AS pred_lang, score
    FROM (SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY score DESC, cand_lang) AS rk
          FROM scores)
    WHERE rk = 1 AND score > 0
    """)


# ---------------------------------------------------------------- normalize


@query(
    "text_normalize",
    oracle="""
    SELECT doc_id, norm_text, length(norm_text) AS n_norm_chars
    FROM (
      SELECT doc_id,
             trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
               ' +', ' ', 'g')) AS norm_text
      FROM documents
    )
    """,
    tags=("llm-pipeline", "text"),
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus text normalization (the cleaning pass before tokenize/
    dedup): lowercase, strip non-alphanumerics to spaces, collapse
    whitespace runs, trim. Pure map-side narrow transform — no shuffle,
    streams through the scan at any SF. Regexes are POSIX-simple so the
    Java (Spark) and RE2 (DuckDB) dialects agree."""
    d = _docs(spark, sf_dir)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return d.select(
        "doc_id",
        norm.alias("norm_text"),
        F.length(norm).alias("n_norm_chars"),
    )


@query(
    "text_lm_score",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
    vocab AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY 1),
    total AS (SELECT sum(cnt) AS n FROM vocab),
    scored AS (
      SELECT t.doc_id, count(*) AS n_tokens,
             round(sum(ln(CAST(v.cnt AS DOUBLE) / total.n)), 6) AS sum_lp
      FROM tok t JOIN vocab v USING (tok) CROSS JOIN total
      GROUP BY 1
    )
    SELECT doc_id, n_tokens, -(sum_lp / n_tokens) AS nll,
           round(exp(-(sum_lp / n_tokens)), 6) AS ppl
    FROM scored
    """,
    tags=("llm-pipeline",),
)
def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality score: per-doc mean negative
    log-likelihood (and perplexity) under the corpus's own unigram
    distribution — the classic cheap-LM quality filter a pre-training
    pipeline runs to rank/drop low-likelihood documents.

    Scale design: the vocabulary table is bounded by |vocab|, not
    corpus size -> broadcast; tokens stream map-side through explode ->
    broadcast probe, and the per-doc aggregation partial-combines to
    one row per doc before its exchange. Corpus total token count folds
    in as a literal (one map-side scan agg, same precedent as
    text_tfidf's N).

    Float discipline (registry docstring): ln() may differ by 1 ulp
    across engines, so the per-doc SUM of logs is rounded at 6 digits
    (noise ~1e-13 << 5e-7) and the division by the integer token count
    is then bit-identical; ppl re-rounds after exp() for the same
    reason."""
    # r9-opt: ONE spark.sql() call (catalog.Tables.sql_views): 185 ms
    # of per-call plan construction -> ~80 ms. The tfidf-style PAIRS
    # SHARING rewrite was tried here and REVERTED after a full
    # three-variant A/B (OPTIMIZATION_r09.md): the shared
    # (doc_id, tok, k) exchange costs two extra AQE stage floors and
    # measured 0.98 s vs this shape's 0.56-0.62 s at sf0.1, and its
    # apparent 256x win did not replicate in a three-way interleaved
    # rematch (no-pairs median 10.5 s vs pairs-share 15.3 s, pairs
    # without sharing 13.7 s) — the duplicate explode rides free in
    # parallel slack while extra exchanges always pay. The vocab
    # branch's duplicated token pass remains the documented cheaper
    # trade (the text_tfidf case differs: there BOTH consumers need
    # the pairs table, so its shared exchange replaces real work).
    # Corpus token total = sum(cnt) attached to the ALREADY-BUILT vocab
    # agg via an unpartitioned window (round 2: replaces the eager
    # .collect() scalar and its extra corpus scan); the window's
    # single-partition exchange moves only |vocab| rows.
    t = Tables(spark, sf_dir)
    v = t.sql_views()
    spread = _spread_hint(t.documents)
    return spark.sql(f"""
    WITH spread AS (SELECT {spread} doc_id, text FROM {v}documents),
    tok AS (SELECT doc_id, explode(split(lower(text), ' ')) AS tok
            FROM spread),
    voc0 AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY tok),
    vocab AS (SELECT tok, cnt, cast(sum(cnt) over () as double) AS n_total
              FROM voc0),
    scored AS (SELECT /*+ BROADCAST(v) */ t.doc_id,
                      count(*) AS n_tokens,
                      round(sum(ln(cast(v.cnt as double) / v.n_total)), 6)
                        AS sum_lp
               FROM tok t JOIN vocab v USING (tok)
               GROUP BY t.doc_id)
    SELECT doc_id, n_tokens, -(sum_lp / n_tokens) AS nll,
           round(exp(-(sum_lp / n_tokens)), 6) AS ppl
    FROM scored
    """)


# ------------------------------------------------- corpus n-gram statistics


@query(
    "text_ngram_freq",
    # DuckDB mirror: lambda over range(1, len) indexes the 1-based token
    # list; both engines see identical token streams (fixture text is
    # single-spaced ASCII, verified at all SFs). Tie-break on the bigram
    # string makes the LIMIT cut deterministic.
    oracle="""
    WITH t AS (SELECT string_split(lower(text), ' ') AS toks FROM documents),
    b AS (
      SELECT unnest(list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i + 1])) AS bigram
      FROM t
    )
    SELECT bigram, count(*) AS n
    FROM b GROUP BY bigram
    ORDER BY n DESC, bigram LIMIT 50
    """,
    tags=("llm-text",),
)
def text_ngram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram frequency table (top-50) — the n-gram statistic
    behind LM smoothing tables, contamination probes, and boilerplate
    detection. Bigrams come from zip_with over two shifted slices of
    the token array (the _shingles_col pattern — never an index lambda
    that re-traverses the string, NOTES.md O(len^2) trap), exploded as
    an EXPRESSION (InferFiltersFromGenerate trap). One exchange: the
    per-(bigram) hash agg partial-combines map-side, so the shuffle
    carries at most |vocab|^2 rows per task regardless of corpus size;
    the top-50 is a single-partition take of the tiny agg output."""
    d = _spread(_docs(spark, sf_dir))
    toks = _tokens_col()
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(50)
    )


# ------------------------------------------------- intra-doc repetition


@query(
    "text_repetition",
    # DuckDB mirror of the same two-level aggregate. All counts are
    # exact BIGINTs; the two fractions are single IEEE divisions of
    # exact integers, identical across engines through round(6).
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
    ),
    b AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i + 1])) AS bigram
      FROM t
    ),
    c AS (
      SELECT doc_id, bigram, CAST(count(*) AS BIGINT) AS n
      FROM b GROUP BY doc_id, bigram
    )
    SELECT doc_id,
           CAST(sum(n) AS BIGINT) AS n_bigrams,
           CAST(count(*) AS BIGINT) AS n_distinct,
           round(1.0 - count(*) * 1.0 / sum(n), 6) AS dup_frac,
           round(max(n) * 1.0 / sum(n), 6) AS top_frac
    FROM c GROUP BY doc_id
    """,
    tags=("llm-text",),
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition signals — the MassiveText/Gopher-style
    quality rule that text_quality's inter-doc features don't cover:
    dup_frac = fraction of bigram occurrences that are repeats of an
    earlier bigram in the SAME document, top_frac = share of the single
    most repeated bigram. Boilerplate, keyword-stuffed, and
    template-generated pages score high on both.

    Plan: MAP-ONLY after _spread's narrow fan-out. Bigrams are NUMERIC
    2-shingles (_shingle_hashes_col: hash each token once, fold shifted
    LONG slices — no bigram string ever materializes), then each doc's
    shingle array is array_sort'ed and folded ONCE (F.aggregate) into
    (distinct count, max run length): a per-row O(n log n) kernel with
    bounded memory. The rejected alternative — explode + groupBy(doc,
    bigram) + per-doc rollup — builds a hash table over every distinct
    (doc, bigram) pair in the corpus (~100M groups at 64x docs), which
    spills unpredictably (measured 4-58 s bimodal at 64x vs a steady
    ~3 s for this plan) and gets strictly worse with corpus size; the
    sorted-array fold's footprint is one document, forever. An
    intra-doc 64-bit hash collision (the only kind that could shift a
    count) has probability ~1e-12 even for a million-distinct-bigram
    document."""
    # docs that produce NO bigrams (null or <2-token text) drop from the
    # output — the oracle's unnest does the same; without the filter the
    # engine emits a garbage row per null doc (round-5 null-text sweep)
    d = _spread(_docs(spark, sf_dir)).filter(F.col("text").isNotNull())
    sh = F.array_sort(_shingle_hashes_col(2))
    acc0 = F.struct(
        F.lit(None).cast("long").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("mx"),
        F.lit(0).cast("long").alias("d"),
    )

    def step(acc, x):
        same = acc.prev.isNotNull() & (x == acc.prev)
        run = F.when(same, acc.run + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc.mx, run).alias("mx"),
            (acc.d + F.when(same, 0).otherwise(1)).alias("d"),
        )

    st = F.aggregate(sh, acc0, step)
    n = F.size(sh).cast("long")
    return (
        d.select("doc_id", st.alias("st"), n.alias("n_bigrams"))
        .select(
            "doc_id",
            "n_bigrams",
            F.col("st.d").alias("n_distinct"),
            F.round(
                F.lit(1.0)
                - F.col("st.d").cast("double") / F.col("n_bigrams").cast("double"),
                6,
            ).alias("dup_frac"),
            F.round(
                F.col("st.mx").cast("double") / F.col("n_bigrams").cast("double"), 6
            ).alias("top_frac"),
        )
    )


@query(
    "text_lm_bigram",
    # Interpolated bigram LM: P(w2|w1) = 0.75*B(w1 w2)/U(w1)
    # + 0.25*U(w2)/N. Same float discipline as text_lm_score: all
    # counts are exact ints, p is the same IEEE expression both
    # engines, ln() may differ by 1 ulp -> round the per-doc SUM of
    # logs at 6 digits before the integer division.
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
                 FROM documents),
    uni AS (SELECT tok, count(*) AS c1 FROM tok GROUP BY 1),
    total AS (SELECT sum(c1) AS n FROM uni),
    db AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i + 1])) AS bigram
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks
            FROM documents)
    ),
    big AS (SELECT bigram, count(*) AS c2 FROM db GROUP BY 1),
    bprob AS (
      SELECT b.bigram,
             0.75 * (CAST(b.c2 AS DOUBLE) / u1.c1)
             + 0.25 * (CAST(u2.c1 AS DOUBLE) / total.n) AS p
      FROM big b
      JOIN uni u1 ON u1.tok = string_split(b.bigram, ' ')[1]
      JOIN uni u2 ON u2.tok = string_split(b.bigram, ' ')[2]
      CROSS JOIN total
    )
    SELECT d.doc_id, count(*) AS n_bigrams,
           -(round(sum(ln(p.p)), 6) / count(*)) AS nll2
    FROM db d JOIN bprob p USING (bigram)
    GROUP BY d.doc_id
    """,
    tags=("llm-pipeline",),
)
def text_lm_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model quality score with unigram interpolation
    backoff — one LM rung above text_lm_score's unigram filter (the
    CCNet/KenLM-style scorer shape: condition each token on its
    predecessor, back off for rare continuations).

    Scale design: every model table is bounded by VOCABULARY, not
    corpus — unigram counts |V|, bigram counts <= |V|^2 — so the whole
    probability table broadcasts; the corpus streams map-side through
    explode -> broadcast probe exactly like text_lm_score, and the
    per-doc aggregation partial-combines before its one exchange. The
    probability is assembled once per DISTINCT bigram (tiny table),
    never per corpus position."""
    # ONE spark.sql() call (r9-opt): this builder was the most
    # construction-expensive of the headline set — 552 ms of pure
    # driver-side work per call, dominated by the eager re-analysis
    # every DataFrame transformation pays (~28-46 ms/op as the tree
    # grows; see catalog.Tables.sql_views). The monolithic SQL parses
    # and analyzes the complete tree once: 552 -> 104 ms, bit-identical
    # result (values AND dtypes asserted), same physical plan (6
    # BroadcastHashJoin, 0 SortMergeJoin, same exchange count). Float
    # literals carry the D suffix so they stay doubles (bare SQL floats
    # parse as DECIMAL).
    t = Tables(spark, sf_dir)
    v = t.sql_views()
    spread = _spread_hint(t.documents)
    toks = "split(lower(text), ' ')"
    bigrams = (
        f"zip_with(slice({toks}, 1, size({toks}) - 1),"
        f" slice({toks}, 2, size({toks}) - 1),"
        " (a, b) -> concat(a, ' ', b))"
    )
    # Corpus total = sum(c1) attached to the unigram agg via an
    # unpartitioned window over the |V|-bounded agg output (round 2:
    # replaces the eager scalar .collect() and its extra corpus scan).
    return spark.sql(f"""
    WITH spread AS (SELECT {spread} doc_id, text FROM {v}documents),
    tok AS (SELECT doc_id, explode({toks}) AS tok FROM spread),
    uni0 AS (SELECT tok, count(*) AS c1 FROM tok GROUP BY tok),
    uni AS (SELECT tok, c1, cast(sum(c1) over () as double) AS n_total
            FROM uni0),
    db AS (SELECT doc_id, explode({bigrams}) AS bigram FROM spread),
    big AS (SELECT bigram, count(*) AS c2 FROM db GROUP BY bigram),
    bprob AS (SELECT /*+ BROADCAST(u1), BROADCAST(u2) */ b.bigram,
                     0.75D * (cast(b.c2 as double) / u1.c1)
                   + 0.25D * (cast(u2.c1 as double) / u2.n_total) AS p
              FROM big b JOIN uni u1 ON split(b.bigram, ' ')[0] = u1.tok
                         JOIN uni u2 ON split(b.bigram, ' ')[1] = u2.tok)
    SELECT /*+ BROADCAST(p) */ d.doc_id, count(*) AS n_bigrams,
           -(round(sum(ln(p.p)), 6) / count(*)) AS nll2
    FROM db d JOIN bprob p ON d.bigram = p.bigram
    GROUP BY d.doc_id
    """)


@query(
    "text_pii_scrub",
    oracle="""
    WITH raw AS (
      SELECT doc_id, lang,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or 555-'
                  || CAST(n_chars AS VARCHAR) AS body
      FROM documents
    )
    SELECT doc_id, lang,
           len(regexp_extract_all(body, '[a-z0-9]+@[a-z]+\\.[a-z]+'))
             AS n_emails,
           len(regexp_extract_all(body, '555-[0-9]+')) AS n_phones,
           md5(regexp_replace(
                 regexp_replace(body, '[a-z0-9]+@[a-z]+\\.[a-z]+',
                                '<EMAIL>', 'g'),
                 '555-[0-9]+', '<PHONE>', 'g')) AS scrub_md5,
           length(regexp_replace(
                 regexp_replace(body, '[a-z0-9]+@[a-z]+\\.[a-z]+',
                                '<EMAIL>', 'g'),
                 '555-[0-9]+', '<PHONE>', 'g')) AS scrub_len
    FROM raw
    """,
    tags=("llm", "text", "pipeline"),
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction — the compliance pass every training-data pipeline
    runs before anything else: mask emails and phone-shaped tokens,
    count what was redacted. The fixture corpus is synthetic word soup
    with no PII, so the op first APPENDS a deterministic contact string
    derived from fixture columns (doc_id, n_chars) — the scrubber then
    has real work whose result is still oracle-checkable; the synthesis
    is identical in the SQL so both engines scrub the same bytes.

    Map-side compute (scan -> _spread fan-out -> project; the fan-out
    is a no-op on a many-file table): regexp_extract_all
    counts matches, two chained regexp_replace passes mask them; the
    checked columns are exact (counts, lengths, md5 of the scrubbed
    text). Patterns stay POSIX-simple — no lookarounds, no shorthand
    classes — so Java and RE2-ish dialects agree. At 100 TB this is
    the canonical embarrassingly-parallel scan: no exchange, and the
    regex cost is the whole story (pre-filtering with cheap contains()
    guards before the regex engine is the production trick; here the
    guard would always pass, so it is omitted)."""
    # ONE spark.sql() call (r9-opt, catalog.Tables.sql_views): 129 ms
    # of per-call plan construction -> ~55 ms. SQL string literals eat
    # one level of backslash escaping (Spark's parser, ANSI off), so
    # the regex backslashes are doubled INTO the SQL text — the parsed
    # pattern is byte-identical to the Column form's.
    email_pat = "[a-z0-9]+@[a-z]+\\.[a-z]+".replace("\\", "\\\\")
    phone_pat = "555-[0-9]+"
    t = Tables(spark, sf_dir)
    v = t.sql_views()
    spread = _spread_hint(t.documents)
    # scrubbed materializes in its OWN projection: md5 and length both
    # consume it, and projection-level CSE does not always share a
    # chained-regex subexpression — one column, two cheap readers.
    return spark.sql(f"""
    WITH spread AS (SELECT {spread} doc_id, lang, text, n_chars
                    FROM {v}documents),
    staged AS (SELECT doc_id, lang,
                      concat(text, ' contact user',
                             cast(doc_id as string),
                             '@example.com or 555-',
                             cast(n_chars as string)) AS body
               FROM spread),
    s AS (SELECT doc_id, lang,
                 size(regexp_extract_all(body, '{email_pat}', 0))
                   AS n_emails,
                 size(regexp_extract_all(body, '{phone_pat}', 0))
                   AS n_phones,
                 regexp_replace(regexp_replace(body, '{email_pat}',
                                               '<EMAIL>'),
                                '{phone_pat}', '<PHONE>') AS scrubbed
          FROM staged)
    SELECT doc_id, lang, n_emails, n_phones,
           md5(scrubbed) AS scrub_md5, length(scrubbed) AS scrub_len
    FROM s
    """)


_SEG = 10  # tokens per segment (the "line" unit on this newline-free corpus)
# Adaptive-path cutoff for segment/chunk generators (dedup_lines,
# pipeline_chunk): docs at or under this RAW CHAR length take the
# codegen explode+slice path (its O(tokens²/stride) carried-array term
# is capped — tokens <= chars/2 + 1 — and it is 2x faster than
# interpreted transform() on normal docs, 256x A/B); bigger docs take
# the linear transform+posexplode path that cannot hang. Char length is
# the predicate because it is a scan-column codegen compare — a
# size(tokens) predicate would force the tokenizing split once per
# branch.
_BIG_DOC_CHARS = 32768  # ~<= 16k tokens -> carried arrays <= 32 KB


@query(
    "dedup_lines",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
               FROM documents),
    s AS (SELECT doc_id, i AS seg_idx,
            array_to_string(list_slice(toks, i*{_SEG}+1, i*{_SEG}+{_SEG}), ' ') AS seg
          FROM t, LATERAL (
            SELECT unnest(range(CAST(ceil(len(toks) / {_SEG}.0) AS BIGINT))) AS i) g),
    k AS (SELECT doc_id, seg_idx,
            row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
          FROM s)
    SELECT doc_id, count(*) AS n_segs,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           round(CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS kept_frac
    FROM k GROUP BY doc_id
    """,
    tags=("llm-pipeline",),
)
def dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document SEGMENT dedup (CCNet/RefinedWeb line-dedup): split
    each doc into 10-token segments, keep only the globally FIRST
    occurrence of each segment (order = doc_id, seg_idx), report per-doc
    survival. This is the boilerplate-removal pass of a web-corpus
    pipeline — headers/footers/nav text repeat across millions of pages
    and survive whole-doc dedup (different docs) AND intra-doc
    repetition checks (once per doc); segment-level first-wins is the
    standard kill. The corpus has no newlines, so the segment unit is a
    fixed 10-token window instead of a physical line — same operator
    shape, same oracle semantics.

    Scale: segments explode from a sequence (no lambda-captured
    re-evaluation — the pipeline_chunk pattern), the only exchange
    carries (md5(seg), doc_id, seg_idx) — constant 16-byte key
    regardless of segment text, exactly dedup_exact's discipline — and
    the first-occurrence choice is one window sort within each hash
    bucket. Work ∝ corpus tokens; never pairwise. The per-doc rollup
    reuses the doc_id already present on every row."""
    d = _spread(_docs(spark, sf_dir))
    # ADAPTIVE segment generation (round-6 big-doc probe + 256x A/B):
    # - docs <= _BIG_DOC_CHARS take the CODEGEN path (explode the
    #   seg_idx sequence, slice in the projection). It carries the
    #   token array per exploded row — O(tokens²/SEG) per doc — which
    #   is a hard hang on one real 4 MB document (600k tokens -> 60k
    #   rows x 4 MB array) but harmless when capped (4096² /10 ≈ 1.7M
    #   cells/doc) and 2x faster than the lambda path on normal docs
    #   (256x A/B: 2.2 s vs 4.2 s — higher-order transform() is
    #   interpreted, the exploded projection is whole-stage codegen).
    # - bigger docs take the LINEAR path: per-segment md5 built inside
    #   ONE transform() over the array, posexplode ships only the
    #   16-byte hash. Both branches are map-side of the seg_h exchange,
    #   so the union costs no extra shuffle.
    # The branch predicate is RAW CHAR LENGTH (a scan-column codegen
    # compare), NOT size(toks): a size(toks) filter forces the
    # tokenizing split to run once per branch — measured 3.9 s vs the
    # 2.2 s codegen floor at 256x. Chars bound tokens from above
    # (tokens <= chars/2 + 1), so the char cutoff keeps the carried
    # array capped; which PATH a doc takes never changes its output.
    # ONE spark.sql() call (r9-opt, catalog.Tables.sql_views): 231 ms
    # of per-call plan construction -> ~80 ms; branch expressions are
    # verbatim the Column forms' trees (small branch divides by a
    # DOUBLE literal, big branch keeps the original F.expr's decimal
    # literal — both ceil to the same count; oracle-equal at all SFs).
    t = Tables(spark, sf_dir)
    v = t.sql_views()
    spread = _spread_hint(t.documents)
    seg_arr = (
        f"transform(sequence(0L, cast(ceil(size(toks) / {_SEG}.0) as long)"
        f" - 1), i -> md5(concat_ws(' ',"
        f" slice(toks, cast(i * {_SEG} + 1 as int), {_SEG}))))"
    )
    return spark.sql(f"""
    WITH spread AS (SELECT {spread} doc_id, text FROM {v}documents),
    small AS (SELECT doc_id, split(lower(text), ' ') AS toks FROM spread
              WHERE length(text) <= {_BIG_DOC_CHARS}),
    big AS (SELECT doc_id, split(lower(text), ' ') AS toks FROM spread
            WHERE length(text) > {_BIG_DOC_CHARS}),
    segs_small AS (
      SELECT doc_id, seg_idx,
             md5(concat_ws(' ',
                 slice(toks, cast(seg_idx * {_SEG} + 1 as int), {_SEG})))
               AS seg_h
      FROM (SELECT doc_id, toks,
                   explode(sequence(cast(0 as bigint),
                     cast(ceil(size(toks) / {float(_SEG)}D) as bigint) - 1))
                     AS seg_idx
            FROM small)),
    segs_big AS (
      SELECT doc_id, seg_idx, seg_h
      FROM big LATERAL VIEW posexplode({seg_arr}) g AS seg_idx, seg_h),
    segs AS (SELECT * FROM segs_small UNION ALL SELECT * FROM segs_big),
    w AS (SELECT doc_id,
                 row_number() OVER (PARTITION BY seg_h
                                    ORDER BY doc_id, seg_idx) AS rn
          FROM segs)
    SELECT doc_id, count(*) AS n_segs,
           sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS n_kept,
           round(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) / count(*), 6)
             AS kept_frac
    FROM w GROUP BY doc_id
    """)


@query(
    "text_entropy",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
                 FROM documents),
    c AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
    n AS (SELECT doc_id, CAST(sum(c) AS DOUBLE) AS n,
                 sum(c * ln(c)) AS clc, count(*) AS n_unique
          FROM c GROUP BY 1)
    SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, n_unique,
           round(ln(n) - clc / n, 6) AS token_entropy,
           round((ln(n) - clc / n)
                 / (CASE WHEN n_unique > 1 THEN ln(n_unique) ELSE 1.0 END),
                 6) AS norm_entropy
    FROM n
    """,
    tags=("llm-pipeline",),
)
def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution Shannon entropy per document — the classic
    gibberish/boilerplate quality signal (near-zero = one token
    repeated; near-ln(unique) = flat distribution). Uses the
    shuffle-free identity H = ln(n) - (Σ c·ln c)/n so only per-token
    COUNTS aggregate, never probabilities (log of a ratio would lose
    the partial-aggregation property). norm_entropy divides by the
    max achievable ln(n_unique), giving a scale-free [0,1] score.

    Scale: explode → two hash aggregations, both with map-side partial
    combine; the shuffle carries (doc_id, token, count) DISTINCT pairs,
    bounded by per-doc vocabulary, not token count. At 100 TB this is
    the same shape as a word-count — the canonical linear pipeline."""
    d = _spread(_docs(spark, sf_dir))
    c = (
        d.select("doc_id", F.explode(_tokens_col()).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    n = c.groupBy("doc_id").agg(
        F.sum("c").cast("double").alias("n"),
        F.sum(F.col("c") * F.log(F.col("c"))).alias("clc"),
        F.count("*").alias("n_unique"),
    )
    ent = F.log("n") - F.col("clc") / F.col("n")
    denom = F.when(F.col("n_unique") > 1, F.log("n_unique")).otherwise(F.lit(1.0))
    return n.select(
        "doc_id",
        F.col("n").cast("long").alias("n_tokens"),
        "n_unique",
        F.round(ent, 6).alias("token_entropy"),
        F.round(ent / denom, 6).alias("norm_entropy"),
    )


_DEDUP_RECALL_FLOOR = 0.8
_DEDUP_PROBE = 512  # brute-force probe sample size (bounded at any corpus)


@query("dedup_recall", oracle=None)  # recall of approximations: no SQL twin
def dedup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of the approximate dedup families, IN-BAND (the ann_recall
    pattern applied to text dedup): one row per method with
    (truth_pairs, found_pairs, recall, recall_floor), floor asserted
    inside the query via raise_error so a banding/bucketing regression
    fails the driver's rows-only run loudly.

    Ground truth is a BOUNDED brute-force probe: the first 512 docs by
    md5(doc_id) (deterministic at every corpus size), all ~131k probe
    pairs exact-shingle-Jaccard'd — the only quadratic is 512², fixed
    by construction, exactly the bounded-sample discipline of the ANN
    codebooks. Rows:

    - minhash: truth = probe pairs with exact 3-shingle Jaccard >= 0.5,
      found = dedup_minhash's candidate-verified output restricted to
      the probe. The fixture's true near-dups are exact-text dups
      (J = 1.0), which collide in every LSH band, so recall is 1.0
      deterministically; the 0.8 floor leaves room for borderline-J
      pairs in future corpora (single-band collision odds).
    - simhash: truth = probe pairs with EQUAL token sets (dedup_near's
      signature), found = probe pairs sharing a simhash fingerprint —
      1.0 by construction (the fingerprint is a function of the token
      set); any miss means the fingerprint stopped being one.

    Empty truth (small fixtures have no near-dups in the probe) reports
    recall = 1.0 with truth_pairs = 0 — the assertion only fires on
    truth_pairs > 0."""
    d = _docs(spark, sf_dir)
    probe = (
        d.withColumn("r", F.md5(F.col("doc_id").cast("string")))
        .orderBy("r", "doc_id")
        .limit(_DEDUP_PROBE)
        .select(
            "doc_id",
            F.array_distinct(_shingle_hashes_col(3)).alias("shs"),
            _sig_col().alias("sig"),
        )
    )
    a = probe.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shs").alias("sa"),
        F.col("sig").alias("sig_a"),
    )
    b = probe.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shs").alias("sb"),
        F.col("sig").alias("sig_b"),
    )
    ni = F.size(F.array_intersect("sa", "sb"))
    pairs = (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn("j", ni / (F.size("sa") + F.size("sb") - ni))
        .select("doc_a", "doc_b", "j", "sig_a", "sig_b")
    )
    truth_mh = pairs.filter(F.col("j") >= 0.5).select("doc_a", "doc_b")
    mh = dedup_minhash(spark, sf_dir).select("doc_a", "doc_b")
    found_mh = truth_mh.join(mh, ["doc_a", "doc_b"], "left_semi")

    truth_sh = pairs.filter(F.col("sig_a") == F.col("sig_b")).select(
        "doc_a", "doc_b"
    )
    fps = dedup_simhash(spark, sf_dir).select("doc_id", "simhash")
    found_sh = (
        truth_sh.join(
            fps.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("fa")),
            "doc_a",
        )
        .join(
            fps.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("fb")),
            "doc_b",
        )
        .filter(F.col("fa") == F.col("fb"))
    )

    # scale-stable truth: EXACT-text duplicate pairs are true J=1.0
    # near-dups discoverable at ANY corpus size with one linear shuffle
    # (md5(text) groupBy) — no quadratic, no sample dilution. The random
    # probe above goes empty once the corpus dwarfs 512 docs (measured:
    # 28 truth pairs at 1k docs, 0 at 5.12M), so this row keeps the
    # recall signal alive at scale. Groups are bounded to 512 (md5
    # order) and pairs to the first 8 ids per group — a whale group of
    # k copies would otherwise contribute k² pairs.
    # null/empty text is excluded from the truth: all null-text docs
    # share the NULL md5 key and would form one fake "duplicate" group
    # whose pairs minhash (no shingles for null docs) can never find —
    # a spurious floor trip on any corpus with >=2 null docs.
    grp = (
        d.filter(F.col("text").isNotNull() & (F.length("text") > 0))
        .groupBy(F.md5(F.col("text")).alias("h"))
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
        .orderBy("h")
        .limit(512)
        .select(F.slice("ids", 1, 8).alias("ids"))
    )
    truth_ex = (
        grp.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, x -> "
                    "transform(filter(ids, y -> y > x), "
                    "y -> struct(x AS doc_a, y AS doc_b))))"
                )
            ).alias("p")
        ).select("p.*")
    )
    found_ex = truth_ex.join(mh, ["doc_a", "doc_b"], "left_semi")

    def row(method, truth, found):
        return (
            truth.agg(F.count("*").alias("truth_pairs"))
            .crossJoin(found.agg(F.count("*").alias("found_pairs")))
            .select(
                F.lit(method).alias("method"),
                F.col("truth_pairs").cast("long").alias("truth_pairs"),
                F.col("found_pairs").cast("long").alias("found_pairs"),
            )
        )

    res = (
        row("minhash_j0.5", truth_mh, found_mh)
        .unionByName(row("simhash_tokenset", truth_sh, found_sh))
        .unionByName(row("minhash_exactdup", truth_ex, found_ex))
    )
    recall = F.when(F.col("truth_pairs") == 0, F.lit(1.0)).otherwise(
        F.round(F.col("found_pairs") / F.col("truth_pairs"), 4)
    )
    guarded = F.when(recall >= F.lit(_DEDUP_RECALL_FLOOR), recall).otherwise(
        F.raise_error(
            F.concat(
                F.lit("dedup recall below documented floor "),
                F.lit(str(_DEDUP_RECALL_FLOOR)),
                F.lit(": method="),
                F.col("method"),
                F.lit(" recall="),
                recall.cast("string"),
            )
        ).cast("double")
    )
    return res.select(
        "method",
        "truth_pairs",
        "found_pairs",
        guarded.alias("recall"),
        F.lit(_DEDUP_RECALL_FLOOR).alias("recall_floor"),
    )


_DNG_N = 3  # shingle width shared with dedup_minhash (FIXTURES: the
# 31-word fixture vocabulary saturates UNIGRAM overlap; 3-shingles keep
# a real spread — dup_frac spans 0.33..1.0 at sf0.01).


@query(
    "text_dup_ngrams",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
      WHERE text IS NOT NULL AND len({_TOKS}) >= {_DNG_N}
    ),
    s AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(toks) - {_DNG_N - 1}),
                 i -> md5(concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS sh
      FROM t
    ),
    d AS (SELECT sh, count(DISTINCT doc_id) AS nd FROM s GROUP BY sh)
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN d.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
           round(CAST(sum(CASE WHEN d.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS dup_frac
    FROM s JOIN d USING (sh)
    GROUP BY s.doc_id
    """,
    tags=("llm-pipeline", "dedup"),
)
def text_dup_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-n-gram fraction — the span-level dedup
    SIGNAL (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better", public): for each document, the fraction
    of its 3-token shingle positions whose shingle also occurs in at
    least one OTHER document. Downstream curation thresholds on it
    instead of dropping whole near-dup docs.

    Exactness: the shingle key is md5 of the space-joined window
    (text_fingerprint's cross-engine-stable key — NOT the xxhash64
    fast path, whose 64-bit collisions would be engine-internal);
    counts are integers and the one emitted float divides two exact
    BIGINTs, rounded 6dp on both sides. "Occurs in >= 2 distinct
    documents" is computed as min(doc_id) != max(doc_id) over the
    DEDUPED (sh, doc_id) pairs — exactly the oracle's nd >= 2 without
    materializing the count (min/max skip NULL doc_ids just as
    count(DISTINCT doc_id) does; the coalesce covers the all-NULL
    shingle, where the oracle's nd = 0).

    Scale: ONE scan -> groupBy(sh, doc_id) [uniform composite key,
    instances collapsed map-side] -> min/max window over the deduped
    pairs keyed by sh -> groupBy(doc_id). Three skew-bounded shuffles,
    no self-join, no broadcast anywhere. The original shape joined a
    per-shingle frequency agg back to the instance table; measured at
    the 256x fixture (1.28M docs), AQE re-planned that join into a
    broadcast whose BUILD side was the 40M-row pair set — a 9.5 GiB
    hashed relation collected through the driver (maxResultSize abort
    at default confs, cannotBroadcastTableOverMaxTableBytes at raised
    ones), while AQE-off ran it fine. The window shape removes the
    hazard class instead of pinning a join hint, and drops the second
    corpus scan + shingle explode the join shape paid. The n_dup >= 2
    predicate cannot be pushed below the corpus-wide statistic by
    definition — irreducibly two-pass."""
    d = _spread(_docs(spark, sf_dir))
    s = (
        d.filter(
            F.col("text").isNotNull() & (F.size(_tokens_col()) >= _DNG_N)
        )
        .select(
            "doc_id",
            F.explode(
                F.transform(_shingles_col(_DNG_N), lambda sh: F.md5(sh))
            ).alias("sh"),
        )
    )
    pairs = s.groupBy("sh", "doc_id").agg(F.count("*").alias("cnt"))
    wsh = W.partitionBy("sh")
    dup = F.coalesce(
        (F.min("doc_id").over(wsh) != F.max("doc_id").over(wsh))
        .cast("long"),
        F.lit(0),
    )
    return (
        pairs.withColumn("dup", dup)
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_shingles"),
            F.sum(F.col("cnt") * F.col("dup")).cast("bigint").alias("n_dup"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_dup",
            F.round(
                F.col("n_dup").cast("double") / F.col("n_shingles"), 6
            ).alias("dup_frac"),
        )
    )
