"""Training-data pipeline operators over the documents corpus.

These are the corpus-preparation steps a large-scale LLM training
pipeline runs between raw crawl and tokenizer: weighted mixture
sampling across sources, deterministic train/val/test splitting,
sequence packing to a token budget, and an end-to-end curation pass
(quality filter -> exact dedup -> embedding attach).

Determinism doctrine (shared with sample_det in analytics.py): all
randomness is md5-hash-derived from stable keys, never rand(). A rerun
over 100 TB — or a backfill over one repaired partition — selects
exactly the same rows, and the DuckDB oracle can reproduce the choice
bit-for-bit. Hex-prefix thresholds compare lexicographically, which
for fixed-width lowercase hex equals numeric comparison, so no engine
needs hex->int conversion (DuckDB lacks Spark's conv()).

Scale notes:
- mixture/split are pure map-side filters/projections: zero shuffle,
  predicates evaluated per-row during the scan. At 100 TB they are
  scan-bound and embarrassingly parallel.
- pack is one shuffle (repartition by lang) + one window cumsum per
  partition — the contiguous-greedy packing a streaming tokenizer
  applies; bin assignment is a closed-form floor-div over the running
  token count, not an iterative loop.
- curate's dedup shuffles on md5(text) (uniform key, no skew) and the
  embedding attach is a shuffle equi-join on doc_id — both scale
  linearly; quality predicates run map-side before either shuffle so
  rejected rows never hit the network.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import window as _w

from pandas_tsdb_spark.catalog import Tables
from pandas_tsdb_spark.registry import query

W = _w.Window

# ------------------------------------------------------- mixture sampling

# source -> keep-fraction numerator (out of 256, encoded as the 2-hex-char
# threshold the md5 prefix is compared against). Unlisted sources default
# to DEFAULT_KEEP. In production this table is the mixture config the
# training run declares (e.g. wiki x2 oversample would repeat rows; here
# we only downsample, the oracle-able half).
MIXTURE = {"src0": "ff", "src1": "bf", "src2": "7f", "src3": "3f", "src4": "1f"}
DEFAULT_KEEP = "7f"


@query(
    "pipeline_mixture",
    oracle=f"""
    WITH wt(source, thr) AS (
      VALUES {", ".join(f"('{s}', '{t}')" for s, t in MIXTURE.items())}
    )
    SELECT d.doc_id, d.source, d.lang
    FROM documents d LEFT JOIN wt ON d.source = wt.source
    WHERE substr(md5(d.source || ':' || CAST(d.doc_id AS VARCHAR)), 1, 2)
          <= coalesce(wt.thr, '{DEFAULT_KEEP}')
    """,
    tags=("llm-pipeline",),
)
def pipeline_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted dataset-mixture sampling: each source keeps a configured
    fraction of its documents, chosen by md5(source:doc_id) hex prefix
    against a per-source threshold. The weights table is a handful of
    rows -> broadcast; the filter itself is map-side, so the 100 TB scan
    emits only the sampled subset and nothing shuffles."""
    # ONE spark.sql() call (r10-opt): inline VALUES weights table +
    # BROADCAST hint replace the createDataFrame round trip.
    v = Tables(spark, sf_dir).sql_views()
    vals = ", ".join(f"('{s}', '{t}')" for s, t in MIXTURE.items())
    return spark.sql(f"""
    SELECT /*+ BROADCAST(wt) */ d.doc_id, d.source, d.lang
    FROM {v}documents d
    LEFT JOIN (VALUES {vals}) AS wt(source, thr) ON d.source = wt.source
    WHERE substr(md5(concat_ws(':', d.source, CAST(d.doc_id AS STRING))),
                 1, 2) <= coalesce(wt.thr, '{DEFAULT_KEEP}')
    """)


# ------------------------------------------------------- train/val/test split


@query(
    "pipeline_split",
    oracle="""
    SELECT doc_id,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= 'cc'
                THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= 'e5'
                THEN 'val'
                ELSE 'test' END AS split,
           lang, n_chars
    FROM documents
    """,
    tags=("llm-pipeline",),
)
def pipeline_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~80/10/10 train/val/test split by md5(doc_id)
    bucket ('00'..'cc' / 'cd'..'e5' / 'e6'..'ff' = 205/25/26 of 256).
    Hash-based assignment is the only split that survives re-runs,
    repartitioning, and incremental corpus growth (a doc's split never
    changes when other docs arrive). Pure projection: no shuffle."""
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT doc_id,
           CASE WHEN substr(md5(CAST(doc_id AS STRING)), 1, 2) <= 'cc'
                THEN 'train'
                WHEN substr(md5(CAST(doc_id AS STRING)), 1, 2) <= 'e5'
                THEN 'val'
                ELSE 'test' END AS split,
           lang, n_chars
    FROM {v}documents
    """)


# ------------------------------------------------------- sequence packing

PACK_BUDGET = 256  # tokens per packed sequence


@query(
    "pipeline_pack",
    oracle=f"""
    SELECT doc_id, lang, n_tokens,
           CAST(cum_before // {PACK_BUDGET} AS BIGINT) AS pack_id,
           CAST(cum_before + n_tokens AS BIGINT) AS cum_tokens
    FROM (
      SELECT doc_id, lang,
             len(string_split(text, ' ')) AS n_tokens,
             coalesce(sum(len(string_split(text, ' '))) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS cum_before
      FROM documents
    )
    """,
    tags=("llm-pipeline",),
)
def pipeline_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous greedy sequence packing: docs stream in doc_id order
    within each lang and fall into fixed token-budget bins; a doc's bin
    is floor(tokens_before_it / budget) — the closed-form equivalent of
    feeding a streaming tokenizer, computed as ONE window cumsum
    instead of an iterative loop. One shuffle (partition by lang); at
    100 TB, partition instead by (lang, shard) where shard =
    hash-bucket of doc_id to bound per-partition state, at the cost of
    packing discontinuities at shard edges."""
    # ONE spark.sql() call (r10-opt): same one-shuffle window cumsum.
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT doc_id, lang, n_tokens,
           cum_before div {PACK_BUDGET} AS pack_id,
           cum_before + n_tokens AS cum_tokens
    FROM (
      SELECT doc_id, lang, n_tokens,
             coalesce(sum(n_tokens) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS cum_before
      FROM (SELECT doc_id, lang, size(split(text, ' ')) AS n_tokens
            FROM {v}documents)
    )
    """)


# ------------------------------------------------------- end-to-end curation


@query(
    "pipeline_curate",
    oracle="""
    WITH keep AS (
      SELECT min(doc_id) AS doc_id
      FROM documents
      WHERE n_chars >= 50
        AND len(string_split(text, ' ')) >= 10
      GROUP BY md5(text)
    )
    SELECT d.doc_id, d.lang, d.source,
           len(string_split(d.text, ' ')) AS n_tokens,
           e.label
    FROM keep k
    JOIN documents d ON d.doc_id = k.doc_id
    JOIN embeddings e ON e.vec_id = d.doc_id
    """,
    tags=("llm-pipeline",),
)
def pipeline_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation: quality gate (length + word count,
    evaluated map-side during the scan) -> exact dedup keeping the
    lowest doc_id per md5(text) -> attach the embedding row (label
    stands in for the vector payload so the oracle can hash it). The
    dedup shuffles on md5(text) — uniform, skew-free — and re-joins the
    winners back to documents on doc_id; the embedding attach is a
    plain equi-join both engines plan identically. At 100 TB each stage
    is one linear shuffle; no step holds more than a key+id pair per
    group in state."""
    from pandas_tsdb_spark.operators.llm_text import _spread_hint

    t = Tables(spark, sf_dir)
    v = t.sql_views()
    spread = _spread_hint(t.documents)
    # The winner row's attributes ride THROUGH the dedup aggregation:
    # min(struct(doc_id, ...)) compares lexicographically and doc_id —
    # unique — leads, so the min struct IS the min-doc_id row, attrs
    # attached. The old shape re-joined winners back to a second
    # `narrow` corpus branch; the r9 final-plan capture showed that
    # branch as a SECOND full documents scan + spread exchange at
    # runtime (per-branch filter/column pruning makes the subtrees
    # canonically unequal, so AQE exchange reuse cannot fire). One
    # struct per group replaces a corpus scan, a corpus-wide exchange
    # and a join; the agg exchange carries (md5, 4 narrow fields) —
    # never text.
    # ONE spark.sql() call (r10-opt): same min(struct) winner-carry
    # plan — 2 scans (documents + embeddings broadcast), 2 exchanges.
    return spark.sql(f"""
    WITH spread AS (
      SELECT {spread} doc_id, lang, source, text, n_chars
      FROM {v}documents
    ),
    win AS (
      SELECT min(named_struct(
               'doc_id', doc_id, 'lang', lang, 'source', source,
               'n_tokens', size(split(text, ' ')))) AS w
      FROM spread
      WHERE n_chars >= 50 AND size(split(text, ' ')) >= 10
      GROUP BY md5(text)
    )
    SELECT w.doc_id AS doc_id, w.lang AS lang, w.source AS source,
           w.n_tokens AS n_tokens, e.label AS label
    FROM win
    JOIN (SELECT vec_id AS doc_id, label FROM {v}embeddings) e
      ON w.doc_id = e.doc_id
    """)


# ------------------------------------------------------- training-order shuffle


@query(
    "pipeline_shuffle",
    oracle="""
    SELECT doc_id, shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY k, doc_id)
                AS BIGINT) AS pos
    FROM (
      SELECT doc_id,
             md5('shuffle:' || CAST(doc_id AS VARCHAR)) AS k,
             substr(md5('shuffle:' || CAST(doc_id AS VARCHAR)), 1, 2) AS shard
      FROM documents
    )
    """,
    tags=("llm-pipeline",),
)
def pipeline_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle, sharded: each doc
    hashes to one of 256 shards (md5 hex prefix) and gets a position
    within its shard by hash order. This is how a 100 TB corpus is
    actually randomized for training: a single global ORDER BY
    md5(key) needs a full range-exchange + total sort, while
    shard + within-shard order gives the same statistical shuffle with
    one hash exchange and a per-partition sort, and readers stream
    shards independently. Rerun-stable (md5, not rand()) so a resumed
    job or a backfilled partition reproduces the identical order."""
    # ONE spark.sql() call (r10-opt): mirrors the oracle text.
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT doc_id, shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY k, doc_id)
                AS BIGINT) AS pos
    FROM (
      SELECT doc_id,
             md5(concat('shuffle:', CAST(doc_id AS STRING))) AS k,
             substr(md5(concat('shuffle:', CAST(doc_id AS STRING))), 1, 2)
               AS shard
      FROM {v}documents
    )
    """)


# ------------------------------------------------- benchmark decontamination


@query(
    "pipeline_decontaminate",
    oracle="""
    WITH g AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(string_split(lower(text), ' ')) - 3,
                                           0)),
               i -> array_to_string((string_split(lower(text), ' '))[i:i+3], ' ')
             )) AS ngs
      FROM documents
    ),
    e AS (SELECT DISTINCT unnest(ngs) AS ng FROM g WHERE doc_id % 50 = 0),
    tr AS (SELECT doc_id, unnest(ngs) AS ng FROM g WHERE doc_id % 50 <> 0),
    h AS (SELECT doc_id, count(*) AS n_hits FROM tr JOIN e USING (ng) GROUP BY 1)
    SELECT g.doc_id,
           coalesce(CAST(len(g.ngs) AS BIGINT), 0) AS n_ngrams,
           coalesce(h.n_hits, 0) AS n_hits,
           coalesce(h.n_hits, 0) > 0 AS contaminated
    FROM g LEFT JOIN h USING (doc_id)
    WHERE g.doc_id % 50 <> 0
    """,
    tags=("llm-pipeline",),
)
def pipeline_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any 4-token
    n-gram with a held-out eval slice (doc_id % 50 == 0 stands in for
    the benchmark set) — the GPT-3/PaLM-style overlap filter a training
    pipeline runs before tokenization.

    Scale design: the eval side is small by construction (benchmarks
    are ~1e5 docs, not 100 TB), so its DISTINCT n-gram set broadcasts;
    the training side streams map-side through shingle -> explode ->
    broadcast-hash probe, and only HITS reach the per-doc count
    aggregation — the one exchange carries contaminated (doc, n-gram)
    pairs, which for a real corpus/benchmark pair is ~0.01% of rows.
    The flag join back to the corpus is another broadcast (hits are
    sparse). At 100 TB nothing shuffles the full corpus.

    N-grams are order-sensitive (4-token windows), unlike the token-SET
    signature of dedup_near: a doc quoting an eval passage verbatim is
    caught, a doc merely using the same vocabulary is not.

    The engine joins on 64-bit NUMERIC shingle hashes (one xxhash64 per
    token, pairs folded — dedup_minhash's trick: no shingle string is
    ever materialized; 13.3 -> 8.3 s at 16x docs, 1.30 -> 1.15 at
    sf0.1). The oracle works over the actual n-gram strings; results
    are identical unless two distinct n-grams collide in 64 bits
    (p ~ 2^-64 per pair; verified bit-identical at every fixture SF)."""
    from pandas_tsdb_spark.operators.llm_text import (
        _shingle_hashes_sql,
        _spread_hint,
    )

    # ONE spark.sql() call (r9-opt, catalog.Tables.sql_views): 221 ms
    # of per-call plan construction -> ~80 ms; identical expression
    # trees, asserted by oracle equality at all SFs.
    t = Tables(spark, sf_dir)
    v = t.sql_views()
    spread = _spread_hint(t.documents)
    # explode the EXPRESSION inside the Generate (never a materialized
    # array column): the InferFiltersFromGenerate trap re-evaluates the
    # whole shingle pipeline inside an inferred Filter otherwise
    # (NOTES.md, measured 65x on lang_id).
    ngs = f"array_distinct({_shingle_hashes_sql(4)})"
    # ONE pass over the training corpus: the broadcast LEFT probe tags
    # each exploded n-gram, and a single per-doc aggregation yields both
    # the distinct-n-gram count and the hit count. (A first draft ran
    # the shingle pipeline twice more — a size-only branch plus a
    # flag-join back — and measured 2x slower at sf0.1.) Every fixture
    # doc has >= 10 tokens, so no doc vanishes for lack of a 4-gram
    # (measured at all SFs; a <4-token doc would drop from the output,
    # which the oracle's full LEFT JOIN would catch as a row-count
    # mismatch).
    # LATERAL VIEW OUTER + count(ng): a null-text doc yields no n-grams
    # but must SURVIVE decontamination (trivially uncontaminated,
    # n_ngrams 0) — plain explode dropped it from the output entirely
    # (round-5 null-text sweep); count(ng) ignores the outer row.
    return spark.sql(f"""
    WITH spread AS (SELECT {spread} doc_id, text FROM {v}documents),
    e0 AS (SELECT explode({ngs}) AS ng FROM spread WHERE doc_id % 50 = 0),
    ev AS (SELECT DISTINCT ng, 1 AS hit FROM e0),
    tr AS (SELECT doc_id, ng
           FROM (SELECT doc_id, text FROM spread WHERE doc_id % 50 <> 0)
           LATERAL VIEW OUTER explode({ngs}) g AS ng)
    SELECT /*+ BROADCAST(ev) */ doc_id,
           count(ng) AS n_ngrams, count(hit) AS n_hits,
           count(hit) > 0 AS contaminated
    FROM tr LEFT JOIN ev USING (ng)
    GROUP BY doc_id
    """)


# ------------------------------------------------------- epoch upsampling

# source -> (whole epochs, extra-epoch md5 threshold). Fractional epochs
# are the standard mixture knob (e.g. "wiki 3.25 epochs, crawl 0.5"):
# every doc repeats `whole` times and the md5-selected fraction repeats
# once more. '//' sorts below '00', i.e. "never". src3 gets 0 whole
# epochs + a 0.5 fraction — the downsample case — so one operator covers
# both directions of dataset weighting.
UPSAMPLE = {
    "src0": (3, "3f"),  # 3.25 epochs
    "src1": (2, "7f"),  # 2.5
    "src2": (2, "//"),  # 2.0
    "src3": (0, "7f"),  # 0.5 (downsample)
    "src4": (1, "//"),  # 1.0 (explicit)
}
UPSAMPLE_DEFAULT = (1, "//")  # unlisted sources: exactly one epoch


@query(
    "pipeline_upsample",
    oracle=f"""
    WITH wt(source, whole, thr) AS (
      VALUES {", ".join(f"('{s}', {w}, '{t}')" for s, (w, t) in UPSAMPLE.items())}
    ),
    r AS (
      SELECT d.doc_id, d.source, d.lang,
             coalesce(wt.whole, {UPSAMPLE_DEFAULT[0]})
             + CASE WHEN substr(md5('ep:' || d.source || ':'
                                     || CAST(d.doc_id AS VARCHAR)), 1, 2)
                         <= coalesce(wt.thr, '{UPSAMPLE_DEFAULT[1]}')
                    THEN 1 ELSE 0 END AS reps
      FROM documents d LEFT JOIN wt ON d.source = wt.source
    )
    SELECT r.doc_id, r.source, r.lang, CAST(e.epoch AS INT) AS epoch
    FROM r JOIN (SELECT unnest(generate_series(0, 7)) AS epoch) e
      ON e.epoch < r.reps
    """,
    tags=("llm-pipeline",),
)
def pipeline_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-weighted epoch repetition — pipeline_mixture's other half
    (that docstring promises it): each source's docs repeat
    floor(epochs) times plus one md5-selected extra pass for the
    fractional part, emitted with an `epoch` ordinal so a downstream
    shuffle can interleave passes. The weights table broadcasts; the
    repeat is a map-side sequence-explode (rows multiply AFTER the
    scan, so a 100 TB corpus is read once, never `epochs` times), and
    nothing shuffles. Epoch choice is md5-deterministic per doc:
    reruns and backfills regenerate byte-identical output."""
    # ONE spark.sql() call (r10-opt): inline VALUES weights + BROADCAST
    # hint; same map-side sequence-explode.
    v = Tables(spark, sf_dir).sql_views()
    vals = ", ".join(
        f"('{s}', {w}, '{t}')" for s, (w, t) in UPSAMPLE.items()
    )
    return spark.sql(f"""
    WITH r AS (
      SELECT /*+ BROADCAST(wt) */ d.doc_id, d.source, d.lang,
             coalesce(wt.whole, {UPSAMPLE_DEFAULT[0]})
             + CASE WHEN substr(md5(concat('ep:', d.source, ':',
                                   CAST(d.doc_id AS STRING))), 1, 2)
                         <= coalesce(wt.thr, '{UPSAMPLE_DEFAULT[1]}')
                    THEN 1 ELSE 0 END AS reps
      FROM {v}documents d
      LEFT JOIN (VALUES {vals}) AS wt(source, whole, thr)
        ON d.source = wt.source
    )
    SELECT doc_id, source, lang,
           explode(sequence(0, reps - 1)) AS epoch
    FROM r WHERE reps > 0
    """)


_CHUNK, _STRIDE = 32, 24


@query(
    "pipeline_chunk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tokens,
             len(string_split(text, ' ')) AS n_tok
      FROM documents WHERE text IS NOT NULL
    ),
    idx AS (
      SELECT doc_id, tokens, n_tok,
             unnest(generate_series(0,
               CAST(ceil(greatest(n_tok - {_CHUNK}, 0)
                         / CAST({_STRIDE} AS DOUBLE)) AS BIGINT))) AS chunk_id
      FROM toks
    )
    SELECT doc_id, chunk_id,
           len(list_slice(tokens, chunk_id * {_STRIDE} + 1,
                          chunk_id * {_STRIDE} + {_CHUNK})) AS chunk_tokens,
           md5(array_to_string(
                 list_slice(tokens, chunk_id * {_STRIDE} + 1,
                            chunk_id * {_STRIDE} + {_CHUNK}), ' ')) AS chunk_md5
    FROM idx
    """,
    tags=("llm", "pipeline", "text"),
)
def pipeline_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking — the step that turns a corpus
    into fixed-length training sequences: 32-token chunks every
    24 tokens (8-token overlap), last partial chunk kept.

    Map-side compute: split once into a materialized token array (own
    projection — the lambda-capture trap), then ONE generator
    (posexplode of a chunk-index sequence) and per-chunk slice().
    Chunking is row-local — the only exchange is _spread's fan-out of
    an under-split single-file scan (a no-op on a real many-file
    table); output rows = ceil((n-C)/S)+1 per doc. The md5 of each chunk (not the chunk
    text) is the checked column, keeping compare payload small the
    same way a real pipeline would checksum shards. slice() is
    1-based; both engines clamp the final partial window to the array
    end (DuckDB list_slice clamps stop at len)."""
    # ONE spark.sql() call (r10-opt): same adaptive small/big split,
    # same expressions (small branch divides by 24.0D double exactly
    # as F.lit(float(_STRIDE)) did; the big branch keeps the original
    # expr text verbatim). Null text chunks to NOTHING (round-5 sweep:
    # engines' null propagation through greatest/sequence/concat_ws
    # disagrees on ghost chunks). ADAPTIVE split (round-6 big-doc
    # probe, llm_text._BIG_DOC_CHARS): docs at or under the cutoff take
    # the codegen explode+slice path; bigger docs build per-chunk
    # (size, md5) structs inside ONE transform() and posexplode the
    # small struct — linear, cannot hang on a 4 MB document.
    from pandas_tsdb_spark.operators.llm_text import (
        _BIG_DOC_CHARS,
        _spread_hint,
    )

    t = Tables(spark, sf_dir)
    v = t.sql_views()
    spread = _spread_hint(t.documents)
    sl = f"slice(tokens, cast(chunk_id * {_STRIDE} + 1 as int), {_CHUNK})"
    chunk_arr = (
        f"transform(sequence(0L, cast(ceil(greatest(n_tok - {_CHUNK}, 0)"
        f" / {_STRIDE}.0) as long)),"
        f" i -> named_struct("
        f"'chunk_tokens', size(slice(tokens, cast(i * {_STRIDE} + 1 as int),"
        f" {_CHUNK})),"
        f"'chunk_md5', md5(concat_ws(' ',"
        f" slice(tokens, cast(i * {_STRIDE} + 1 as int), {_CHUNK})))))"
    )
    return spark.sql(f"""
    WITH d AS (
      SELECT {spread} doc_id, text FROM {v}documents
      WHERE text IS NOT NULL
    ),
    small AS (
      SELECT doc_id, split(text, ' ') AS tokens,
             size(split(text, ' ')) AS n_tok
      FROM d WHERE length(text) <= {_BIG_DOC_CHARS}
    ),
    big AS (
      SELECT doc_id, split(text, ' ') AS tokens,
             size(split(text, ' ')) AS n_tok
      FROM d WHERE length(text) > {_BIG_DOC_CHARS}
    ),
    idx_small AS (
      SELECT doc_id, tokens,
             explode(sequence(CAST(0 AS BIGINT),
                 CAST(ceil(greatest(n_tok - {_CHUNK}, 0)
                           / {float(_STRIDE)}D) AS BIGINT))) AS chunk_id
      FROM small
    )
    SELECT doc_id, chunk_id,
           size({sl}) AS chunk_tokens,
           md5(concat_ws(' ', {sl})) AS chunk_md5
    FROM idx_small
    UNION ALL
    SELECT doc_id, CAST(pos AS BIGINT) AS chunk_id,
           c.chunk_tokens AS chunk_tokens, c.chunk_md5 AS chunk_md5
    FROM big
    LATERAL VIEW posexplode({chunk_arr}) pc AS pos, c
    """)


# --------------------------------------- temperature-scaled mixture weights


@query(
    "pipeline_mixture_temperature",
    oracle="""
    WITH s AS (SELECT source, count(*) AS n_docs,
                      CAST(sum(n_chars) AS BIGINT) AS n_chars
               FROM documents GROUP BY 1),
    t AS (SELECT *, CAST(n_chars AS DOUBLE) / sum(n_chars) OVER () AS raw_share
          FROM s),
    w AS (SELECT *, sqrt(raw_share) AS tw FROM t)
    SELECT source, n_docs, n_chars,
           round(raw_share, 6) AS raw_share,
           round(tw / sum(tw) OVER (), 6) AS temp_weight,
           round((tw / sum(tw) OVER ()) / raw_share, 6) AS epochs
    FROM w
    """,
    tags=("llm-pipeline",),
)
def pipeline_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source sampling weights (the T=2 'square-root
    sampling' of multilingual/multi-domain LM training — raw share^(1/T),
    renormalized): upweights small sources, damps the head, and `epochs`
    (weight/share) is the repetition factor pipeline_upsample consumes.
    Sized by CHARACTERS, not doc count — mixture design follows the
    token budget. T=2 is spelled sqrt() because IEEE sqrt is correctly
    rounded in every engine while pow(x, 0.5) need not be — the same
    cross-engine rounding trap win_ewm_time documents.

    Scale: one count+sum aggregation over the corpus (map-side combine),
    then all window math runs on the |sources|-row aggregate — a
    single-partition table at any corpus size (sources are dozens, not
    millions). Nothing about the 100 TB scan survives past the first
    aggregate."""
    # ONE spark.sql() call (r10-opt): mirrors the oracle's CTE chain.
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    WITH s AS (SELECT source, count(*) AS n_docs,
                      sum(n_chars) AS n_chars
               FROM {v}documents GROUP BY source),
    t AS (SELECT *, CAST(n_chars AS DOUBLE) / sum(n_chars) OVER ()
                      AS raw_share
          FROM s),
    w AS (SELECT *, sqrt(raw_share) AS tw FROM t)
    SELECT source, n_docs, n_chars,
           round(raw_share, 6) AS raw_share,
           round(tw / sum(tw) OVER (), 6) AS temp_weight,
           round((tw / sum(tw) OVER ()) / raw_share, 6) AS epochs
    FROM w
    """)


# ------------------------------------------------------ token budgeting

_BUDGET_TOKENS = 2_000  # per-language token budget (fixture-sized: keeps
# ~17-50% of each language at sf0.01, ~5% at sf0.1, so the cut line is
# exercised at every fixture SF; in production this is the per-language
# allocation of the training run's total token budget).

_TB_TOKS = "string_split(lower(text), ' ')"
_TB_QUALITY = f"""round(0.4 * least(len({_TB_TOKS}) / 50.0, 1.0)
               + 0.3 * (CAST(len(list_distinct({_TB_TOKS})) AS DOUBLE) / len({_TB_TOKS}))
               + 0.3 * (1.0 - CAST(len(list_filter({_TB_TOKS}, x -> x IN ('a', 'the')))
                               AS DOUBLE) / len({_TB_TOKS})), 6)"""


def _doc_token_quality_sql() -> str:
    """Spark-SQL twin of _doc_token_quality's quality Column (and of
    the _TB_QUALITY DuckDB string): same association order, D-suffixed
    double literals. Used by the monolithic-SQL form of
    pipeline_token_budget; kept beside the Column twin so they cannot
    drift apart."""
    from pandas_tsdb_spark.operators.llm_text import STOPWORDS

    stop = ", ".join(f"'{s}'" for s in STOPWORDS)
    toks = "split(lower(text), ' ')"
    return (
        f"round(0.4D * least(CAST(size({toks}) AS DOUBLE) / 50.0D, 1.0D)"
        f" + 0.3D * (CAST(size(array_distinct({toks})) AS DOUBLE)"
        f"           / CAST(size({toks}) AS DOUBLE))"
        f" + 0.3D * (1.0D - CAST(size(filter({toks}, x -> x IN ({stop})))"
        f"                       AS DOUBLE)"
        f"                  / CAST(size({toks}) AS DOUBLE)), 6)"
    )


def _doc_token_quality():
    """(toks, quality) column pair shared by the token-budget ops — the
    Spark twin of the _TB_QUALITY oracle string. Kept in one place so
    pipeline_token_budget and the end-to-end curation recipe
    (llm_vectors.pipeline_curate_semantic) cannot drift apart."""
    from pandas_tsdb_spark.operators.llm_text import STOPWORDS

    toks = F.split(F.lower(F.col("text")), " ")
    n_tok = F.size(toks).cast("double")
    n_uniq = F.size(F.array_distinct(toks)).cast("double")
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast("double")
    quality = F.round(
        0.4 * F.least(n_tok / 50.0, F.lit(1.0))
        + 0.3 * (n_uniq / n_tok)
        + 0.3 * (1.0 - n_stop / n_tok),
        6,
    )
    return toks, quality


@query(
    "pipeline_token_budget",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             CAST(len({_TB_TOKS}) AS BIGINT) AS n_tokens,
             {_TB_QUALITY} AS quality
      FROM documents
      WHERE text IS NOT NULL AND len({_TB_TOKS}) > 0
    ),
    ranked AS (
      SELECT doc_id, lang, n_tokens, quality,
             CAST(sum(n_tokens) OVER (
               PARTITION BY lang ORDER BY quality DESC, doc_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      FROM scored
    )
    SELECT doc_id, lang, n_tokens, quality, cum_tokens
    FROM ranked WHERE cum_tokens <= {_BUDGET_TOKENS}
    """,
    tags=("llm-pipeline",),
)
def pipeline_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy best-first selection under a per-language token budget —
    the step that turns "we can afford B tokens of French" into a
    concrete document set: rank by quality (text_quality's exact
    formula) descending, admit documents while the running token count
    stays within budget.

    Exactness: quality is rounded to 6dp BEFORE ordering on both sides
    and ties break on doc_id, so the admission order is a pure function
    of the data; the running sum is a BIGINT cumsum over that order —
    no float accumulation anywhere near the cut line.

    Scale: one shuffle — the per-language ordered window. A language is
    a coarse partition (the win_cumsum caveat: per-key sequential
    prefix), which is inherent to the greedy-ordered SEMANTICS; the
    production layout shards the budget per (lang, shard) with B/shards
    each — identical code over a finer key — or two-phases it
    (range-partition by (quality desc, doc_id), per-partition token
    sums, driver-side offsets: the classic distributed prefix sum).
    Quality scoring itself is map-side, evaluated during the scan."""
    # ONE spark.sql() call (r10-opt): same spread + one-window plan;
    # quality expr shared via _doc_token_quality_sql.
    from pandas_tsdb_spark.operators.llm_text import _spread_hint

    t = Tables(spark, sf_dir)
    v = t.sql_views()
    spread = _spread_hint(t.documents)
    return spark.sql(f"""
    WITH spread AS (
      SELECT {spread} doc_id, lang, text FROM {v}documents
    ),
    scored AS (
      SELECT doc_id, lang,
             CAST(size(split(lower(text), ' ')) AS BIGINT) AS n_tokens,
             {_doc_token_quality_sql()} AS quality
      FROM spread
      WHERE text IS NOT NULL AND size(split(lower(text), ' ')) > 0
    )
    SELECT doc_id, lang, n_tokens, quality,
           cum_tokens
    FROM (
      SELECT *, sum(n_tokens) OVER (
               PARTITION BY lang ORDER BY quality DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS cum_tokens
      FROM scored
    )
    WHERE cum_tokens <= {_BUDGET_TOKENS}
    """)
