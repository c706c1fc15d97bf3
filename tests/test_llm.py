"""Internal differentials for the engine-internal (non-oracled) LLM ops:
each approximate path is checked against its exact counterpart.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pandas_tsdb_spark.registry import load_all

SPECS = load_all()


def test_minhash_recall_on_true_duplicates(spark):
    """Identical texts have identical shingle sets, which collide in
    every LSH band -> the MinHash path must find 100% of exact-text
    duplicate pairs, each with shingle-jaccard 1.0. sf0.1 is the only
    fixture scale containing exact-text duplicates (8 pairs)."""
    from pandas_tsdb_spark.catalog import Tables

    sf_dir = "/root/testdata/sf0.1"
    d = Tables(spark, sf_dir).documents.select("doc_id", "text")
    exact = {
        (r.doc_a, r.doc_b)
        for r in d.alias("a")
        .join(
            d.alias("b"),
            (F.col("a.text") == F.col("b.text"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .collect()
    }
    assert exact, "fixture should contain exact-duplicate texts"
    mh = SPECS["dedup_minhash"].builder(spark, sf_dir)
    found = {(r.doc_a, r.doc_b) for r in mh.filter(F.col("jaccard") >= 0.999).collect()}
    assert exact <= found


def test_simhash_identical_token_sets_share_fingerprint(spark, sf_dir):
    sh = SPECS["dedup_simhash"].builder(spark, sf_dir).collect()
    fp = {r.doc_id: r.simhash for r in sh}
    pairs = SPECS["dedup_near_pairs"].builder(spark, sf_dir).collect()
    for r in pairs:
        assert fp[r.doc_a] == fp[r.doc_b]


def test_dedup_exact_idempotent(spark, sf_dir):
    out = SPECS["dedup_exact"].builder(spark, sf_dir)
    n1 = out.count()
    # running dedup on an already-deduped id set changes nothing
    assert out.select("doc_id").distinct().count() == n1


def test_ann_lsh_recall_vs_bruteforce(spark):
    """Bucketed ANN top-1 must agree with brute-force top-1 for a decent
    fraction of vectors (8 hyperplanes, unnormalized synthetic data)."""
    small = "/root/testdata/sf0.001"
    brute = SPECS["sim_topk"].builder(spark, small).filter(F.col("rk") == 1)
    truth = {r.query_id: r.neighbor_id for r in brute.collect()}
    ann = SPECS["ann_lsh"].builder(spark, small)
    got = {
        r.vec_id: r.nn_id for r in ann.filter(F.col("vec_id") < 20).collect()
    }
    hits = sum(1 for k, v in truth.items() if got.get(k) == v)
    assert hits / len(truth) >= 0.65, f"ANN recall {hits}/{len(truth)}"


def test_sim_topk_blas_matches_expression_path(spark, sf_dir):
    """The BLAS two-phase top-k must produce the same neighbors as the
    expression-tree sim_topk (cosines may differ in the last ulps, so
    compare rank sets, tolerating swaps between near-tied cosines)."""
    a = SPECS["sim_topk"].builder(spark, sf_dir).collect()
    b = SPECS["sim_topk_blas"].builder(spark, sf_dir).collect()
    ra = {(r.query_id, r.neighbor_id): r.cos for r in a}
    rb = {(r.query_id, r.neighbor_id): r.cos for r in b}
    assert len(ra) == len(rb)
    for key, cos in ra.items():
        if key in rb:
            assert abs(rb[key] - cos) <= 2e-6
        else:
            # swapped at a tie boundary: the replacement neighbor must
            # have an equal-within-rounding cosine for the same query
            q = key[0]
            repl = [c for (q2, n), c in rb.items() if q2 == q and (q2, n) not in ra]
            assert repl and any(abs(c - cos) <= 2e-6 for c in repl), (key, cos)


def test_ann_ivf_recall_vs_bruteforce(spark):
    """IVF with a TRAINED codebook (nprobe=8 of 32 cells) must recover
    a reasonable share of true top-1 neighbors. Floor 0.5 with margin
    (measured 0.7 at sf0.001, 0.6 at sf0.01 — honest numbers on
    near-random synthetic vectors). NOTE the earlier stand-in codebook
    (first 32 vectors = the query set itself) scored a RIGGED 20/20:
    when queries are centroids, each query probes its own cell first
    and its neighbors assign there — recall by construction, not by
    index quality. Never seed IVF centroids from the query set."""
    small = "/root/testdata/sf0.001"
    brute = SPECS["sim_topk"].builder(spark, small).filter(F.col("rk") == 1)
    truth = {r.query_id: r.neighbor_id for r in brute.collect()}
    ivf = SPECS["ann_ivf"].builder(spark, small).filter(F.col("rk") == 1)
    got = {r.query_id: r.neighbor_id for r in ivf.collect()}
    hits = sum(1 for k, v in truth.items() if got.get(k) == v)
    assert hits / len(truth) >= 0.5, f"IVF recall {hits}/{len(truth)}"


def test_knn_majority_is_from_topk(spark, sf_dir):
    out = SPECS["knn_label"].builder(spark, sf_dir)
    pdf = out.toPandas()
    assert (pdf["n_votes"] >= 1).all() and (pdf["n_votes"] <= 5).all()
    assert len(pdf) == 20


def test_dedup_embedding_blas_matches_sql_twin(spark, sf_dir):
    """dedup_embedding_blas (per-bucket matmul kernel) must keep exactly
    the survivor set of the oracled SQL formulation — same bucketing,
    same greedy keep-lowest-id at the same τ; float64 matmul vs
    sequential fold cannot flip a comparison at τ=0.98 on this data."""
    sql_ids = {
        r.vec_id for r in SPECS["dedup_embedding"].builder(spark, sf_dir).collect()
    }
    blas_ids = {
        r.vec_id
        for r in SPECS["dedup_embedding_blas"].builder(spark, sf_dir).collect()
    }
    assert sql_ids == blas_ids
    assert len(sql_ids) > 0


def test_knn_label_blas_matches_expression_path(spark, sf_dir):
    """knn_label_blas predictions must equal the oracled knn_label's —
    cos rounds at 6 on both paths and vec_id/label tie-breaks are
    total, so the two-phase matmul cannot change a vote."""
    sql = {
        (r.query_id, r.true_label, r.pred_label, r.n_votes)
        for r in SPECS["knn_label"].builder(spark, sf_dir).collect()
    }
    blas = {
        (r.query_id, r.true_label, r.pred_label, r.n_votes)
        for r in SPECS["knn_label_blas"].builder(spark, sf_dir).collect()
    }
    assert sql == blas
    assert len(sql) > 0


def test_decontaminate_invariants(spark, sf_dir):
    out = SPECS["pipeline_decontaminate"].builder(spark, sf_dir).toPandas()
    # eval slice excluded; hits bounded by the doc's own distinct n-grams;
    # flag is exactly n_hits > 0
    assert (out.doc_id % 50 != 0).all()
    assert (out.n_hits <= out.n_ngrams).all()
    assert ((out.n_hits > 0) == out.contaminated).all()


def test_lm_score_matches_pandas_model(spark, sf_dir):
    """Independent reimplementation: unigram NLL computed in plain
    pandas/numpy must match the Spark plan to float tolerance."""
    import numpy as np
    import pandas as pd
    from collections import Counter

    out = (
        SPECS["text_lm_score"]
        .builder(spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    toks = docs.text.str.lower().str.split(" ")
    cnt = Counter(t for ts in toks for t in ts)
    total = sum(cnt.values())
    exp_nll = toks.map(
        lambda ts: -round(sum(np.log(cnt[t] / total) for t in ts), 6) / len(ts)
    )
    exp = pd.DataFrame({"doc_id": docs.doc_id, "nll": exp_nll}).set_index(
        "doc_id"
    ).sort_index()
    assert len(out) == len(exp)
    assert np.allclose(out.nll, exp.nll, atol=1e-9)
    assert (out.ppl >= 1).all()
    assert np.allclose(out.ppl, np.round(np.exp(out.nll), 6), atol=1e-6)


def test_quantize_kernel_identical_to_hof_spec(spark, sf_dir):
    """The primary numpy-kernel builder must be BIT-identical to the
    unregistered JVM-HOF spec formulation — same casts, same
    evaluation order, shared oracle (round 2 swapped which one is
    registered; the differential direction is unchanged)."""
    from pandas_tsdb_spark.operators.llm_vectors import vec_quantize_hof
    from pandas_tsdb_spark.registry import load_all

    S = load_all()
    a = (
        S["vec_quantize_int8"].builder(spark, sf_dir).toPandas()
        .sort_values("vec_id").reset_index(drop=True)
    )
    b = (
        vec_quantize_hof(spark, sf_dir).toPandas()
        .sort_values("vec_id").reset_index(drop=True)
    )
    assert a.astype(str).equals(b[a.columns].astype(str))


def test_ann_pq_recall_vs_bruteforce(spark):
    """PQ (8 sub-codes, ADC candidate scan, exact re-rank) must recover
    at least half of the true nearest neighbors at rank 1 — same gate
    as the LSH and IVF families."""
    small = "/root/testdata/sf0.001"
    from pandas_tsdb_spark.registry import load_all

    S = load_all()
    truth = {
        (r.query_id, r.neighbor_id)
        for r in S["sim_topk"].builder(spark, small).filter(F.col("rk") == 1).collect()
    }
    pq = S["ann_pq"].builder(spark, small).filter(F.col("rk") == 1)
    got = {(r.query_id, r.neighbor_id) for r in pq.collect()}
    hits = len(truth & got)
    assert hits / len(truth) >= 0.5, f"PQ recall {hits}/{len(truth)}"


def test_vec_pca_matches_numpy_exact_pca(spark, sf_dir):
    """vec_pca's two-phase distributed moments must reproduce an exact
    single-node numpy PCA: same projections (to rounding), variance
    ordering pc1 > pc2, and near-zero cross-component correlation."""
    import numpy as np

    got = (
        SPECS["vec_pca"].builder(spark, sf_dir)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    ref = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    X = np.stack(ref["embedding"].to_numpy()).astype(np.float64)
    Xc = X - X.mean(axis=0)
    cov = Xc.T @ Xc / (len(X) - 1)
    _, evec = np.linalg.eigh(cov)
    comps = evec[:, ::-1][:, :2].T.copy()
    for i in range(2):
        j = int(np.abs(comps[i]).argmax())
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    P = Xc @ comps.T
    assert np.allclose(got["pc1"].to_numpy(), P[:, 0], atol=1e-4)
    assert np.allclose(got["pc2"].to_numpy(), P[:, 1], atol=1e-4)
    assert got["pc1"].var() > got["pc2"].var()
    assert abs(np.corrcoef(got["pc1"], got["pc2"])[0, 1]) < 1e-3


def test_ann_ivf_pq_recall_vs_bruteforce(spark):
    """IVF-PQ (coarse cells + residual product quantization, the
    composite FAISS-IVFADC shape) must recover at least as much top-1
    recall as the 0.5 floor shared by the other ANN families —
    residual PQ should quantize FINER than raw-vector PQ at the same
    codebook budget, since per-cell residuals are smaller and
    centered."""
    small = "/root/testdata/sf0.001"
    brute = SPECS["sim_topk"].builder(spark, small).filter(F.col("rk") == 1)
    truth = {r.query_id: r.neighbor_id for r in brute.collect()}
    got_df = SPECS["ann_ivf_pq"].builder(spark, small).filter(F.col("rk") == 1)
    got = {r.query_id: r.neighbor_id for r in got_df.collect()}
    hits = sum(1 for k, v in truth.items() if got.get(k) == v)
    assert hits / len(truth) >= 0.5, f"IVF-PQ recall {hits}/{len(truth)}"


def test_ann_recall_in_band(spark):
    """Round-5 verdict item: recall@k is surfaced as a registry query
    (one row per ANN family) with the documented floor asserted INSIDE
    the query via raise_error — a user tuning nprobe/bands reads it
    in-band instead of digging through test assertions."""
    from pandas_tsdb_spark.registry import load_all

    rows = load_all()["ann_recall"].builder(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert {r.index_kind for r in rows} == {"lsh", "ivf", "pq", "ivf_pq"}
    for r in rows:
        assert r.recall >= r.recall_floor
        assert r.hits <= r.truth
        assert r.k == (1 if r.index_kind == "lsh" else 5)


def test_dedup_recall_in_band(spark, sf_dir):
    """Round-5: the ann_recall pattern applied to text dedup — recall of
    minhash (vs bounded brute-force shingle-Jaccard truth) and simhash
    (vs token-set-equality truth) surfaced as a registry query with the
    floor asserted inside the plan."""
    rows = SPECS["dedup_recall"].builder(spark, sf_dir).collect()
    methods = {r.method: r for r in rows}
    assert set(methods) == {
        "minhash_j0.5", "simhash_tokenset", "minhash_exactdup"
    }
    for r in rows:
        assert r.recall >= r.recall_floor
        assert r.found_pairs <= r.truth_pairs
    # simhash's fingerprint is a FUNCTION of the token set: recall is
    # exactly 1.0, not approximately
    assert methods["simhash_tokenset"].recall == 1.0


_NULL_TEXT_OPS = [
    # every documents-only-oracle op, builder-vs-oracle on a null-TEXT
    # injected corpus (round-5 sweep #3). The nine that diverged or
    # CRASHED, now fixed: text_repetition garbage rows, five Python
    # kernels dying on None blobs/text (multimodal_* and the
    # udf_scalar/udtf_python int64 casts), decontaminate dropping
    # null docs that must survive, chunk's ghost chunk.
    "text_repetition", "multimodal_frames", "multimodal_binary",
    "multimodal_resize", "multimodal_phash_dedup",
    "pipeline_decontaminate", "pipeline_chunk", "udf_scalar",
    "udtf_python", "dedup_exact", "dedup_near", "text_tokenize",
    "text_tfidf", "text_stats", "text_quality", "text_fingerprint",
    "text_normalize", "lang_id", "pipeline_curate", "pipeline_split",
    "pipeline_pack", "text_lm_score", "text_lm_bigram",
    # round-9 additions: the budget selector must skip null-text docs
    # on BOTH sides (they carry no tokens and no quality rank); the
    # dup-ngram signal must not let NULL texts form a fake shared
    # shingle group.
    "pipeline_token_budget", "text_dup_ngrams",
]


@pytest.fixture(scope="module")
def holey_docs_stage(spark, tmp_path_factory):
    import glob
    import shutil

    tmp = tmp_path_factory.mktemp("holey_docs")
    d0 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    holey = d0.withColumn(
        "text", F.when(F.col("doc_id") % 11 != 0, F.col("text"))
    )
    d = str(tmp / "h")
    holey.coalesce(1).write.parquet(d)
    stage = tmp / "sf"
    stage.mkdir()
    shutil.copy(glob.glob(f"{d}/part-*.parquet")[0], f"{stage}/documents.parquet")
    # some builders read companion tables (pipeline_curate joins
    # embeddings) even when their oracle is documents-only
    import os

    for t in ("region nation customer supplier part orders lineitem "
              "events embeddings").split():
        os.symlink(
            f"/root/testdata/sf0.001/{t}.parquet", f"{stage}/{t}.parquet"
        )
    return str(stage)


@pytest.mark.parametrize("name", _NULL_TEXT_OPS)
def test_null_text_differential(spark, holey_docs_stage, name):
    """Builder vs DuckDB oracle on a corpus where every 11th document's
    text is NULL — the missing-document case every real scraped corpus
    contains. Catches both wrong answers AND Python-kernel crashes."""
    from tests.harness import compare, duck_connect

    spec = SPECS[name]
    con = duck_connect(holey_docs_stage)
    sp = spec.builder(spark, holey_docs_stage).toPandas()
    du = con.execute(spec.oracle).fetchdf()
    errs = compare(sp, du, name)
    assert not errs, errs[:5]


def test_dedup_recall_tolerates_null_text(spark, holey_docs_stage):
    """Round-6 ADVICE fix: null-text docs all share the NULL md5 key, so
    without the IS NOT NULL filter the exact-dup truth contains one fake
    'duplicate group' of all null docs — pairs minhash (no shingles for
    null text) can never find, spuriously tripping the in-band floor on
    any corpus with >=2 null docs."""
    rows = SPECS["dedup_recall"].builder(spark, holey_docs_stage).collect()
    methods = {r.method for r in rows}
    assert methods == {"minhash_j0.5", "simhash_tokenset", "minhash_exactdup"}
    for r in rows:
        assert r.recall >= r.recall_floor


def test_ann_lsh_kernel_matches_lab_replica(spark):
    """The 512k recall evidence lives in tools/lsh_probe_lab.py's numpy
    replica; this pins the ENGINE kernel to it bit-for-bit at sf0.1
    (2000 vectors): the stored membership set and the 8-mask probe
    membership set produced by ann_lsh's mapInPandas kernels equal a
    local numpy computation with the same seed/geometry — so a lab
    measurement IS an engine measurement."""
    import numpy as np

    from pandas_tsdb_spark.operators import llm_vectors as LV

    sf = "/root/testdata/sf0.1"
    e = LV._clean_embeddings(LV.Tables(spark, sf).embeddings)
    n = e.count()
    P = LV._lsh_geometry(n)
    L = LV._N_TABLES

    pdf = e.select("vec_id", "embedding").toPandas().sort_values("vec_id")
    E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    rng = np.random.RandomState(LV._LSH_SEED)
    planes = rng.standard_normal((L, P, 64))
    weights = (1 << np.arange(P)).astype(np.int64)
    toffs = np.arange(L, dtype=np.int64) << 32
    proj = np.einsum("nd,tpd->ntp", E, planes)
    codes = (proj > 0).astype(np.int64) @ weights
    want_stored = {
        (int(ids[i]), int(codes[i, t] + toffs[t]))
        for i in range(len(ids))
        for t in range(L)
    }
    o = np.argsort(np.abs(proj), axis=2, kind="stable")[:, :, :3]
    m = np.take(weights, o)
    m1, m2, m3 = m[:, :, 0], m[:, :, 1], m[:, :, 2]
    masks = np.stack(
        [np.zeros_like(m1), m1, m2, m1 ^ m2, m3, m1 ^ m3, m2 ^ m3,
         m1 ^ m2 ^ m3],
        axis=2,
    )
    want_probe = {
        (int(ids[i]), int((codes[i, t] ^ masks[i, t, s]) + toffs[t]))
        for i in range(len(ids))
        for t in range(L)
        for s in range(8)
    }

    # the engine's membership streams, rebuilt from the same pieces the
    # op's closure uses (running the full op would re-score top-1; the
    # BUCKETING kernels are what this pins)
    import pandas as pd

    def bucketize(probe):
        def gen(batches):
            rng = np.random.RandomState(LV._LSH_SEED)
            planes = rng.standard_normal((LV._N_TABLES, P, 64))
            w = (1 << np.arange(P)).astype(np.int64)
            tof = np.arange(LV._N_TABLES, dtype=np.int64) << 32
            for b in batches:
                if not len(b):
                    continue
                emb = np.stack(b["embedding"].to_numpy()).astype(np.float64)
                pr = np.einsum("nd,tpd->ntp", emb, planes)
                cd = (pr > 0).astype(np.int64) @ w
                if not probe:
                    yield pd.DataFrame(
                        {"vec_id": b["vec_id"].to_numpy().repeat(LV._N_TABLES),
                         "bucket": (cd + tof[None, :]).ravel()}
                    )
                    continue
                oo = np.argsort(np.abs(pr), axis=2, kind="stable")[:, :, :3]
                mm = np.take(w, oo)
                a1, a2, a3 = mm[:, :, 0], mm[:, :, 1], mm[:, :, 2]
                mk = np.stack(
                    [np.zeros_like(a1), a1, a2, a1 ^ a2, a3, a1 ^ a3,
                     a2 ^ a3, a1 ^ a2 ^ a3], axis=2)
                yield pd.DataFrame(
                    {"vec_id": b["vec_id"].to_numpy().repeat(LV._N_TABLES * 8),
                     "bucket": ((cd[:, :, None] ^ mk) + tof[None, :, None]).ravel()}
                )
        return gen

    import pandas as pd

    got_stored = {
        (r.vec_id, r.bucket)
        for r in e.mapInPandas(bucketize(False), "vec_id long, bucket long").collect()
    }
    got_probe = {
        (r.vec_id, r.bucket)
        for r in e.mapInPandas(bucketize(True), "vec_id long, bucket long").collect()
    }
    assert got_stored == want_stored
    assert got_probe == want_probe
    # probe fan-out law: 8 probe rows per stored row, probe superset
    assert want_stored <= want_probe


@pytest.mark.sweep
def test_ann_lsh_engine_recall_at_adaptive_regime(spark):
    """Engine-side recall in the ADAPTIVE bucket regime (P>4): a 16x
    key-shifted union of sf0.1 embeddings (32k vectors -> P=8) driven
    through the real ann_lsh plan end-to-end — bucketing kernels, the
    probe-x-stored join, cosine re-scoring, top-1 window. Complements
    the 512k numpy-lab measurement (recall 0.85 @4.35% candidates)
    with the Spark path itself; measured 20/20 on the query block in
    ~9 s."""
    import os

    from pyspark.sql import functions as F

    out = "/tmp/pandas_tsdb_spark_emb16x"
    if not os.path.isdir(f"{out}/embeddings.parquet"):
        os.makedirs(out, exist_ok=True)
        e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
        parts = [e] + [
            e.withColumn("vec_id", F.col("vec_id") + F.lit(i * 1_000_000))
            for i in range(1, 16)
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        tmp = f"{out}/embeddings.parquet.stage-{os.getpid()}"
        u.repartition(8).write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, f"{out}/embeddings.parquet")
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)

    from pandas_tsdb_spark.operators.llm_vectors import _lsh_geometry

    assert _lsh_geometry(32000) == 8  # the regime this test exists for

    ann = SPECS["ann_lsh"].builder(spark, out)
    got = {
        r.vec_id: r.nn_id for r in ann.filter(F.col("vec_id") < 20).collect()
    }
    brute = SPECS["sim_topk"].builder(spark, out).filter(F.col("rk") == 1)
    truth = {r.query_id: r.neighbor_id for r in brute.collect()}
    hits = sum(1 for k, v in truth.items() if got.get(k) == v)
    # lab floor is 0.65; engine measured 20/20 here — assert the floor
    # with margin so ambient never flakes a true regression signal
    assert hits / len(truth) >= 0.65, f"recall {hits}/{len(truth)}"


def test_kmeans_partitions_corpus_and_iterations_improve(spark, sf_dir):
    """Lloyd's laws the hash gate can't see: (a) the clusters partition
    the valid corpus exactly, (b) the trained centroids achieve lower
    total inertia than the raw seeds (each Lloyd step is non-increasing
    in exact arithmetic; on this fixture the drop is strict), (c) the
    memoized training is deterministic across calls."""
    from pandas_tsdb_spark.operators.llm_vectors import (
        _clean_embeddings,
        _km_assign,
        _km_centroids,
        _KM_K,
        _KM_Q,
    )
    from pandas_tsdb_spark.catalog import Tables

    e = _clean_embeddings(Tables(spark, sf_dir).embeddings).select(
        "vec_id", "embedding"
    )
    out = SPECS["vec_kmeans"].builder(spark, sf_dir).toPandas()
    assert out.n.sum() == e.count()
    assert set(out.cluster) <= set(range(_KM_K))

    seeds = sorted(
        (int(r.vec_id), [float(v) for v in r.embedding])
        for r in e.filter(F.col("vec_id") < _KM_K).collect()
    )
    seed_inertia = (
        _km_assign(e, seeds)
        .agg(F.sum(F.round(F.col("d2") * _KM_Q).cast("long")).alias("i"))
        .collect()[0]["i"]
    )
    assert out.inertia_u.sum() < seed_inertia

    c1 = _km_centroids(spark, sf_dir, e)
    c2 = _km_centroids(spark, sf_dir, e)
    assert c1 == c2  # memoized AND bit-deterministic


def test_semdedup_drop_set_is_exactly_the_lower_id_rule(spark, sf_dir):
    """Survivor-set law: a vector is dropped iff some LOWER-vec_id
    member of ITS cluster is tau-similar. Recomputed from the exact
    cosine pairs (numpy, rounded 6dp like both engines) and compared
    set-for-set against the op's output."""
    import numpy as np

    from pandas_tsdb_spark.operators.llm_vectors import (
        _clean_embeddings,
        _km_assign,
        _SEMDEDUP_TAU,
        _KM_K,
    )
    from pandas_tsdb_spark.catalog import Tables

    e = _clean_embeddings(Tables(spark, sf_dir).embeddings).select(
        "vec_id", "embedding"
    )
    seeds = sorted(
        (int(r.vec_id), [float(v) for v in r.embedding])
        for r in e.filter(F.col("vec_id") < _KM_K).collect()
    )
    rows = _km_assign(e, seeds).select("vec_id", "cid", "embedding").collect()
    kept_expected = set()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(int(r.cid), []).append(
            (int(r.vec_id), np.asarray(r.embedding, dtype=np.float64))
        )
    for members in by_cluster.values():
        members.sort()
        for i, (vid, v) in enumerate(members):
            dup = False
            for uid, u in members[:i]:
                cos = round(
                    float(u @ v) / (np.linalg.norm(u) * np.linalg.norm(v)), 6
                )
                if cos >= _SEMDEDUP_TAU:
                    dup = True
                    break
            if not dup:
                kept_expected.add(vid)
    out = SPECS["vec_semdedup"].builder(spark, sf_dir).toPandas()
    assert set(out.vec_id) == kept_expected
    assert len(out) < len(rows)  # the drop path is exercised


def test_dup_ngrams_exact_duplicates_score_one(spark):
    """A document whose full text also exists under another doc_id
    shares EVERY shingle -> dup_frac must be exactly 1.0. sf0.1 is the
    fixture scale with exact-text duplicates (8 pairs)."""
    from pandas_tsdb_spark.catalog import Tables

    sf_dir = "/root/testdata/sf0.1"
    d = Tables(spark, sf_dir).documents.select("doc_id", "text")
    dup_ids = {
        r.doc_id
        for r in d.alias("a")
        .join(d.alias("b"), (F.col("a.text") == F.col("b.text"))
              & (F.col("a.doc_id") != F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_id"))
        .collect()
    }
    assert dup_ids, "fixture should contain exact-duplicate texts"
    out = SPECS["text_dup_ngrams"].builder(spark, sf_dir).toPandas()
    scored = out[out.doc_id.isin(dup_ids)]
    assert len(scored) == len(dup_ids)
    assert (scored.dup_frac == 1.0).all()
    assert (scored.n_dup == scored.n_shingles).all()


def test_cluster_balance_caps_every_cluster(spark, sf_dir):
    """Sampling laws: at most m rows per cluster, exactly min(m, size)
    where size is the true cluster population, ranks are a 1..n prefix,
    and the draw is deterministic across reruns."""
    from pandas_tsdb_spark.operators.llm_vectors import _CB_M

    out = SPECS["pipeline_cluster_balance"].builder(spark, sf_dir).toPandas()
    sizes = (
        SPECS["vec_kmeans"].builder(spark, sf_dir).toPandas()
        .set_index("cluster")["n"]
    )
    # vec_kmeans sizes are AFTER 2 Lloyd iterations; cluster_balance
    # uses the seed assignment — recompute seed-assignment sizes.
    from pandas_tsdb_spark.catalog import Tables
    from pandas_tsdb_spark.operators.llm_vectors import (
        _clean_embeddings, _km_assign, _KM_K,
    )

    e = _clean_embeddings(Tables(spark, sf_dir).embeddings).select(
        "vec_id", "embedding"
    )
    seeds = sorted(
        (int(r.vec_id), [float(v) for v in r.embedding])
        for r in e.filter(F.col("vec_id") < _KM_K).collect()
    )
    seed_sizes = (
        _km_assign(e, seeds).groupBy("cid").count().toPandas()
        .set_index("cid")["count"]
    )
    got = out.groupby("cluster").size()
    for cid, size in seed_sizes.items():
        assert got.get(cid, 0) == min(_CB_M, size)
        ranks = sorted(out[out.cluster == cid].rk)
        assert ranks == list(range(1, min(_CB_M, size) + 1))
    again = SPECS["pipeline_cluster_balance"].builder(spark, sf_dir).toPandas()
    assert sorted(again.vec_id) == sorted(out.vec_id)


def test_curate_semantic_composes_its_stages(spark, sf_dir):
    """The end-to-end recipe must equal its stage composition exactly:
    selection = md5-rank <= m over vec_semdedup's survivors, budget =
    greedy per-lang prefix over that selection — and each stage must
    BITE (survivors < corpus, cap binds, budget cuts, and the curated
    budget picks a different doc set than budgeting the raw corpus)."""
    from pandas_tsdb_spark.operators.llm_vectors import _CB_M
    from pandas_tsdb_spark.operators.pipeline import _BUDGET_TOKENS

    out = SPECS["pipeline_curate_semantic"].builder(spark, sf_dir).toPandas()
    keep = SPECS["vec_semdedup"].builder(spark, sf_dir).toPandas()
    assert set(out.doc_id) <= set(keep.vec_id)
    # the balance cap binds and is never exceeded
    per_cluster = out.groupby("cluster").size()
    assert (per_cluster <= _CB_M).all()
    # per-lang budget law: every admitted prefix fits, and the FIRST
    # excluded candidate (by the same quality-desc, doc_id order) would
    # overflow — greedy maximality, not just feasibility
    import hashlib

    sel = keep.copy()
    sel["rk"] = (
        sel.assign(
            h=sel.vec_id.map(
                lambda v: hashlib.md5(str(v).encode()).hexdigest()
            )
        )
        .sort_values(["h", "vec_id"])
        .groupby("cluster")
        .cumcount()
        + 1
    )
    chosen = set(sel[sel.rk <= _CB_M].vec_id)
    assert set(out.doc_id) <= chosen
    for lang, grp in out.groupby("lang"):
        assert grp.cum_tokens.max() <= _BUDGET_TOKENS
    # non-vacuous vs budgeting the raw corpus
    raw = SPECS["pipeline_token_budget"].builder(spark, sf_dir).toPandas()
    assert set(out.doc_id) != set(raw.doc_id)


def test_curate_embedding_composes_its_stages(spark, sf_dir):
    """The linear recipe equals its stage composition: selection = one
    md5-order representative per (label, sign-bucket) among
    dedup_embedding's survivors; per-lang budget law holds; and the
    bucket-space bound (selection <= 640*m) is structural."""
    import hashlib

    from pandas_tsdb_spark.operators.llm_vectors import (
        _CEB_M, _embedding_survivors,
    )
    from pandas_tsdb_spark.operators.pipeline import _BUDGET_TOKENS

    out = SPECS["pipeline_curate_embedding"].builder(spark, sf_dir).toPandas()
    keep = _embedding_survivors(spark, sf_dir).toPandas()
    assert set(out.doc_id) <= set(keep.vec_id)
    per_bucket = out.groupby(["label", "sbucket"]).size()
    assert (per_bucket <= _CEB_M).all()
    assert len(out) <= 640 * _CEB_M
    sel = keep.copy()
    sel["rk"] = (
        sel.assign(
            h=sel.vec_id.map(
                lambda v: hashlib.md5(str(v).encode()).hexdigest()
            )
        )
        .sort_values(["h", "vec_id"])
        .groupby(["label", "sbucket"])
        .cumcount()
        + 1
    )
    chosen = set(sel[sel.rk <= _CEB_M].vec_id)
    assert set(out.doc_id) <= chosen
    for lang, grp in out.groupby("lang"):
        assert grp.cum_tokens.max() <= _BUDGET_TOKENS
