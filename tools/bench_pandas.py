"""Reference-model baseline: the headline queries implemented in
idiomatic single-node eager pandas — the execution model of the
reference library (a pandas extension, SURVEY.md §1.1). bench.py
--pandas times these on the same parquet inputs; parquet read is inside
each timed function (all three engines pay the scan per run).

Each function mirrors the semantics of the same-named registry op (not
bit-exactness — BASELINE timing only; bit-exactness is the DuckDB
oracle's job).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

ALPHA = 0.3  # win_ewm


def _read(sf_dir: str, table: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def q1_lineitem_agg(sf_dir):
    li = _read(sf_dir, "lineitem")
    li = li[li.l_shipdate <= pd.Timestamp("1998-09-02")]
    g = li.assign(
        disc_price=li.l_extendedprice * (1 - li.l_discount),
        charge=li.l_extendedprice * (1 - li.l_discount) * (1 + li.l_tax),
    ).groupby(["l_returnflag", "l_linestatus"])
    return g.agg(
        sum_qty=("l_quantity", "sum"),
        sum_base_price=("l_extendedprice", "sum"),
        sum_disc_price=("disc_price", "sum"),
        sum_charge=("charge", "sum"),
        avg_qty=("l_quantity", "mean"),
        avg_price=("l_extendedprice", "mean"),
        avg_disc=("l_discount", "mean"),
        count_order=("l_quantity", "size"),
    ).reset_index()


def q2_join_inner(sf_dir):
    o, c = _read(sf_dir, "orders"), _read(sf_dir, "customer")
    return o.merge(c, left_on="o_custkey", right_on="c_custkey")[
        ["o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment"]
    ]


def q3_join_broadcast(sf_dir):
    li = _read(sf_dir, "lineitem")
    s, n, r = (_read(sf_dir, t) for t in ("supplier", "nation", "region"))
    j = (
        li.merge(s, left_on="l_suppkey", right_on="s_suppkey")
        .merge(n, left_on="s_nationkey", right_on="n_nationkey")
        .merge(r, left_on="n_regionkey", right_on="r_regionkey")
    )
    j["revenue"] = j.l_extendedprice * (1 - j.l_discount)
    return (
        j.groupby(["n_name", "r_name"])
        .agg(revenue=("revenue", "sum"), n_items=("revenue", "size"))
        .reset_index()
    )


def q4_join_asof(sf_dir):
    ev = _read(sf_dir, "events").sort_values("ts")
    p = ev[ev.event_type == "purchase"][["user_id", "ts", "value", "event_id"]]
    p = p.rename(
        columns={"value": "last_purchase_value", "event_id": "last_purchase_id"}
    )
    out = pd.merge_asof(ev, p, on="ts", by="user_id")
    tol = pd.merge_asof(
        ev,
        p.rename(columns={"last_purchase_value": "last_purchase_value_3d"})[
            ["user_id", "ts", "last_purchase_value_3d"]
        ],
        on="ts",
        by="user_id",
        tolerance=pd.Timedelta("3D"),
    )
    out["last_purchase_value_3d"] = tol["last_purchase_value_3d"].to_numpy()
    return out[
        ["event_id", "user_id", "value", "last_purchase_value",
         "last_purchase_id", "last_purchase_value_3d"]
    ]


def q5_rolling_time(sf_dir):
    ev = _read(sf_dir, "events").sort_values(["user_id", "ts"])
    g = ev.set_index("ts").groupby("user_id")["value"].rolling("7D")
    out = ev[["user_id", "event_id"]].copy()
    out["sum_7d"] = g.sum().to_numpy().round(4)
    out["n_7d"] = g.count().to_numpy()
    return out


def q6_resample(sf_dir):
    ev = _read(sf_dir, "events")
    ev["day"] = ev.ts.dt.floor("D")
    return (
        ev.groupby(["day", "event_type"])
        .agg(n=("value", "size"), total=("value", "sum"), mean_v=("value", "mean"))
        .reset_index()
    )


def q7_ewm(sf_dir):
    ev = _read(sf_dir, "events").sort_values(["user_id", "event_id"])
    ev["ewm"] = (
        ev.groupby("user_id", sort=False)["value"]
        .transform(lambda s: s.ewm(alpha=ALPHA, adjust=True).mean())
    )
    return ev[["user_id", "event_id", "ewm"]]


def q8_topk_per_group(sf_dir):
    o = _read(sf_dir, "orders").sort_values(
        ["o_custkey", "o_totalprice", "o_orderkey"], ascending=[True, False, True]
    )
    top = o.groupby("o_custkey", sort=False).head(3)
    return top[["o_custkey", "o_orderkey", "o_totalprice"]]


def q9_dedup_exact(sf_dir):
    d = _read(sf_dir, "documents")
    keep = d.groupby("text", sort=False)["doc_id"].min()
    return d[d.doc_id.isin(keep)][["doc_id", "lang", "source", "n_chars"]]


def q10_dedup_minhash(sf_dir):
    d = _read(sf_dir, "documents")
    k, rows = 16, 4
    rng = np.random.RandomState(7)
    a = rng.randint(1, 2**61 - 1, size=k).astype(np.uint64)
    b = rng.randint(0, 2**61 - 1, size=k).astype(np.uint64)
    sigs, shingle_sets = {}, {}
    for doc_id, text in zip(d.doc_id, d.text):
        toks = text.lower().split(" ")
        sh = {hash(" ".join(toks[i : i + 3])) & 0xFFFFFFFFFFFFFFFF
              for i in range(len(toks) - 2)}
        shingle_sets[doc_id] = sh
        hv = np.fromiter(sh, dtype=np.uint64, count=len(sh))
        sigs[doc_id] = [(a[i] * hv + b[i]).min() for i in range(k)]
    buckets: dict[tuple, list] = {}
    for doc_id, sig in sigs.items():
        for band in range(k // rows):
            key = (band, tuple(sig[band * rows : (band + 1) * rows]))
            buckets.setdefault(key, []).append(doc_id)
    pairs = set()
    for ids in buckets.values():
        ids.sort()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    out = []
    for da, db in pairs:
        sa, sb = shingle_sets[da], shingle_sets[db]
        inter = len(sa & sb)
        jac = inter / (len(sa) + len(sb) - inter)
        if jac >= 0.5:
            out.append((da, db, round(jac, 6)))
    return pd.DataFrame(out, columns=["doc_a", "doc_b", "jaccard"])


def q11_sim_topk(sf_dir):
    e = _read(sf_dir, "embeddings")
    E = np.stack(e.embedding.to_numpy()).astype(np.float64)
    ids = e.vec_id.to_numpy()
    qmask = ids < 20
    Q = E[qmask]
    sim = (Q @ E.T) / (
        np.linalg.norm(Q, axis=1)[:, None] * np.linalg.norm(E, axis=1)[None, :]
    )
    out = []
    for qi, qid in enumerate(ids[qmask]):
        s = sim[qi].copy()
        s[ids == qid] = -np.inf
        top = np.argsort(-s, kind="stable")[:5]
        out.extend(
            (qid, ids[t], round(s[t], 6), r + 1) for r, t in enumerate(top)
        )
    return pd.DataFrame(out, columns=["query_id", "neighbor_id", "cos", "rk"])


def q12_text_tfidf(sf_dir):
    d = _read(sf_dir, "documents")
    tok = d[["doc_id"]].assign(tok=d.text.str.lower().str.split(" ")).explode("tok")
    tf = tok.groupby(["doc_id", "tok"], sort=False).size().rename("tf").reset_index()
    df = tok.drop_duplicates().groupby("tok", sort=False).size().rename("df")
    n_docs = len(d)
    out = tf.merge(df, on="tok")
    out["tfidf"] = (out.tf * (np.log((n_docs + 1.0) / (out.df + 1.0)) + 1.0)).round(6)
    return out


def q13_lang_id(sf_dir):
    d = _read(sf_dir, "documents")
    recs = []
    for doc_id, lang, text in zip(d.doc_id, d.lang, d.text):
        recs.append((doc_id, lang, [text[i : i + 3] for i in range(len(text) - 2)]))
    tg = (
        pd.DataFrame(recs, columns=["doc_id", "lang", "tg"])
        .explode("tg")
    )
    prof = (
        tg.groupby(["lang", "tg"], sort=False)
        .size()
        .rename("cnt")
        .reset_index()
        .sort_values(["lang", "cnt", "tg"], ascending=[True, False, True])
        .groupby("lang", sort=False)
        .head(20)[["lang", "tg"]]
        .rename(columns={"lang": "cand_lang"})
    )
    doc_tg = tg.drop_duplicates().rename(columns={"lang": "true_lang"})
    scores = (
        doc_tg.merge(prof, on="tg")
        .groupby(["doc_id", "true_lang", "cand_lang"], sort=False)
        .size()
        .rename("score")
        .reset_index()
        .sort_values(["doc_id", "score", "cand_lang"], ascending=[True, False, True])
    )
    return scores.groupby("doc_id", sort=False).head(1).rename(
        columns={"cand_lang": "pred_lang"}
    )


def q14_stream_tumbling(sf_dir):
    # pandas is eager: "streaming" is just the batch aggregation.
    ev = _read(sf_dir, "events")
    ev["day"] = ev.ts.dt.floor("D")
    return (
        ev.groupby(["day", "event_type"])
        .agg(n=("value", "size"), sum_value=("value", "sum"))
        .reset_index()
    )


def q16_tpch_q6(sf_dir):
    li = _read(sf_dir, "lineitem")
    m = li[
        (li.l_shipdate >= pd.Timestamp("1996-01-01"))
        & (li.l_shipdate < pd.Timestamp("1997-01-01"))
        & (li.l_discount >= 0.05)
        & (li.l_discount <= 0.07)
        & (li.l_quantity < 24)
    ]
    return round((m.l_extendedprice * m.l_discount).sum(), 2), len(m)


def q17_curate(sf_dir):
    import hashlib

    d = _read(sf_dir, "documents")
    e = _read(sf_dir, "embeddings")
    q = d[(d.n_chars >= 50) & (d.text.str.split(" ").str.len() >= 10)]
    h = q.text.map(lambda t: hashlib.md5(t.encode()).hexdigest())
    keep = q.assign(h=h).groupby("h", as_index=False).doc_id.min()
    out = keep.merge(d, on="doc_id").merge(
        e.rename(columns={"vec_id": "doc_id"})[["doc_id", "label"]], on="doc_id"
    )
    out["n_tokens"] = out.text.str.split(" ").str.len()
    return out[["doc_id", "lang", "source", "n_tokens", "label"]]


def q18_ohlc(sf_dir):
    ev = _read(sf_dir, "events").sort_values("event_id")
    return (
        ev.set_index("ts")
        .groupby([pd.Grouper(freq="1D"), "event_type"])["value"]
        .ohlc()
        .reset_index()
    )


def q19_upsert_cdc(sf_dir):
    ev = _read(sf_dir, "events")
    cutoff = pd.Timestamp("2024-01-25")
    def latest(df):
        return (
            df.sort_values("event_id")
            .drop_duplicates(["user_id", "event_type"], keep="last")
        )
    base = latest(ev[ev.ts < cutoff])
    upd = latest(ev[ev.ts >= cutoff])
    merged = pd.concat([base, upd]).sort_values("event_id")
    return merged.drop_duplicates(["user_id", "event_type"], keep="last")


def q20_partition_prune(sf_dir):
    import tempfile

    ev = _read(sf_dir, "events")
    d = tempfile.mkdtemp(prefix="pd_part_")
    ev.assign(event_date=ev.ts.dt.strftime("%Y-%m-%d")).to_parquet(
        d, partition_cols=["event_date"]
    )
    back = pd.read_parquet(
        d,
        filters=[
            ("event_date", ">=", "2024-01-10"),
            ("event_date", "<=", "2024-01-12"),
        ],
    )
    return (
        back.groupby([back.event_date, "event_type"])["value"]
        .agg(["count", "sum"])
        .reset_index()
    )


def q21_asof_directions(sf_dir):
    ev = _read(sf_dir, "events").sort_values("ts")
    p = ev[ev.event_type == "purchase"][["ts", "user_id", "value"]]
    out = ev
    for d in ("backward", "forward", "nearest"):
        out = pd.merge_asof(
            out.sort_values("ts"),
            p.rename(columns={"value": f"{d[0]}_val"}),
            on="ts",
            by="user_id",
            direction=d,
        )
    return out


def q22_decontaminate(sf_dir):
    d = _read(sf_dir, "documents")
    toks = d.text.str.lower().str.split(" ")
    ngs = toks.map(
        lambda ts: frozenset(
            " ".join(ts[i : i + 4]) for i in range(max(len(ts) - 3, 0))
        )
    )
    is_eval = (d.doc_id % 50 == 0).to_numpy()
    eval_ngrams = frozenset().union(*ngs[is_eval]) if is_eval.any() else frozenset()
    train = d.loc[~is_eval, ["doc_id"]].copy()
    tng = ngs[~is_eval]
    train["n_ngrams"] = tng.map(len)
    train["n_hits"] = tng.map(lambda s: len(s & eval_ngrams))
    train["contaminated"] = train.n_hits > 0
    return train


def q23_lm_score(sf_dir):
    from collections import Counter

    d = _read(sf_dir, "documents")
    toks = d.text.str.lower().str.split(" ")
    cnt = Counter(t for ts in toks for t in ts)
    total = sum(cnt.values())
    logp = {t: np.log(c / total) for t, c in cnt.items()}
    nll = toks.map(lambda ts: -round(sum(logp[t] for t in ts), 6) / len(ts))
    return pd.DataFrame(
        {
            "doc_id": d.doc_id,
            "n_tokens": toks.map(len),
            "nll": nll,
            "ppl": np.round(np.exp(nll), 6),
        }
    )


def q24_rolling_slope(sf_dir):
    e = _read(sf_dir, "events").sort_values(["user_id", "event_id"])
    x = (
        e.ts.astype("datetime64[ns]").astype("int64") // 1000
        - 1_704_067_200_000_000
    ).astype("float64")
    g = pd.DataFrame({"user_id": e.user_id, "x": x, "y": e.value}).groupby(
        "user_id"
    )
    cov = g.apply(
        lambda d: d.x.rolling(20).cov(d.y) / d.x.rolling(20).var(),
        include_groups=False,
    ).reset_index(level=0, drop=True)
    return pd.DataFrame(
        {
            "user_id": e.user_id,
            "event_id": e.event_id,
            "slope_per_day": cov * 86_400_000_000.0,
        }
    )


def q25_lm_bigram(sf_dir):
    from collections import Counter

    d = _read(sf_dir, "documents")
    toks = d.text.str.lower().str.split(" ")
    uni = Counter(t for ts in toks for t in ts)
    total = sum(uni.values())
    bigs = toks.map(lambda ts: [(ts[i], ts[i + 1]) for i in range(len(ts) - 1)])
    big = Counter(b for bs in bigs for b in bs)
    logp = {
        b: np.log(0.75 * c / uni[b[0]] + 0.25 * uni[b[1]] / total)
        for b, c in big.items()
    }
    n = bigs.map(len)
    nll2 = bigs.map(lambda bs: -round(sum(logp[b] for b in bs), 6)) / n
    return pd.DataFrame({"doc_id": d.doc_id, "n_bigrams": n, "nll2": nll2})


def q26_pii_scrub(sf_dir):
    import hashlib
    import re as _re

    d = _read(sf_dir, "documents")
    body = (
        d.text
        + " contact user"
        + d.doc_id.astype(str)
        + "@example.com or 555-"
        + d.n_chars.astype(str)
    )
    email = _re.compile(r"[a-z0-9]+@[a-z]+\.[a-z]+")
    phone = _re.compile(r"555-[0-9]+")
    scrub = body.map(
        lambda s: phone.sub("<PHONE>", email.sub("<EMAIL>", s))
    )
    return pd.DataFrame(
        {
            "doc_id": d.doc_id,
            "lang": d.lang,
            "n_emails": body.map(lambda s: len(email.findall(s))),
            "n_phones": body.map(lambda s: len(phone.findall(s))),
            "scrub_md5": scrub.map(
                lambda s: hashlib.md5(s.encode()).hexdigest()
            ),
            "scrub_len": scrub.str.len(),
        }
    )


def q27_quantize(sf_dir):
    e = _read(sf_dir, "embeddings")
    mat = np.stack(e.embedding.to_numpy()).astype(np.float64)
    absmax = np.abs(mat).max(axis=1)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0)
    q = np.floor(mat / scale[:, None] + 0.5).astype(np.int64)
    return pd.DataFrame(
        {
            "vec_id": e.vec_id,
            "label": e.label,
            "scale": scale,
            "dim": mat.shape[1],
            "sum_q": q.sum(axis=1),
            "sum_q2": (q * q).sum(axis=1),
            "n_clipped": (np.abs(q) > 127).sum(axis=1),
        }
    )


def q28_m4_downsample(sf_dir):
    ev = _read(sf_dir, "events")[["user_id", "event_id", "value", "ts"]]
    ev = ev.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    ts_us = ev.ts.astype("datetime64[us]").astype("int64")
    g = ev.assign(ts_us=ts_us).groupby("user_id")
    t0 = g.ts_us.transform("min")
    t1 = g.ts_us.transform("max")
    bucket = ((ev.assign(ts_us=ts_us).ts_us - t0) * 100 // (t1 - t0 + 1)).clip(
        upper=99
    )
    d = ev.assign(ts_us=ts_us, bucket=bucket)
    gb = d.groupby(["user_id", "bucket"])
    out = gb.agg(
        n=("value", "size"),
        vmin=("value", "min"),
        vmax=("value", "max"),
        vfirst=("value", "first"),
        vlast=("value", "last"),
        t_start_us=("ts_us", "min"),
        t_end_us=("ts_us", "max"),
    ).reset_index()
    return out


def q29_dedup_lines(sf_dir):
    d = _read(sf_dir, "documents").sort_values("doc_id")
    seen: set[str] = set()
    out = []
    for doc_id, text in zip(d.doc_id, d.text):
        toks = text.lower().split(" ")
        n_segs = (len(toks) + 9) // 10
        kept = 0
        for i in range(n_segs):
            seg = " ".join(toks[i * 10 : (i + 1) * 10])
            if seg not in seen:
                seen.add(seg)
                kept += 1
        out.append((doc_id, n_segs, kept, round(kept / n_segs, 6)))
    return pd.DataFrame(
        out, columns=["doc_id", "n_segs", "n_kept", "kept_frac"]
    )


PANDAS_QUERIES = {
    "q1_lineitem_agg": q1_lineitem_agg,
    "q2_join_inner": q2_join_inner,
    "q3_join_broadcast": q3_join_broadcast,
    "q4_join_asof": q4_join_asof,
    "q5_rolling_time": q5_rolling_time,
    "q6_resample": q6_resample,
    "q7_ewm": q7_ewm,
    "q8_topk_per_group": q8_topk_per_group,
    "q9_dedup_exact": q9_dedup_exact,
    "q10_dedup_minhash": q10_dedup_minhash,
    "q11_sim_topk": q11_sim_topk,
    "q12_text_tfidf": q12_text_tfidf,
    "q13_lang_id": q13_lang_id,
    "q14_stream_tumbling": q14_stream_tumbling,
    "q16_tpch_q6": q16_tpch_q6,
    "q17_curate": q17_curate,
    "q18_ohlc": q18_ohlc,
    "q19_upsert_cdc": q19_upsert_cdc,
    "q20_partition_prune": q20_partition_prune,
    "q21_asof_directions": q21_asof_directions,
    "q22_decontaminate": q22_decontaminate,
    "q23_lm_score": q23_lm_score,
    "q24_rolling_slope": q24_rolling_slope,
    "q25_lm_bigram": q25_lm_bigram,
    "q26_pii_scrub": q26_pii_scrub,
    "q27_quantize": q27_quantize,
    "q28_m4_downsample": q28_m4_downsample,
    "q29_dedup_lines": q29_dedup_lines,
}
