#!/usr/bin/env python
"""Round-8 verdict #5 lab: decompose IVF-PQ recall@5 at 512k vectors
and measure candidate improvements (OPQ rotation, residual-codebook
quality, shortlist size) WITHOUT Spark — a faithful numpy replica of
llm_vectors.ann_ivf_pq's train/encode/ADC pipeline (same seeds, same
sample, same geometry), so a knob that wins here wins there.

Usage: OMP_NUM_THREADS=8 python tools/ann_recall_lab.py /tmp/sf256full
"""

from __future__ import annotations

import json
import sys

import duckdb
import numpy as np

K = 5
N_QUERIES = 20
PQ_M = 8
PQ_K = 256
SAMPLE = 4096


def ivf_geometry(n):
    import math

    cells = 2 ** int(math.log2(max(16.0, math.sqrt(n))))
    cells = max(16, min(128, cells))
    return cells, max(8, cells // 2)


def train_coarse(Xn, n_cells, iters=10):
    Cn = Xn[:n_cells].copy()
    for _ in range(iters):
        assign_ = np.argmax(Xn @ Cn.T, axis=1)
        for c in range(len(Cn)):
            members = Xn[assign_ == c]
            if len(members):
                m = members.mean(axis=0)
                nrm = np.linalg.norm(m)
                if nrm > 0:
                    Cn[c] = m / nrm
    return Cn


def train_books(R, sub, iters=10, kmpp_seed=None):
    books = []
    for m in range(PQ_M):
        S = R[:, m * sub : (m + 1) * sub]
        if kmpp_seed is None:
            C = S[:PQ_K].copy()
        else:  # deterministic k-means++ seeding
            rng = np.random.RandomState(kmpp_seed + m)
            idx = [int(rng.randint(len(S)))]
            d2min = ((S - S[idx[0]]) ** 2).sum(axis=1)
            for _ in range(PQ_K - 1):
                p = d2min / d2min.sum()
                idx.append(int(rng.choice(len(S), p=p)))
                d2min = np.minimum(d2min, ((S - S[idx[-1]]) ** 2).sum(axis=1))
            C = S[idx].copy()
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d2, axis=1)
            for c in range(PQ_K):
                members = S[a == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books.append(C)
    return np.stack(books)


def encode(En, Cn, B, sub, Rot=None):
    cells = np.argmax(En @ Cn.T, axis=1)
    res = En - Cn[cells]
    if Rot is not None:
        res = res @ Rot
    codes = np.empty((len(En), PQ_M), dtype=np.int32)
    for m in range(PQ_M):
        S = res[:, m * sub : (m + 1) * sub]
        # chunked to bound memory at 512k x 256 x 8
        for lo in range(0, len(S), 65536):
            sl = S[lo : lo + 65536]
            d2 = ((sl[:, None, :] - B[m][None, :, :]) ** 2).sum(axis=2)
            codes[lo : lo + 65536, m] = np.argmin(d2, axis=1)
    return cells, codes


def opq_rotation(R, sub, iters=5, inner=6):
    """OPQ alternating optimization on residuals: rotate -> train books
    -> reconstruct -> Procrustes-solve the rotation. Deterministic."""
    dim = R.shape[1]
    Rot = np.eye(dim)
    B = None
    for _ in range(iters):
        RR = R @ Rot
        B = train_books(RR, sub, iters=inner)
        # reconstruct RR from codes
        recon = np.empty_like(RR)
        for m in range(PQ_M):
            S = RR[:, m * sub : (m + 1) * sub]
            d2 = ((S[:, None, :] - B[m][None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d2, axis=1)
            recon[:, m * sub : (m + 1) * sub] = B[m][a]
        U, _s, Vt = np.linalg.svd(R.T @ recon)
        Rot = U @ Vt
    return Rot, B


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf256full"
    con = duckdb.connect()
    df = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{sf}/embeddings.parquet/*.parquet') "
        "WHERE embedding IS NOT NULL ORDER BY vec_id"
    ).fetchdf()
    ids = df["vec_id"].to_numpy()
    E = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    qmask = ids < N_QUERIES
    Qn, qids = En[qmask], ids[qmask]
    n_vec = len(En)
    dim = En.shape[1]
    sub = dim // PQ_M
    print(f"n={n_vec} dim={dim}", file=sys.stderr)

    # ground truth: exact cosine top-K (excluding self)
    sims = Qn @ En.T
    truth = {}
    for j, qid in enumerate(qids):
        s = sims[j].copy()
        s[ids == qid] = -2
        top = np.argpartition(-s, K)[:K]
        top = top[np.argsort(-s[top], kind="stable")]
        truth[qid] = set(ids[top])

    # codebook sample: md5-ordered in the engine; here first-SAMPLE by
    # vec_id is a fair stand-in (synthetic data is exchangeable)
    Xn = En[:SAMPLE]
    n_cells, nprobe = ivf_geometry(n_vec)
    Cn = train_coarse(Xn, n_cells)
    n_cells = len(Cn)
    a0 = np.argmax(Xn @ Cn.T, axis=1)
    R0 = Xn - Cn[a0]

    cells_all = np.argmax(En @ Cn.T, axis=1)
    qcells = np.argsort(-(Qn @ Cn.T), axis=1, kind="stable")[:, :nprobe]

    # router ceiling: truth neighbors whose cell is probed
    hits = total = 0
    for j, qid in enumerate(qids):
        probed = set(qcells[j])
        for t in truth[qid]:
            total += 1
            if cells_all[ids == t][0] in probed:
                hits += 1
    print(f"router ceiling recall@{K}: {hits / total:.3f}", file=sys.stderr)

    def adc_recall(B, Rot, cand_k):
        cells, codes = encode(En, Cn, B, sub, Rot)
        hits = total = 0
        for j, qid in enumerate(qids):
            probe = np.isin(cells, qcells[j]) & (ids != qid)
            sel = np.flatnonzero(probe)
            Rq = Qn[j] - Cn[cells[sel]]
            if Rot is not None:
                Rq = Rq @ Rot
            d = np.zeros(len(sel))
            for m in range(PQ_M):
                Sq = Rq[:, m * sub : (m + 1) * sub]
                # per-row distance to its assigned codeword
                cw = B[m][codes[sel, m]]
                d += ((Sq - cw) ** 2).sum(axis=1)
            take = min(cand_k, len(d))
            top = np.argpartition(d, take - 1)[:take]
            cand_ids = set(ids[sel][top])
            for t in truth[qid]:
                total += 1
                hits += t in cand_ids
        return hits / total

    cand_k = max(64, n_vec // 500)
    results = {}
    B_base = train_books(R0, sub)
    results["baseline_cand0.2pct"] = adc_recall(B_base, None, cand_k)
    print(f"baseline: {results['baseline_cand0.2pct']:.3f}", file=sys.stderr)
    results["baseline_cand0.4pct"] = adc_recall(B_base, None, cand_k * 2)
    print(f"cand x2: {results['baseline_cand0.4pct']:.3f}", file=sys.stderr)
    B_pp = train_books(R0, sub, iters=16, kmpp_seed=7)
    results["kmpp_iters16"] = adc_recall(B_pp, None, cand_k)
    print(f"kmpp+iters16: {results['kmpp_iters16']:.3f}", file=sys.stderr)
    Rot, B_opq = opq_rotation(R0, sub)
    results["opq"] = adc_recall(B_opq, Rot, cand_k)
    print(f"opq: {results['opq']:.3f}", file=sys.stderr)
    results["opq_cand0.4pct"] = adc_recall(B_opq, Rot, cand_k * 2)
    print(f"opq+cand x2: {results['opq_cand0.4pct']:.3f}", file=sys.stderr)
    print(json.dumps({"n": n_vec, "router_ceiling": hits / total, **results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
