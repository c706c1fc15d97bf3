#!/usr/bin/env python
"""Round-9 verdict #6 lab: can multi-probe LSH lift ann_lsh's strict
recall@1 above its 0.5 floor at 512k vectors, and at what candidate
cost? A faithful numpy replica of llm_vectors.ann_lsh's kernel — same
seed (42), same geometry (8 tables x 4 hyperplanes over 64 dims), same
global-bucket encoding — so a knob that wins here wins there.

Multi-probe (Lv et al., VLDB'07, applied to sign-LSH): a query whose
true neighbor differs in ONE table bit is usually separated by the
hyperplane its projection lies CLOSEST to zero on. Probing the buckets
obtained by flipping the 1st / 2nd lowest-|projection| bits (and their
pair) recovers those misses with bounded candidate growth — the probe
side fans out x(1+P) per table while the stored side stays x1.

Usage: OMP_NUM_THREADS=8 python tools/lsh_probe_lab.py /tmp/sf256full
"""

from __future__ import annotations

import json
import sys

import duckdb
import numpy as np

N_QUERIES = 20
N_TABLES = 8
N_PLANES = 4
SEED = 42


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf256full"
    con = duckdb.connect()
    glob = (
        f"{sf}/embeddings.parquet/*.parquet"
        if "full" in sf
        else f"{sf}/embeddings.parquet"
    )
    df = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{glob}') "
        "WHERE embedding IS NOT NULL ORDER BY vec_id"
    ).fetchdf()
    ids = df["vec_id"].to_numpy()
    E = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    n = len(En)
    print(f"n={n}", file=sys.stderr)

    # ground truth: exact top-1 per query (vec_id < N_QUERIES)
    qmask = ids < N_QUERIES
    Qn, qids = En[qmask], ids[qmask]
    sims = Qn @ En.T
    truth = {}
    for j, qid in enumerate(qids):
        s = sims[j].copy()
        s[ids == qid] = -2
        truth[qid] = ids[int(np.argmax(s))]

    from collections import defaultdict

    def run_config(n_tables, n_planes, probe_list):
        rng = np.random.RandomState(SEED)
        planes = rng.standard_normal((n_tables, n_planes, 64))
        weights = 1 << np.arange(n_planes)
        proj = np.einsum("nd,tpd->ntp", E, planes)  # raw E, like kernel
        codes = (proj > 0).astype(np.int64).dot(weights)  # (n, T)

        buckets: dict[int, list[int]] = defaultdict(list)
        for i in range(n):
            for t in range(n_tables):
                buckets[(t << 32) | int(codes[i, t])].append(i)

        qproj = proj[qmask]
        qcodes = codes[qmask]

        # multi-probe order: flips of the lowest-|proj| bits
        flipsets = [(0,), (1,), (0, 1), (2,), (0, 2), (1, 2), (0, 1, 2),
                    (3,), (0, 3), (1, 3)]

        def probe_codes(j, t, n_probe):
            base = int(qcodes[j, t])
            out = [base]
            order = np.argsort(np.abs(qproj[j, t]), kind="stable")
            for fs in flipsets[:n_probe]:
                c = base
                for f in fs:
                    c ^= int(weights[order[f]])
                out.append(c)
            return out

        out = {}
        for n_probe in probe_list:
            hits = 0
            cand_sizes = []
            for j, qid in enumerate(qids):
                cand: set[int] = set()
                for t in range(n_tables):
                    for c in probe_codes(j, t, n_probe):
                        cand.update(buckets.get((t << 32) | int(c), ()))
                cand.discard(int(np.flatnonzero(ids == qid)[0]))
                cand_sizes.append(len(cand))
                if not cand:
                    continue
                sel = np.fromiter(cand, dtype=np.int64)
                best = sel[int(np.argmax(En[sel] @ Qn[j]))]
                hits += ids[best] == truth[qid]
            r, c = hits / len(qids), float(np.mean(cand_sizes))
            out[f"L{n_tables}_P{n_planes}_probe{n_probe}"] = {
                "recall_at_1": round(r, 3),
                "avg_candidates": round(c, 1),
                "cand_frac": round(c / n, 5),
            }
            print(
                f"L={n_tables} P={n_planes} probes+{n_probe}: "
                f"recall@1={r:.3f} cand={c:.0f} ({c / n:.4%})",
                file=sys.stderr,
            )
        return out

    results = {}
    # the shipped geometry (8x4) and denser-plane candidates that
    # shrink buckets 2^(P-4)-fold; multi-probe recovers the recall the
    # extra planes cost
    results.update(run_config(8, 4, (0, 1)))
    results.update(run_config(8, 10, (0, 1, 3, 7, 10)))
    results.update(run_config(8, 12, (0, 3, 7, 10)))
    results.update(run_config(8, 14, (0, 7, 10)))
    results.update(run_config(16, 12, (0, 3, 7)))
    print(json.dumps({"n": n, **results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
