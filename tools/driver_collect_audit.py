#!/usr/bin/env python
"""Driver-collect audit: prove no operator ships data-proportional task
results through the driver at scale.

Motivation (round 9, measured): text_dup_ngrams' original join-back
shape passed every sf0.01/sf0.1 gate and every static plan pin, then
died at the 256x fixture when AQE re-planned the frequency join into a
broadcast whose build side was the 40M-row pair set — 2.2 GB of task
results collected through the driver. Static plan audits cannot catch
that class: the hazard only materializes when AQE's runtime
re-estimation fires at real data volume.

Method: build a session identical to the engine's bench session EXCEPT
`spark.driver.maxResultSize=256m` (vs the 1g default), then run each
audited op at the scaled fixture via `.count()`. A 256x fixture is
~2 GB of raw table data, so ANY plan that funnels a data-proportional
intermediate through the driver — a mis-built broadcast, a hidden
collect in a builder, an accumulator gone wild — trips the cap and
fails LOUDLY, while the contract's sanctioned bounded collects (the
<= _N_QUERIES query block, k x dim centroid sums, pruned partition
listings) stay orders of magnitude under it. Completion under the
tight cap is therefore a per-op theorem: driver traffic is O(1) in the
corpus, which is the property that lets these plans run against 100 TB
where the driver is one machine and the data is not.

The audited list is every registered op whose plan joins a derived
aggregate back to its own big side, or that the curation/text family
runs over full corpus scans — the shapes where the broadcast hazard
class lives. The quadratic-by-design ops (vec_semdedup) and the
index-building ANN families are excluded: their scale story is owned
by curation_scale_probe.py / ann_recall_lab.py.

Usage: python tools/driver_collect_audit.py [sf_dir]
e.g.   python tools/driver_collect_audit.py /tmp/sf256full
Exit 0 = every op completed under the tight cap.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf256full"

# op -> why it is in the audit
AUDITED = {
    "text_dup_ngrams": "corpus-frequency stat; the class's index case",
    "text_tfidf": "per-term doc-frequency joined back to the tf table",
    "text_lm_score": "unigram model probs joined back to token stream",
    "text_lm_bigram": "bigram probs joined back to bigram stream",
    "dedup_exact": "md5(text) grouping over the full corpus",
    "dedup_near": "signature grouping over the full corpus",
    "dedup_lines": "line-frequency stat joined back to lines",
    "text_tokenize": "full-corpus explode + agg",
    "text_stats": "full-corpus per-doc scoring",
    "pipeline_mixture": "hash-threshold filter, map-side by design",
    "pipeline_decontaminate": "broadcast eval-set probe (bounded side)",
    "pipeline_token_budget": "per-lang ordered window over the corpus",
    "pipeline_cluster_balance": "bounded-collect seeds + corpus window",
    "vec_kmeans": "k*64 centroid sums are the ONLY sanctioned collect",
    "pipeline_curate_embedding":
        "full linear recipe: bounded broadcast attach must stay <= 640*m",
    # pipeline_curate_semantic is NOT audited at the scaled fixture:
    # its interior vec_semdedup is quadratic-within-cluster with k
    # pinned at 8 for oracle determinism, so a full-corpus 512k run is
    # intractable BY DESIGN (curation_scale_probe measures that law on
    # subsets). Its one driver-shaped property — the doc attach
    # broadcasting <= k*m rows — is pinned by
    # tests/test_plans.py::test_curate_semantic_doc_join_broadcasts.
}


def main() -> int:
    from pyspark.sql import SparkSession

    from pandas_tsdb_spark.registry import load_all
    from pandas_tsdb_spark.session import RUNTIME_CONFS

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("driver-collect-audit")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.driver.maxResultSize", "256m")  # the tight cap
        .getOrCreate()
    )
    for k, v in RUNTIME_CONFS.items():
        spark.conf.set(k, v)
    spark.sparkContext.setLogLevel("ERROR")

    specs = load_all()
    out: dict = {"sf_dir": SF_DIR, "cap": "256m", "ops": {}}
    fails = 0
    for name, why in AUDITED.items():
        t0 = time.perf_counter()
        try:
            n = specs[name].builder(spark, SF_DIR).count()
            sec = round(time.perf_counter() - t0, 2)
            out["ops"][name] = {"ok": True, "rows": n, "sec": sec}
            print(f"{name}: ok rows={n} {sec}s", file=sys.stderr)
        except Exception as ex:
            fails += 1
            msg = str(ex).split("\n")[0][:200]
            out["ops"][name] = {"ok": False, "error": msg}
            print(f"{name}: FAIL {msg}", file=sys.stderr)
    out["fails"] = fails
    print(json.dumps(out))
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
