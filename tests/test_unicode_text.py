"""Round-6 sweep #10: MULTIBYTE TEXT through the documents family.

The fixture corpus is ASCII, so five rounds of driver hashes never
exercised the byte-vs-codepoint fork: Spark string functions are
codepoint-based (like DuckDB's), but the BINARY modality ops hash and
bucket UTF-8 BYTES — and their SQL mirrors used per-character ascii()/
length(), which coincide with byte semantics iff every char is one
byte. A real scraped corpus is full of emoji, CJK, combining marks and
RTL text.

Injection: every 7th doc becomes CJK-only; every 5th gets an
emoji/accents/Hebrew suffix. The probe found the text-analysis family
(tokenize/tfidf/lang_id/pii/entropy/...) fully byte-vs-char clean, and
all four multimodal ops divergent — their oracles were rewritten to
true byte semantics (walk hex(encode(text)) two chars per byte), which
also retired multimodal_phash_dedup's documented ASCII-only mirror
precondition.
"""

from __future__ import annotations

import glob
import os
import shutil

import pytest

pytestmark = pytest.mark.sweep

from pyspark.sql import functions as F

from pandas_tsdb_spark.registry import load_all

SMALL = "/root/testdata/sf0.001"
SPECS = load_all()

UNI_OPS = sorted(
    name
    for name, spec in SPECS.items()
    if spec.oracle is not None and "documents" in spec.oracle.lower()
)


@pytest.fixture(scope="module")
def unicode_stage(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("unicode_text")
    stage = str(tmp / "sf")
    os.makedirs(stage)
    d = spark.read.parquet(f"{SMALL}/documents.parquet")
    uni = d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.lit("模型 训练 数据 去重 质量 评分 模型 训练"),
        )
        .when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.col("text"),
                F.lit(" café naïve \U0001F600\U0001F680 שלום étude token"),
            ),
        )
        .otherwise(F.col("text")),
    )
    dd = str(tmp / "docs")
    uni.coalesce(1).write.parquet(dd)
    shutil.copy(glob.glob(f"{dd}/part-*.parquet")[0], f"{stage}/documents.parquet")
    for table in (
        "region nation customer supplier part orders lineitem "
        "events embeddings"
    ).split():
        os.symlink(f"{SMALL}/{table}.parquet", f"{stage}/{table}.parquet")
    return stage


@pytest.mark.parametrize("name", UNI_OPS)
def test_unicode_text_differential(spark, unicode_stage, name):
    from tests.harness import compare, duck_connect

    spec = SPECS[name]
    con = duck_connect(unicode_stage)
    sp = spec.builder(spark, unicode_stage).toPandas()
    du = con.execute(spec.oracle).fetchdf()
    errs = compare(sp, du, name)
    assert not errs, errs[:5]
