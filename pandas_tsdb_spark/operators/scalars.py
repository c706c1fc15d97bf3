"""§2.8 scalar function surface — string/date/math/cond/cast/array/map/
JSON expression coverage, all JVM-side (whole-stage codegen; no UDFs).

Cross-dialect notes baked into the oracles:
- dayofweek: Spark is 1=Sunday..7; DuckDB dayofweek/dow is 0=Sunday..6
  -> oracle adds 1.
- double->int CAST: Spark truncates toward zero, DuckDB rounds ->
  always floor() explicitly before casting in both.
- round() on raw 2-decimal data at <=2 digits is a guaranteed decimal
  tie (123.45 @1 digit) where the engines disagree -> never do that;
  irrational outputs (ln/exp) round at 6 digits where ties are
  measure-zero.
- libm (ln/exp/log10/pow): JVM Math vs C libm can differ in the last
  ulp -> round(6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandas_tsdb_spark.catalog import Tables
from pandas_tsdb_spark.registry import query


@query(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_up,
           lower(c_mktsegment) AS seg_lo,
           substring(c_name, 1, 9) AS name_pfx,
           concat_ws('-', c_mktsegment, c_name) AS seg_name,
           length(c_name) AS name_len,
           replace(c_name, 'Customer#', 'C') AS name_short,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           (c_name LIKE 'Customer#%') AS is_cust,
           regexp_replace(c_mktsegment, '[AEIOU]', '_', 'g') AS seg_mask,
           trim('  ' || c_mktsegment || ' ') AS seg_trim
    FROM customer
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/substr/concat/length/replace/regex/like/trim."""
    c = Tables(spark, sf_dir).customer
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_up"),
        F.lower("c_mktsegment").alias("seg_lo"),
        F.substring("c_name", 1, 9).alias("name_pfx"),
        F.concat_ws("-", "c_mktsegment", "c_name").alias("seg_name"),
        F.length("c_name").alias("name_len"),
        F.replace(F.col("c_name"), F.lit("Customer#"), F.lit("C")).alias("name_short"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.col("c_name").like("Customer#%").alias("is_cust"),
        F.regexp_replace("c_mktsegment", "[AEIOU]", "_").alias("seg_mask"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias("seg_trim"),
    )


@query(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS y,
           month(o_orderdate) AS m,
           day(o_orderdate) AS d,
           quarter(o_orderdate) AS q,
           dayofweek(o_orderdate) + 1 AS dow_sun1,
           weekofyear(o_orderdate) AS iso_week,
           date_trunc('month', o_orderdate) AS month_start,
           o_orderdate + INTERVAL 30 DAY AS due_ts,
           date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS days_to_y2k,
           strftime(o_orderdate, '%Y-%m') AS ym,
           epoch_ms(o_orderdate) AS epoch_millis
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/quarter/dow/week/trunc/add/diff/format/epoch.

    dayofweek epochs differ (Spark 1=Sun, DuckDB 0=Sun) — normalized in
    the oracle, not here, so the engine keeps Spark-native semantics.
    """
    o = Tables(spark, sf_dir).orders
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.quarter("o_orderdate").alias("q"),
        F.dayofweek("o_orderdate").alias("dow_sun1"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_ts"),
        F.datediff(
            F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("days_to_y2k"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("epoch_millis"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 30000) AS abs_dev,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           round(ln(l_extendedprice), 6) AS ln_price,
           round(log10(l_extendedprice), 6) AS log10_price,
           round(exp(l_discount), 6) AS exp_disc,
           power(l_quantity, 2) AS qty_sq,
           round(sqrt(l_quantity), 6) AS qty_sqrt,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_side,
           l_orderkey % 7 AS mod7
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs/ceil/floor/ln/log10/exp/pow/sqrt/sign/mod (codegen'd)."""
    li = Tables(spark, sf_dir).lineitem
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 30000).alias("abs_dev"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_price"),
        F.round(F.log10("l_extendedprice"), 6).alias("log10_price"),
        F.round(F.exp("l_discount"), 6).alias("exp_disc"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_side"),
        (F.col("l_orderkey") % 7).alias("mod7"),
    )


@query(
    "fn_cond",
    oracle="""
    SELECT s_suppkey,
           CASE WHEN s_acctbal < 0 THEN 'neg'
                WHEN s_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS bal_band,
           greatest(s_acctbal, 1000.0) AS floor_1k,
           least(s_acctbal, 5000.0) AS cap_5k,
           least(greatest(s_acctbal, 0.0), 8000.0) AS clipped,
           coalesce(nullif(s_name, ''), 'unknown') AS name_filled,
           (s_acctbal IS NOT NULL AND s_acctbal > 0) AS in_credit
    FROM supplier
    """,
)
def fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """np.where/mask/fillna/clip: CASE, greatest/least, coalesce/nullif."""
    s = Tables(spark, sf_dir).supplier
    return s.select(
        "s_suppkey",
        F.when(F.col("s_acctbal") < 0, "neg")
        .when(F.col("s_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bal_band"),
        F.greatest("s_acctbal", F.lit(1000.0)).alias("floor_1k"),
        F.least("s_acctbal", F.lit(5000.0)).alias("cap_5k"),
        F.least(F.greatest("s_acctbal", F.lit(0.0)), F.lit(8000.0)).alias("clipped"),
        F.coalesce(F.nullif(F.col("s_name"), F.lit("")), F.lit("unknown")).alias(
            "name_filled"
        ),
        (F.col("s_acctbal").isNotNull() & (F.col("s_acctbal") > 0)).alias("in_credit"),
    )


@query(
    "fn_cast",
    oracle="""
    SELECT l_orderkey,
           CAST(floor(l_quantity) AS BIGINT) AS qty_int,
           CAST(l_linenumber AS VARCHAR) AS line_str,
           CAST(l_linenumber AS DOUBLE) AS line_dbl,
           CAST(substring(c_name, 10, 9) AS BIGINT) AS cust_num
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    """,
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """astype() surface. double->int goes through floor() explicitly:
    bare CAST truncates in Spark but ROUNDS in DuckDB."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "l_orderkey",
            F.floor("l_quantity").cast("bigint").alias("qty_int"),
            F.col("l_linenumber").cast("string").alias("line_str"),
            F.col("l_linenumber").cast("double").alias("line_dbl"),
            F.substring("c_name", 10, 9).cast("bigint").alias("cust_num"),
        )
    )


@query(
    "fn_array",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           embedding[1] AS e0,
           embedding[64] AS e_last,
           list_sort(embedding[1:3])[1] AS s3_a,
           list_sort(embedding[1:3])[2] AS s3_b,
           list_sort(embedding[1:3])[3] AS s3_c,
           list_contains([CAST(label AS INTEGER)], label) AS self_contains
    FROM embeddings
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array structural ops on the embedding column: size/element_at/
    slice/sort/contains. Numeric kernels (dot product, norms) live in
    the llm module.

    LENIENT on dirty arrays (round-6 dirty-embeddings sweep): these are
    STRUCTURAL ops, so unlike the vector-math surface (which excludes
    invalid embeddings) a NULL or short array yields NULL outputs —
    dim is gated (Spark's legacy size(NULL) is -1, the oracle's len is
    NULL) and every element access is try_element_at (the plain ANSI
    element_at is a hard job failure on the first array shorter than
    the index)."""
    e = Tables(spark, sf_dir).embeddings
    return e.select(
        "vec_id",
        F.when(
            F.col("embedding").isNotNull(), F.size("embedding")
        ).alias("dim"),
        F.try_element_at("embedding", F.lit(1)).alias("e0"),
        F.try_element_at("embedding", F.lit(64)).alias("e_last"),
        F.try_element_at(
            F.array_sort(F.slice("embedding", 1, 3)), F.lit(1)
        ).alias("s3_a"),
        F.try_element_at(
            F.array_sort(F.slice("embedding", 1, 3)), F.lit(2)
        ).alias("s3_b"),
        F.try_element_at(
            F.array_sort(F.slice("embedding", 1, 3)), F.lit(3)
        ).alias("s3_c"),
        F.array_contains(F.array(F.col("label")), F.col("label")).alias(
            "self_contains"
        ),
    )


@query(
    "fn_array_lambda",
    oracle="""
    SELECT p_partkey,
           CAST(list_aggregate(list_transform(generate_series(1, p_size),
                                               x -> x * x), 'sum') AS BIGINT) AS sq_sum,
           CASE WHEN p_size IS NULL THEN NULL
                ELSE coalesce(array_to_string(
                       list_filter(generate_series(1, p_size),
                                   x -> x % 2 = 0), ','), '') END AS evens,
           len(generate_series(1, p_size)) AS n_terms
    FROM part
    """,
)
def fn_array_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions: transform/filter/aggregate over a
    generated integer sequence (exact integer math, no float hazards).

    Null semantics (round-6 core-table sweep): a NULL p_size yields a
    NULL sequence, and ALL THREE outputs are NULL — array_join and the
    oracle's array_to_string both propagate it, but Spark's size(NULL)
    is -1 under the legacy sizeOfNull default, so n_terms is gated
    explicitly; an aggregate over an empty evens list is '' in both."""
    p = Tables(spark, sf_dir).part
    seq = F.sequence(F.lit(1), F.col("p_size"))
    return p.select(
        "p_partkey",
        F.aggregate(
            F.transform(seq, lambda x: x * x), F.lit(0), lambda a, x: a + x
        ).cast("bigint").alias("sq_sum"),
        F.array_join(F.filter(seq, lambda x: x % 2 == 0), ",").alias("evens"),
        F.when(F.col("p_size").isNotNull(), F.size(seq).cast("bigint")).alias(
            "n_terms"
        ),
    )


@query(
    "fn_map",
    oracle="""
    SELECT event_id,
           m['k'][1] AS k_val,
           m['v'][1] AS v_val,
           cardinality(m) AS m_size,
           array_to_string(map_keys(m), ',') AS keys
    FROM (
        SELECT event_id,
               map(['k', 'v'],
                   [TRY_CAST(CASE WHEN json_valid(props)
                             THEN json_extract(props, '$.k') END AS DOUBLE),
                    value]) AS m
        FROM events
    )
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map column ops (no map col in fixtures — synthesized from props):
    create_map/element_at/size/map_keys. try_cast + the oracle's
    json_valid guard keep the op TOTAL on dirty props (NULL /
    wrong-typed / malformed) — see fn_json."""
    ev = Tables(spark, sf_dir).events
    m = F.create_map(
        F.lit("k"),
        F.get_json_object("props", "$.k").try_cast("double"),
        F.lit("v"),
        F.col("value"),
    )
    return ev.select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.element_at(m, "v").alias("v_val"),
        F.size(m).alias("m_size"),
        F.array_join(F.map_keys(m), ",").alias("keys"),
    )


@query(
    "fn_json",
    oracle="""
    SELECT event_id,
           TRY_CAST(CASE WHEN json_valid(props)
                         THEN json_extract(props, '$.k') END AS BIGINT) AS k_num,
           CASE WHEN json_valid(props)
                THEN json_extract_string(props, '$.k') END AS k_str,
           to_json(struct_pack(
               event_id := event_id,
               k := TRY_CAST(CASE WHEN json_valid(props)
                             THEN json_extract(props, '$.k') END AS BIGINT)))
               AS packed
    FROM events
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload surface: extract (string + typed), re-serialize.

    TOTAL on dirty property bags (round-6 props sweep): the engine
    contract is lenient extraction — NULL for a missing key, a
    non-numeric value (try_cast: the plain ANSI cast is a hard JOB
    FAILURE on the first 'oops' string), or a malformed document
    (get_json_object already returns NULL; the oracle needs the
    json_valid guard because DuckDB's json_extract throws). The
    re-serialize keeps NULL fields (ignoreNullFields=false) so packed
    matches DuckDB's struct serialization on null k."""
    ev = Tables(spark, sf_dir).events
    k_num = F.get_json_object("props", "$.k").try_cast("bigint")
    return ev.select(
        "event_id",
        k_num.alias("k_num"),
        F.get_json_object("props", "$.k").alias("k_str"),
        F.to_json(
            F.struct(F.col("event_id"), k_num.alias("k")),
            {"ignoreNullFields": "false"},
        ).alias("packed"),
    )


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@query(
    "fn_onehot",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_urgent,
           CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END AS is_high,
           CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END AS is_medium,
           CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0
               END AS is_not_specified,
           CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END AS is_low
    FROM orders
    """,
)
def fn_onehot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas ``pd.get_dummies`` over a known category set: one 0/1
    indicator column per level. The category list is STATIC (like
    agg_crosstab's pivot values) — pandas infers levels from the data,
    but at 100 TB an extra full pass to discover categories is the
    wrong default; production keeps a maintained vocabulary (or runs
    one distinct() when it truly is unknown). Pure map-side projection:
    zero shuffles, fully inside whole-stage codegen."""
    od = Tables(spark, sf_dir).orders
    cols = [
        F.when(F.col("o_orderpriority") == v, 1)
        .otherwise(0)
        .alias("is_" + v.split("-", 1)[1].lower().replace(" ", "_"))
        for v in _PRIORITIES
    ]
    return od.select("o_orderkey", *cols)


@query(
    "fn_bin_cut",
    oracle="""
    SELECT CAST(least(9, greatest(0,
             floor((l_extendedprice - 900.0) / 9510.0))) AS BIGINT) AS bin,
           count(*) AS n_rows,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY 1
    """,
)
def fn_bin_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas `pd.cut` equivalent: fixed-width binning into 10 buckets
    over [900, 96000), clamped at the edges, with per-bin aggregates.
    The bin id is closed-form floor arithmetic — identical IEEE ops in
    both engines, evaluated map-side during the scan (zero extra pass,
    zero shuffle beyond the 10-group agg). That is the 100 TB shape:
    histogramming is a projection, never a sort."""
    li = Tables(spark, sf_dir).lineitem
    bin_ = F.least(
        F.lit(9),
        F.greatest(
            F.lit(0), F.floor((F.col("l_extendedprice") - 900.0) / 9510.0)
        ),
    ).cast("bigint")
    return (
        li.groupBy(bin_.alias("bin"))
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


@query(
    "fn_bin_qcut",
    oracle="""
    WITH hist AS (
      SELECT l_quantity AS v, count(*) AS c FROM lineitem
      WHERE l_quantity IS NOT NULL GROUP BY l_quantity
    ),
    cdf AS (
      SELECT v, CAST(sum(c) OVER (ORDER BY v) AS DOUBLE)
                / (SELECT sum(c) FROM hist) AS frac
      FROM hist
    ),
    binmap AS (
      SELECT v, CASE WHEN frac <= 0.25 THEN 0
                     WHEN frac <= 0.50 THEN 1
                     WHEN frac <= 0.75 THEN 2
                     ELSE 3 END AS bin
      FROM cdf
    )
    SELECT b.bin, count(*) AS n_rows,
           round(min(l.l_quantity), 2) AS lo,
           round(max(l.l_quantity), 2) AS hi
    FROM lineitem l JOIN binmap b ON l.l_quantity = b.v
    GROUP BY b.bin
    """,
)
def fn_bin_qcut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas `pd.qcut` equivalent (discrete form): quartile binning of
    l_quantity where every row with the same value lands in the same
    bin. The scalable exact construction: a value histogram collapses
    the 100 TB column to |distinct| rows (one shuffle), the CDF is a
    window cumsum over that TINY table, and bin assignment broadcasts
    the value->bin map back over the fact scan. No global sort, no
    single-partition window, no interpolation ambiguity — the exact
    trap an ntile()-over-everything formulation hits at scale. Integer
    counts divide in float64 identically in both engines.

    Null semantics (round-6 core-table sweep): pd.qcut assigns NaN
    observations NO bin, so NULL values are excluded from the histogram
    (otherwise the NULL group shifts every CDF fraction, differently
    per engine — Spark windows order NULLS FIRST, DuckDB NULLS LAST);
    null rows then drop out of the output via the equi-join."""
    li = Tables(spark, sf_dir).lineitem
    from pyspark.sql import Window as W

    hist = (
        li.filter(F.col("l_quantity").isNotNull())
        .groupBy(F.col("l_quantity").alias("v"))
        .agg(F.count("*").alias("c"))
    )
    total = hist.agg(F.sum("c").alias("n"))
    cdf = (
        hist.crossJoin(F.broadcast(total))
        .withColumn(
            "frac",
            F.sum("c").over(W.orderBy("v").rowsBetween(W.unboundedPreceding, 0))
            .cast("double")
            / F.col("n"),
        )
    )
    binmap = cdf.select(
        "v",
        F.when(F.col("frac") <= 0.25, 0)
        .when(F.col("frac") <= 0.50, 1)
        .when(F.col("frac") <= 0.75, 2)
        .otherwise(3)
        .alias("bin"),
    )
    return (
        li.join(F.broadcast(binmap), F.col("l_quantity") == F.col("v"))
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.min("l_quantity"), 2).alias("lo"),
            F.round(F.max("l_quantity"), 2).alias("hi"),
        )
    )


@query(
    "fn_struct",
    oracle="""
    WITH s AS (SELECT user_id,
                      CASE WHEN value IS NOT NULL
                           THEN {'v': value, 'eid': event_id} END AS st
               FROM events)
    SELECT user_id, max(st).v AS best_v, max(st).eid AS best_eid,
           count(*) AS n
    FROM s GROUP BY user_id
    """,
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct-column surface: construct (named_struct), lexicographic
    struct comparison (argmax via max-of-struct — field order (v, eid)
    makes eid the deterministic tie-break), and field access on the
    aggregated result. Both engines compare structs field-by-field in
    declaration order, so max(struct) is a cross-engine argmax idiom
    that needs no window — one hash-agg, one exchange.

    NULL discipline (round-5 null sweep): a struct with a NULL field is
    non-null, and the two engines rank null FIELDS differently inside
    the comparison — so rows with null value are excluded from the max
    by nulling the WHOLE struct (aggregate max skips null inputs in
    both engines; pandas idxmax skips NaN the same way). An all-null
    series yields best_v/best_eid NULL while n still counts its rows."""
    ev = Tables(spark, sf_dir).events
    st = F.when(
        F.col("value").isNotNull(),
        F.struct(F.col("value").alias("v"), F.col("event_id").alias("eid")),
    )
    return (
        ev.groupBy("user_id")
        .agg(F.max(st).alias("st"), F.count("*").alias("n"))
        .select(
            "user_id",
            F.col("st.v").alias("best_v"),
            F.col("st.eid").alias("best_eid"),
            "n",
        )
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT event_id,
           event_id & 255 AS lo8,
           event_id >> 4 AS hi_shift,
           xor(event_id, 170) AS xored,
           CAST(bit_count(event_id) AS INT) AS popcount
    FROM events
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise expression surface (AND/shift/XOR/popcount) — all
    whole-stage-codegen integer ops; the building blocks the hash/
    fingerprint operators (simhash, pipeline_shuffle shards) lean on."""
    ev = Tables(spark, sf_dir).events
    c = F.col("event_id")
    return ev.select(
        "event_id",
        c.bitwiseAND(F.lit(255)).alias("lo8"),
        F.shiftright(c, 4).alias("hi_shift"),
        c.bitwiseXOR(F.lit(170)).alias("xored"),
        F.bit_count(c).alias("popcount"),
    )


@query(
    "fn_try",
    oracle="""
    SELECT o_orderkey,
           TRY_CAST(o_orderpriority AS INTEGER) AS pri_int,
           TRY_CAST(CAST(o_orderkey AS VARCHAR) AS INTEGER) AS key_roundtrip,
           CASE WHEN o_custkey % 3 = 0 THEN NULL
                ELSE o_totalprice / (o_custkey % 3) END AS safe_div,
           string_split(o_orderpriority, '-')[9] AS oob_elem
    FROM orders
    """,
    tags=("scalars",),
)
def fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe expression surface: try_cast (malformed -> NULL, not a
    runtime error), try_divide (NULL on zero divisor), try_element_at
    (NULL out of bounds). At 100 TB this is operational survival: one
    malformed row must not kill a million-task job, and the NULL path
    lets bad rows be quarantined with a filter afterward. DuckDB
    mirrors with TRY_CAST, a CASE-guarded divide (its double division
    would produce inf), and native NULL-on-out-of-bounds list
    indexing. All map-side, codegen'd."""
    o = Tables(spark, sf_dir).orders
    return o.select(
        "o_orderkey",
        F.col("o_orderpriority").try_cast("int").alias("pri_int"),
        F.col("o_orderkey").cast("string").try_cast("int").alias(
            "key_roundtrip"
        ),
        F.try_divide(F.col("o_totalprice"), F.col("o_custkey") % 3).alias(
            "safe_div"
        ),
        F.try_element_at(F.split("o_orderpriority", "-"), F.lit(9)).alias(
            "oob_elem"
        ),
    )
