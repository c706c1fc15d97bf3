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
    # ONE spark.sql() call (r10-opt, catalog.Tables.sql_views).
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT c_custkey,
           upper(c_name) AS name_up,
           lower(c_mktsegment) AS seg_lo,
           substring(c_name, 1, 9) AS name_pfx,
           concat_ws('-', c_mktsegment, c_name) AS seg_name,
           length(c_name) AS name_len,
           replace(c_name, 'Customer#', 'C') AS name_short,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           (c_name LIKE 'Customer#%') AS is_cust,
           regexp_replace(c_mktsegment, '[AEIOU]', '_') AS seg_mask,
           trim(concat('  ', c_mktsegment, ' ')) AS seg_trim
    FROM {v}customer
    """)


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
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT o_orderkey,
           year(o_orderdate) AS y,
           month(o_orderdate) AS m,
           day(o_orderdate) AS d,
           quarter(o_orderdate) AS q,
           dayofweek(o_orderdate) AS dow_sun1,
           weekofyear(o_orderdate) AS iso_week,
           date_trunc('month', o_orderdate) AS month_start,
           o_orderdate + INTERVAL 30 DAY AS due_ts,
           datediff(CAST('2000-01-01' AS DATE), CAST(o_orderdate AS DATE))
               AS days_to_y2k,
           date_format(o_orderdate, 'yyyy-MM') AS ym,
           unix_millis(CAST(o_orderdate AS TIMESTAMP)) AS epoch_millis
    FROM {v}orders
    """)


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
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 30000) AS abs_dev,
           ceil(l_extendedprice) AS price_ceil,
           floor(l_extendedprice) AS price_floor,
           round(ln(l_extendedprice), 6) AS ln_price,
           round(log10(l_extendedprice), 6) AS log10_price,
           round(exp(l_discount), 6) AS exp_disc,
           power(l_quantity, 2) AS qty_sq,
           round(sqrt(l_quantity), 6) AS qty_sqrt,
           signum(l_discount - 0.05D) AS disc_side,
           l_orderkey % 7 AS mod7
    FROM {v}lineitem
    """)


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
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT s_suppkey,
           CASE WHEN s_acctbal < 0 THEN 'neg'
                WHEN s_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS bal_band,
           greatest(s_acctbal, 1000.0D) AS floor_1k,
           least(s_acctbal, 5000.0D) AS cap_5k,
           least(greatest(s_acctbal, 0.0D), 8000.0D) AS clipped,
           coalesce(nullif(s_name, ''), 'unknown') AS name_filled,
           (s_acctbal IS NOT NULL AND s_acctbal > 0) AS in_credit
    FROM {v}supplier
    """)


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
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT l_orderkey,
           CAST(floor(l_quantity) AS BIGINT) AS qty_int,
           CAST(l_linenumber AS STRING) AS line_str,
           CAST(l_linenumber AS DOUBLE) AS line_dbl,
           CAST(substring(c_name, 10, 9) AS BIGINT) AS cust_num
    FROM {v}lineitem
    JOIN {v}orders ON l_orderkey = o_orderkey
    JOIN {v}customer ON o_custkey = c_custkey
    """)


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
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT vec_id,
           CASE WHEN embedding IS NOT NULL THEN size(embedding) END AS dim,
           try_element_at(embedding, 1) AS e0,
           try_element_at(embedding, 64) AS e_last,
           try_element_at(array_sort(slice(embedding, 1, 3)), 1) AS s3_a,
           try_element_at(array_sort(slice(embedding, 1, 3)), 2) AS s3_b,
           try_element_at(array_sort(slice(embedding, 1, 3)), 3) AS s3_c,
           array_contains(array(label), label) AS self_contains
    FROM {v}embeddings
    """)


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
    v = Tables(spark, sf_dir).sql_views()
    seq = "sequence(1, p_size)"
    return spark.sql(f"""
    SELECT p_partkey,
           CAST(aggregate(transform({seq}, x -> x * x), 0,
                          (a, x) -> a + x) AS BIGINT) AS sq_sum,
           array_join(filter({seq}, x -> x % 2 = 0), ',') AS evens,
           CASE WHEN p_size IS NOT NULL
                THEN CAST(size({seq}) AS BIGINT) END AS n_terms
    FROM {v}part
    """)


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
    v = Tables(spark, sf_dir).sql_views()
    m = ("map('k', try_cast(get_json_object(props, '$.k') AS DOUBLE),"
         " 'v', value)")
    return spark.sql(f"""
    SELECT event_id,
           element_at({m}, 'k') AS k_val,
           element_at({m}, 'v') AS v_val,
           size({m}) AS m_size,
           array_join(map_keys({m}), ',') AS keys
    FROM {v}events
    """)


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
    v = Tables(spark, sf_dir).sql_views()
    k_num = "try_cast(get_json_object(props, '$.k') AS BIGINT)"
    return spark.sql(f"""
    SELECT event_id,
           {k_num} AS k_num,
           get_json_object(props, '$.k') AS k_str,
           to_json(named_struct('event_id', event_id, 'k', {k_num}),
                   map('ignoreNullFields', 'false')) AS packed
    FROM {v}events
    """)


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
    v = Tables(spark, sf_dir).sql_views()
    cols = ",\n           ".join(
        f"CASE WHEN o_orderpriority = '{p}' THEN 1 ELSE 0 END AS "
        + "is_" + p.split("-", 1)[1].lower().replace(" ", "_")
        for p in _PRIORITIES
    )
    return spark.sql(
        f"SELECT o_orderkey,\n           {cols}\n    FROM {v}orders"
    )


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
    v = Tables(spark, sf_dir).sql_views()
    bin_ = ("CAST(least(9, greatest(0,"
            " floor((l_extendedprice - 900.0D) / 9510.0D))) AS BIGINT)")
    return spark.sql(f"""
    SELECT {bin_} AS bin, count(*) AS n_rows,
           round(sum(l_quantity), 2) AS sum_qty
    FROM {v}lineitem
    GROUP BY {bin_}
    """)


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
    # ONE spark.sql() call (r10-opt): same histogram -> CDF -> binmap
    # broadcast chain (hints carry the two broadcasts).
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    WITH hist AS (
      SELECT l_quantity AS v, count(*) AS c FROM {v}lineitem
      WHERE l_quantity IS NOT NULL GROUP BY l_quantity
    ),
    total AS (SELECT sum(c) AS n FROM hist),
    cdf AS (
      SELECT /*+ BROADCAST(total) */ v,
             CAST(sum(c) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE) / n AS frac
      FROM hist CROSS JOIN total
    ),
    binmap AS (
      SELECT v, CASE WHEN frac <= 0.25D THEN 0
                     WHEN frac <= 0.50D THEN 1
                     WHEN frac <= 0.75D THEN 2
                     ELSE 3 END AS bin
      FROM cdf
    )
    SELECT /*+ BROADCAST(b) */ b.bin, count(*) AS n_rows,
           round(min(l.l_quantity), 2) AS lo,
           round(max(l.l_quantity), 2) AS hi
    FROM {v}lineitem l JOIN binmap b ON l.l_quantity = b.v
    GROUP BY b.bin
    """)


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
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    WITH a AS (
      SELECT user_id,
             max(CASE WHEN value IS NOT NULL
                      THEN named_struct('v', value, 'eid', event_id)
                 END) AS st,
             count(*) AS n
      FROM {v}events GROUP BY user_id
    )
    SELECT user_id, st.v AS best_v, st.eid AS best_eid, n FROM a
    """)


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
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT event_id,
           event_id & 255 AS lo8,
           shiftright(event_id, 4) AS hi_shift,
           event_id ^ 170 AS xored,
           bit_count(event_id) AS popcount
    FROM {v}events
    """)


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
    v = Tables(spark, sf_dir).sql_views()
    return spark.sql(f"""
    SELECT o_orderkey,
           try_cast(o_orderpriority AS INT) AS pri_int,
           try_cast(CAST(o_orderkey AS STRING) AS INT) AS key_roundtrip,
           try_divide(o_totalprice, o_custkey % 3) AS safe_div,
           try_element_at(split(o_orderpriority, '-'), 9) AS oob_elem
    FROM {v}orders
    """)
