"""§2.4.G — scalar functions (string / date / math / array / map / json /
hash / cast).

ETL-layer analogs: opaque-document encode/extract (reference
src/transaction.rs:22, jsonb fields migrations/V3:41 → json_funcs),
checked casts (src/reward.rs:35-36 → cast_try_cast), txn hashes →
hash_funcs. All row-level, whole-stage-codegen'd, shuffle-free.

Cross-engine discipline: DuckDB returns BIGINT where Spark returns INT
(year, datediff, len) and DOUBLE where Spark returns LONG (ceil) — both
sides cast explicitly to the same type. concat uses '||' in the oracle
because DuckDB's concat() skips NULLs while Spark's propagates them.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..tables import Tables


@query(
    "str_funcs",
    oracle="""
    SELECT p_partkey,
           substr(p_name, 1, 4) AS name4,
           upper(p_name) AS uname,
           lower(p_brand) AS lbrand,
           trim(concat('  ', p_name, '  ')) AS trimmed,
           CAST(length(p_name) AS BIGINT) AS name_len,
           split_part(p_name, ' ', 1) AS first_word,
           lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key,
           p_brand || '/' || p_type AS brand_type,
           replace(p_name, ' ', '_') AS snake,
           reverse(p_brand) AS rbrand,
           contains(p_name, 'widget') AS has_widget
    FROM part
    """,
)
def str_funcs(spark, sf_dir):
    t = Tables(spark, sf_dir)
    return t.part.select(
        "p_partkey",
        F.substring("p_name", 1, 4).alias("name4"),
        F.upper("p_name").alias("uname"),
        F.lower("p_brand").alias("lbrand"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded_key"),
        F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake"),
        F.reverse("p_brand").alias("rbrand"),
        F.col("p_name").contains("widget").alias("has_widget"),
    )


@query(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mon,
           CAST(dayofmonth(o_orderdate) AS BIGINT) AS dom,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT)
             AS days_since_95,
           CAST(o_orderdate AS DATE) + 30 AS due_date,
           strftime(o_orderdate, '%Y-%m') AS ym
    FROM orders
    """,
)
def date_funcs(spark, sf_dir):
    t = Tables(spark, sf_dir)
    return t.orders.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mon"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("dom"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp_ntz"))
        .cast("bigint")
        .alias("days_since_95"),
        F.date_add(F.col("o_orderdate"), 30).alias("due_date"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


@query(
    "math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_discount * 100) AS disc_pct,
           abs(l_discount - 0.03) AS abs_diff,
           CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
           CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
           round(ln(l_extendedprice), 6) AS ln_price,
           round(log10(l_extendedprice), 6) AS log10_price,
           round(sqrt(l_quantity), 6) AS sqrt_qty,
           pow(l_quantity, 2) AS qty_sq,
           l_orderkey % 7 AS key_mod,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign
    FROM lineitem
    """,
)
def math_funcs(spark, sf_dir):
    t = Tables(spark, sf_dir)
    return t.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_discount") * 100).alias("disc_pct"),
        F.abs(F.col("l_discount") - 0.03).alias("abs_diff"),
        F.ceil("l_extendedprice").cast("bigint").alias("ceil_price"),
        F.floor("l_extendedprice").cast("bigint").alias("floor_price"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_price"),
        F.round(F.log10("l_extendedprice"), 6).alias("log10_price"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
    )


@query(
    "array_funcs",
    oracle="""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tokens FROM documents)
    SELECT doc_id,
           CAST(len(tokens) AS BIGINT) AS n_tokens,
           list_contains(tokens, 'spark') AS has_spark,
           tokens[1] AS first_token,
           tokens[-1] AS last_token,
           array_to_string(tokens[1:5], ',') AS head5,
           array_to_string(list_transform(tokens[1:5], x -> upper(x)), ',') AS head5_upper,
           COALESCE(array_to_string(list_filter(tokens, x -> length(x) > 5), ','), '')
             AS long_tokens,
           CAST(list_aggregate(list_transform(tokens, x -> length(x)), 'sum') AS BIGINT)
             AS total_chars,
           array_to_string(list_sort(list_distinct(tokens)), ',') AS vocab
    FROM tok
    """,
)
def array_funcs(spark, sf_dir):
    # E5 family: explode/transform/filter/aggregate — higher-order
    # functions run JVM-side (no Python), the scalable path for
    # array-typed columns (e.g. token lists, embeddings).
    t = Tables(spark, sf_dir)
    tok = t.documents.select("doc_id", F.split("text", " ").alias("tokens"))
    return tok.select(
        "doc_id",
        F.size("tokens").cast("bigint").alias("n_tokens"),
        F.array_contains("tokens", "spark").alias("has_spark"),
        F.col("tokens").getItem(0).alias("first_token"),
        F.element_at("tokens", -1).alias("last_token"),
        F.array_join(F.slice("tokens", 1, 5), ",").alias("head5"),
        F.array_join(F.transform(F.slice("tokens", 1, 5), lambda x: F.upper(x)), ",").alias(
            "head5_upper"
        ),
        F.array_join(F.filter("tokens", lambda x: F.length(x) > 5), ",").alias("long_tokens"),
        F.aggregate(
            F.transform("tokens", lambda x: F.length(x).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
        F.array_join(F.array_sort(F.array_distinct("tokens")), ",").alias("vocab"),
    )


@query(
    "map_funcs",
    oracle="""
    SELECT doc_id,
           map(['lang', 'source'], [lang, source])['lang'][1] AS lang_val,
           map(['lang', 'source'], [lang, source])['source'][1] AS source_val,
           CAST(cardinality(map(['lang', 'source'], [lang, source])) AS BIGINT) AS n_keys,
           array_to_string(map_keys(map(['lang', 'source'], [lang, source])), ',') AS keys_csv
    FROM documents
    """,
)
def map_funcs(spark, sf_dir):
    t = Tables(spark, sf_dir)
    m = F.create_map(F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source"))
    return t.documents.select(
        "doc_id",
        F.element_at(m, "lang").alias("lang_val"),
        F.element_at(m, "source").alias("source_val"),
        F.size(m).cast("bigint").alias("n_keys"),
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
    )


@query(
    "json_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract_string(props, '$.missing') AS BIGINT) AS missing_field,
           to_json(struct_pack(k := CAST(json_extract_string(props, '$.k') AS BIGINT),
                               et := event_type)) AS reencoded
    FROM events
    """,
)
def json_funcs(spark, sf_dir):
    # E10: opaque-document encode/extract (reference src/transaction.rs:22;
    # schema-on-read over the jsonb analog, SURVEY §1.3).
    t = Tables(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("bigint")
    return t.events.select(
        "event_id",
        k.alias("k"),
        F.get_json_object("props", "$.missing").cast("bigint").alias("missing_field"),
        F.to_json(F.struct(k.alias("k"), F.col("event_type").alias("et"))).alias("reencoded"),
    )


@query(
    "hash_funcs",
    oracle="""
    SELECT c_custkey,
           sha256(c_name) AS sha,
           md5(c_name) AS md5_hex,
           sha256(concat(CAST(c_custkey AS VARCHAR), '|', c_mktsegment)) AS row_fingerprint
    FROM customer
    """,
)
def hash_funcs(spark, sf_dir):
    # Txn-hash analog (reference hashes are opaque base58 strings;
    # here we produce deterministic row fingerprints for idempotence
    # checks, SURVEY §2.1 E15).
    t = Tables(spark, sf_dir)
    return t.customer.select(
        "c_custkey",
        F.sha2(F.col("c_name"), 256).alias("sha"),
        F.md5(F.col("c_name")).alias("md5_hex"),
        F.sha2(
            F.concat(F.col("c_custkey").cast("string"), F.lit("|"), F.col("c_mktsegment")), 256
        ).alias("row_fingerprint"),
    )


@query("hash_funcs_xxhash64")  # rows-only: xxhash64 seed/impl is engine-specific
def hash_funcs_xxhash64(spark, sf_dir):
    t = Tables(spark, sf_dir)
    return t.customer.select(
        "c_custkey", F.xxhash64("c_name").alias("xxh"), F.crc32(F.col("c_name")).alias("crc")
    )


@query(
    "cast_try_cast",
    oracle="""
    SELECT o_orderkey,
           CAST(floor(o_totalprice) AS BIGINT) AS price_long,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           TRY_CAST(o_orderpriority AS BIGINT) AS bad_cast,
           TRY_CAST(split_part(o_orderpriority, '-', 1) AS BIGINT) AS priority_num,
           CAST(o_totalprice AS FLOAT) AS price_float
    FROM orders
    """,
)
def cast_try_cast(spark, sf_dir):
    # E8/E9: checked numeric casts and validating string casts
    # (reference src/reward.rs:35-36, src/transaction.rs:9). try_cast
    # yields NULL on failure (the Spark-native form of reject-and-flag).
    t = Tables(spark, sf_dir)
    return t.orders.select(
        "o_orderkey",
        # DuckDB's double→bigint cast rounds while Spark's truncates;
        # floor() on both sides pins the semantics.
        F.floor("o_totalprice").cast("bigint").alias("price_long"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderpriority").try_cast("bigint").alias("bad_cast"),
        F.split("o_orderpriority", "-").getItem(0).try_cast("bigint").alias("priority_num"),
        F.col("o_totalprice").cast("float").alias("price_float"),
    )
