"""Gate queries: string/regex/math/encoding/cast scalar builtins
(SURVEY.md §2.9) applied element-wise over driver tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jetro_spark.functions import strings as S
from jetro_spark.functions.core import jt_div, jt_fuzzy_match
from jetro_spark.session import fan_out, load_tables


def q_string_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir, register=False)["customer"]
    name = F.col("c_name")
    return c.select(
        "c_custkey",
        S.upper(name).alias("up"),
        S.lower(name).alias("lo"),
        S.reverse_str(name).alias("rev"),
        S.capitalize(S.lower(name)).alias("cap"),
        F.length(name).alias("len"),
    )


def q_string_pad_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir, register=False)["customer"]
    name = F.col("c_name")
    return c.select(
        "c_custkey",
        S.pad_left(name, 25, "*").alias("padl"),
        S.pad_right(name, 25, "-").alias("padr"),
        S.str_slice(name, 0, 8).alias("head8"),
        S.str_slice(name, -3, None).alias("tail3"),
        S.repeat(S.str_slice(name, 0, 2), 3).alias("rep"),
    )


def q_string_affix(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir, register=False)["customer"]
    name = F.col("c_name")
    return c.select(
        "c_custkey",
        S.starts_with(name, "Customer#0000001").alias("sw"),
        S.ends_with(name, "5").alias("ew"),
        S.strip_prefix(name, "Customer#").alias("noprefix"),
        S.index_of(name, "#").alias("hash_at"),
        S.matches(name, "999").alias("has999"),
        jt_fuzzy_match(name, F.lit("CUSTOMER")).alias("fuzzy"),
    )


def q_string_split_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_tables(spark, sf_dir, register=False)["part"]
    t = F.col("p_type")
    return p.select(
        "p_partkey",
        F.size(S.split(t, " ")).alias("n_words"),
        F.element_at(S.split(t, " "), 1).alias("first_word"),
        S.replace_all(t, " ", "_").alias("snaked"),
        S.join(S.split(t, " "), "|").alias("joined"),
    )


def q_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    # four regex passes per row dominate — fan the unsplittable scan
    # (session.fan_out, guide §2.5)
    d = fan_out(load_tables(spark, sf_dir, register=False)["documents"])
    txt = F.col("text")
    return d.select(
        "doc_id",
        S.re_match(txt, r"[0-9]{3}").alias("has_3digits"),
        F.size(S.re_match_all(txt, r"\bthe\b")).alias("n_the"),
        F.coalesce(S.re_captures(txt, r"(\w+)\s", 1), F.lit("")).alias("first_word"),
        S.re_replace_all(txt, r"\s+", " ").alias("normalized_ws"),
    )


def q_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, register=False)["lineitem"]
    x = F.col("l_extendedprice") * F.col("l_discount") - F.lit(100.0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        S.ceil(x).alias("c"),
        S.floor(x).alias("f"),
        # round exercised on exact .5 halves (qty/2) — both engines round
        # half away from zero and the input is binary-exact
        S.round_(jt_div(F.col("l_quantity"), F.lit(2)), 0).alias("r"),
        S.abs_(x).alias("a"),
        jt_div(F.col("l_extendedprice"), F.col("l_quantity")).alias("unit_price"),
    )


def q_parse_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir, register=False)["customer"]
    digits = F.regexp_extract(F.col("c_name"), r"(\d+)", 1)
    return c.select(
        "c_custkey",
        S.parse_int(digits).alias("as_int"),
        S.parse_float(digits).alias("as_float"),
        S.to_string(F.col("c_acctbal")).alias("bal_str"),
        S.is_numeric(digits).alias("is_num"),
        S.is_alpha(F.col("c_mktsegment")).alias("is_alpha"),
    )


def q_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_tables(spark, sf_dir, register=False)["region"]
    name = F.col("r_name")
    return r.select(
        "r_regionkey",
        S.to_base64(name).alias("b64"),
        S.from_base64(S.to_base64(name)).alias("roundtrip"),
        S.lower(F.hex(name.cast("binary"))).alias("hexed"),
    )


QUERIES = {
    "string_case": q_string_case,
    "string_pad_slice": q_string_pad_slice,
    "string_affix": q_string_affix,
    "string_split_replace": q_string_split_replace,
    "regex_ops": q_regex,
    "math_ops": q_math,
    "parse_cast": q_parse_cast,
    "encoding": q_encoding,
}

ORACLES = {
    "string_case": """
        SELECT c_custkey, upper(c_name) AS up, lower(c_name) AS lo,
               reverse(c_name) AS rev,
               upper(substr(lower(c_name), 1, 1)) || substr(lower(c_name), 2) AS cap,
               CAST(length(c_name) AS INTEGER) AS len
        FROM customer
    """,
    "string_pad_slice": """
        SELECT c_custkey,
               CASE WHEN length(c_name) >= 25 THEN c_name
                    ELSE lpad(c_name, 25, '*') END AS padl,
               CASE WHEN length(c_name) >= 25 THEN c_name
                    ELSE rpad(c_name, 25, '-') END AS padr,
               substr(c_name, 1, 8) AS head8,
               substr(c_name, length(c_name) - 2) AS tail3,
               repeat(substr(c_name, 1, 2), 3) AS rep
        FROM customer
    """,
    "string_affix": """
        SELECT c_custkey,
               starts_with(c_name, 'Customer#0000001') AS sw,
               ends_with(c_name, '5') AS ew,
               CASE WHEN starts_with(c_name, 'Customer#')
                    THEN substr(c_name, length('Customer#') + 1)
                    ELSE c_name END AS noprefix,
               CAST(strpos(c_name, '#') - 1 AS BIGINT) AS hash_at,
               contains(c_name, '999') AS has999,
               contains(lower(c_name), lower('CUSTOMER')) AS fuzzy
        FROM customer
    """,
    "string_split_replace": """
        SELECT p_partkey,
               CAST(len(string_split(p_type, ' ')) AS INTEGER) AS n_words,
               string_split(p_type, ' ')[1] AS first_word,
               replace(p_type, ' ', '_') AS snaked,
               array_to_string(string_split(p_type, ' '), '|') AS joined
        FROM part
    """,
    "regex_ops": """
        SELECT doc_id,
               regexp_matches(text, '[0-9]{3}') AS has_3digits,
               CAST(len(regexp_extract_all(text, '\\bthe\\b')) AS INTEGER) AS n_the,
               coalesce(nullif(regexp_extract(text, '(\\w+)\\s', 1), ''), '') AS first_word,
               regexp_replace(text, '\\s+', ' ', 'g') AS normalized_ws
        FROM documents
    """,
    "math_ops": """
        SELECT l_orderkey, l_linenumber,
               CAST(ceil(l_extendedprice * l_discount - 100.0) AS BIGINT) AS c,
               CAST(floor(l_extendedprice * l_discount - 100.0) AS BIGINT) AS f,
               round(l_quantity / 2, 0) AS r,
               abs(l_extendedprice * l_discount - 100.0) AS a,
               l_extendedprice / l_quantity AS unit_price
        FROM lineitem
    """,
    "parse_cast": """
        SELECT c_custkey,
               TRY_CAST(regexp_extract(c_name, '(\\d+)', 1) AS BIGINT) AS as_int,
               TRY_CAST(regexp_extract(c_name, '(\\d+)', 1) AS DOUBLE) AS as_float,
               CAST(c_acctbal AS VARCHAR) AS bal_str,
               regexp_matches(regexp_extract(c_name, '(\\d+)', 1), '^[0-9]+$') AS is_num,
               regexp_matches(c_mktsegment, '^[A-Za-z]+$') AS is_alpha
        FROM customer
    """,
    "encoding": """
        SELECT r_regionkey,
               to_base64(encode(r_name)) AS b64,
               decode(from_base64(to_base64(encode(r_name)))) AS roundtrip,
               lower(hex(encode(r_name))) AS hexed
        FROM region
    """,
}
