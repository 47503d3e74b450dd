"""Scalar-function registry (SURVEY.md §2.8) — each op exercised on
the synthetic tables with a DuckDB oracle. Importing this module
populates registry.QUERIES / registry.ORACLES.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ops import strings as st
from .registry import _t, q


@q(
    "strip_fastq_suffix",
    """
    SELECT doc_id, source || '.fastq.gz' AS fname,
           regexp_replace(source || '.fastq.gz', '\\.f(ast)?q(\\.tar)?(\\.gz)?$', '') AS sample_key
    FROM documents
    """,
)
def q_strip_fastq_suffix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fastq-suffix strip (reference mainScript.py:235)."""
    d = _t(spark, sf_dir, "documents")
    fname = F.concat(F.col("source"), F.lit(".fastq.gz"))
    return d.select(
        "doc_id", fname.alias("fname"), st.strip_fastq_suffix(fname).alias("sample_key")
    )


@q(
    "common_prefix_pair_key",
    """
    WITH pairs AS (
      SELECT doc_id, source || '_' || lang || '_R1.fq' AS a, source || '_' || lang || '_R2.fq' AS b
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             substr(a, 1, CAST(len(list_filter(range(1, least(length(a), length(b)) + 1),
                                    i -> substr(a, 1, CAST(i AS INT)) = substr(b, 1, CAST(i AS INT)))) AS INT)),
             '_R$', '_paired') AS pair_key
    FROM pairs
    """,
)
def q_common_prefix_pair_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PE pair key: longest common block of the two mate names, then
    `_R$` → `_paired` (reference mainScript.py:241-243,
    difflib.SequenceMatcher first block ≡ common prefix for mate
    filenames). Higher-order functions, no UDF."""
    d = _t(spark, sf_dir, "documents")
    a = F.concat(F.col("source"), F.lit("_"), F.col("lang"), F.lit("_R1.fq"))
    b = F.concat(F.col("source"), F.lit("_"), F.col("lang"), F.lit("_R2.fq"))
    return d.select("doc_id", st.pair_key(a, b).alias("pair_key"))


@q(
    "xml_tag_extract",
    """
    SELECT event_id, regexp_extract(props, '"k": (-?\\d+)', 1) AS k_str
    FROM events
    """,
)
def q_xml_tag_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex field extraction from semi-structured text (reference
    parserTools.py:44 re.findall('<FastQFile>(.*?)</FastQFile>'));
    same machinery over the events.props payload."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id", F.regexp_extract(F.col("props"), r'"k": (-?\d+)', 1).alias("k_str")
    )


@q(
    "username_from_email",
    """
    SELECT c_custkey, string_split(lower(replace(c_name, '#', '.')) || '@lab.org', '@')[1] AS username
    FROM customer
    """,
)
def q_username_from_email(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local part of a contact address (reference parserTools.py:71)."""
    c = _t(spark, sf_dir, "customer")
    email = F.concat(F.lower(F.regexp_replace("c_name", "#", ".")), F.lit("@lab.org"))
    return c.select("c_custkey", st.username_from_email(email).alias("username"))


@q(
    "basename",
    """
    SELECT doc_id, string_split('data/' || source || '/' || CAST(doc_id AS VARCHAR) || '.fq.gz', '/')[-1] AS base
    FROM documents
    """,
)
def q_basename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last path component (reference parserTools.py:51, tools.py:428)."""
    d = _t(spark, sf_dir, "documents")
    path = F.concat(
        F.lit("data/"), F.col("source"), F.lit("/"), F.col("doc_id").cast("string"), F.lit(".fq.gz")
    )
    return d.select("doc_id", st.basename(path).alias("base"))


@q(
    "csv_join_split",
    """
    SELECT doc_id,
           array_to_string(string_split(text, ' '), ',') AS fq_csv,
           CAST(len(string_split(array_to_string(string_split(text, ' '), ','), ',')) AS BIGINT) AS n_roundtrip
    FROM documents
    """,
)
def q_csv_join_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comma join + split round-trip (reference parserTools.py:52,
    pipelineParser.py:117 — the engine keeps ArrayType internally)."""
    d = _t(spark, sf_dir, "documents")
    joined = st.csv_join(F.split(F.col("text"), " "))
    return d.select(
        "doc_id",
        joined.alias("fq_csv"),
        F.size(st.csv_split(joined)).cast("long").alias("n_roundtrip"),
    )


@q(
    "key_concat",
    """
    SELECT o_orderkey,
           trim(concat_ws('_', upper(o_orderstatus), lower(replace(o_orderpriority, '/', '_')),
                          CAST(o_custkey AS VARCHAR)), '_') AS route_key
    FROM orders
    """,
)
def q_key_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite routing key build (reference pipelineParser.py:94-100:
    '_'.join + upper/lower + '/'→'_' + strip('_'))."""
    o = _t(spark, sf_dir, "orders")
    key = st.key_concat(
        F.upper(F.col("o_orderstatus")),
        F.lower(F.col("o_orderpriority")),
        F.col("o_custkey").cast("string"),
    )
    return o.select("o_orderkey", key.alias("route_key"))


@q(
    "mate_number_parse",
    """
    SELECT event_id,
           CAST(string_split('read' || CAST(event_id AS VARCHAR) || '.' || CAST(1 + event_id % 2 AS VARCHAR), '.')[-1] AS INT) AS mate
    FROM events
    """,
)
def q_mate_number_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRA mate-number parse: suffix after the last '.' (reference
    tools.py:754-755; Illumina variant tools.py:770-771)."""
    e = _t(spark, sf_dir, "events")
    rid = F.concat(
        F.lit("read"), F.col("event_id").cast("string"), F.lit("."),
        (F.lit(1) + F.col("event_id") % 2).cast("string"),
    )
    return e.select("event_id", st.mate_number_sra(rid).alias("mate"))


@q(
    "abs_int_cast",
    """
    SELECT event_id, CAST(trunc(value - 150) AS BIGINT) AS tlen_int,
           abs(CAST(trunc(value - 150) AS BIGINT)) AS abs_tlen
    FROM events
    """,
)
def q_abs_int_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs(int(x)) with truncation toward zero (reference
    tools.py:295-296)."""
    e = _t(spark, sf_dir, "events")
    shifted = F.col("value") - 150
    return e.select(
        "event_id",
        shifted.cast("long").alias("tlen_int"),
        st.abs_int(shifted).alias("abs_tlen"),
    )


@q(
    "format_fixed6",
    """
    SELECT event_id, printf('%.6f', value / 3.0) AS fixed6 FROM events
    """,
)
def q_format_fixed6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-decimal fixed formatting (reference tools.py:309
    '{0:.6f}'.format — format_string, not format_number, so no
    thousands separators)."""
    e = _t(spark, sf_dir, "events")
    return e.select("event_id", st.format_fixed6(F.col("value") / 3.0).alias("fixed6"))


@q(
    "date_stamp",
    """
    SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
           strftime(o_orderdate, '%d-%b-%Y') AS dmy
    FROM orders
    """,
)
def q_date_stamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date stamps (reference scanner.sh:8 `date +%Y-%m-%d`;
    pipelineParser.py:27 strftime('%d-%b-%Y'))."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        st.date_stamp_iso(F.col("o_orderdate")).alias("iso_day"),
        st.date_stamp_dmy(F.col("o_orderdate")).alias("dmy"),
    )


@q(
    "elapsed_hours",
    """
    SELECT user_id, round(date_diff('second', min(ts), max(ts)) / 3600.0, 2) AS hours
    FROM events GROUP BY user_id
    """,
)
def q_elapsed_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Elapsed wall-time in hours (reference mainScript.py:366-369
    round((t2-t1)/3600, 2))."""
    e = _t(spark, sf_dir, "events")
    spans = e.groupBy("user_id").agg(F.min("ts").alias("t1"), F.max("ts").alias("t2"))
    return spans.select("user_id", st.elapsed_hours(F.col("t1"), F.col("t2")).alias("hours"))


@q(
    "octal_mode_parse",
    """
    WITH msgs AS (
      SELECT event_id, 'expected mode ' || CAST(7 - event_id % 2 AS VARCHAR) ||
             CAST(7 - event_id % 3 AS VARCHAR) || CAST(5 AS VARCHAR) AS msg
      FROM events
    )
    SELECT event_id,
           CAST(substr(regexp_extract(msg, '(\\d+)', 1), 1, 1) AS BIGINT) * 64 +
           CAST(substr(regexp_extract(msg, '(\\d+)', 1), 2, 1) AS BIGINT) * 8 +
           CAST(substr(regexp_extract(msg, '(\\d+)', 1), 3, 1) AS BIGINT) AS mode_dec
    FROM msgs
    """,
)
def q_octal_mode_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Octal mode string → decimal (reference tools.py:838-840:
    regex-extract 'expected mode \\d*' from an OSError, int(m, 8))."""
    e = _t(spark, sf_dir, "events")
    msg = F.concat(
        F.lit("expected mode "),
        (7 - F.col("event_id") % 2).cast("string"),
        (7 - F.col("event_id") % 3).cast("string"),
        F.lit("5"),
    )
    return e.select("event_id", st.octal_mode_parse(msg).alias("mode_dec"))


@q(
    "chr_decode",
    """
    SELECT doc_id,
           array_to_string(list_transform([CAST(65 + doc_id % 26 AS INT), CAST(97 + doc_id % 26 AS INT)], i -> chr(i)), '') AS decoded
    FROM documents
    """,
)
def q_chr_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int list → string via chr() (reference parserTools.py:377-384)."""
    d = _t(spark, sf_dir, "documents")
    ints = F.array(
        (65 + F.col("doc_id") % 26).cast("int"), (97 + F.col("doc_id") % 26).cast("int")
    )
    return d.select("doc_id", st.chr_decode(ints).alias("decoded"))


@q(
    "reversed_join",
    """
    SELECT c_custkey, array_to_string(list_reverse([c_name, c_mktsegment]), ' ') AS first_last
    FROM customer
    """,
)
def q_reversed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """' '.join(reversed(parts)) (reference pipelineParser.py:87-88)."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        st.reversed_join(F.array(F.col("c_name"), F.col("c_mktsegment"))).alias("first_last"),
    )


@q(
    "sci_notation_num",
    """
    SELECT event_id, printf('%.2fe+9', value) AS genome_size_str,
           CAST(printf('%.2fe+9', value) AS DOUBLE) AS genome_size
    FROM events
    """,
)
def q_sci_notation_num(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scientific-notation genome sizes → numeric (reference
    mainChIP.py:150-151, '2.7e+9' strings). %.2f: the synthetic values
    carry exactly two decimals, so no half-way rounding divergence
    between Java and C formatting can occur."""
    e = _t(spark, sf_dir, "events")
    # format_string renders a NULL argument as the literal text "nu"
    # inside the output ("nue+9") instead of propagating NULL the way
    # DuckDB's printf does — gate it explicitly so both engines emit
    # NULL rows for NULL values.
    s = F.when(
        F.col("value").isNotNull(), F.format_string("%.2fe+9", F.col("value"))
    )
    return e.select(
        "event_id", s.alias("genome_size_str"), st.sci_notation_num(s).alias("genome_size")
    )
