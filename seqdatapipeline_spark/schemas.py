"""Explicit StructType schemas for the engine's domain tables (D1-D9).

The reference has *no* declared schemas — everything is positional
text parsing (reference parserTools.py:67-91 job-form unpack,
tools.py:244-250 SAM column addressing, tools.py:19-22 SQLite DDL).
Declaring them is the single biggest fragility fix this engine makes:
Catalyst gets column-level pruning/pushdown, and malformed rows fail
loudly at read time instead of silently shifting fields.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# D1 — job form (reference parserTools.py:44-91: 8 positional header rows
# + <FastQFile> block). `fq` is a real array, replacing the reference's
# comma-joined string (parserTools.py:52 ','.join — an anti-pattern).
JOB_FORM = StructType(
    [
        StructField("contact", StringType()),
        StructField("user_name", StringType()),
        StructField("application", StringType()),
        StructField("species", StringType()),
        StructField("sample_type", StringType()),
        StructField("mates", StringType()),  # 'SE' | 'PE'
        StructField("external", StringType()),
        StructField("external_type", StringType()),
        StructField("seq_sample_id", StringType()),
        StructField("fq", ArrayType(StringType())),
    ]
)

# D2 — FASTQ read (reference tools.py:739-786: 4-line records, mate
# number encoded in the header: SRA `id.1`/`id.2`, Illumina `1:`/`2:`).
READ = StructType(
    [
        StructField("read_id", StringType(), False),
        StructField("mate", IntegerType()),
        StructField("sequence", StringType()),
        StructField("quality", StringType()),
    ]
)

# D3 — alignment record; SAM fixed columns the reference touches:
# QNAME($1), FLAG (bitfield), RNAME, POS, MAPQ, TLEN($9)
# (reference tools.py:243-250, :580-586).
ALIGNMENT = StructType(
    [
        StructField("qname", StringType(), False),
        StructField("flag", IntegerType(), False),
        StructField("rname", StringType()),
        StructField("pos", LongType()),
        StructField("mapq", IntegerType()),
        StructField("tlen", LongType()),
    ]
)

# D4 — genomic interval / annotation feature (reference
# mainScript.py:451-458: GTF feature = col 3, attributes = col 9 as a
# `key "value";` map; default attribute key `gene_id`).
FEATURE = StructType(
    [
        StructField("chrom", StringType(), False),
        StructField("feature", StringType()),
        StructField("start", LongType(), False),
        StructField("end", LongType(), False),
        StructField("strand", StringType()),
        StructField("attributes", MapType(StringType(), StringType())),
    ]
)

# D5 — coverage vector: per fixed-width genomic window
# (reference tools.py:499,530 — igvtools count -w 25 / -w 5).
COVERAGE = StructType(
    [
        StructField("chrom", StringType(), False),
        StructField("bin", LongType(), False),
        StructField("count", LongType(), False),
    ]
)

# D7 — fragment-length histogram (reference tools.py:294-311:
# TSV header `fLength freq density`, density at 6 decimals).
FRAGMENT_HIST = StructType(
    [
        StructField("fLength", LongType(), False),
        StructField("freq", LongType(), False),
        StructField("density", DoubleType(), False),
    ]
)

# D8 — job-status log (reference tools.py:19-22 SQLite DDL: one wide
# row per sample ID, one column per pipeline stage, upserted by key).
STATUS_LOG = StructType(
    [
        StructField("id", StringType(), False),
        StructField("stage", StringType(), False),
        StructField("status", StringType()),
        StructField("ts", TimestampType()),
        StructField("notes", StringType()),
    ]
)

# Multimodal payload: opaque binary + typed metadata (engine extension;
# decode/feature-extract run as Arrow-batched pandas UDFs).
MEDIA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType()),  # 'image' | 'audio' | 'video'
        StructField("payload", BinaryType()),
        StructField("meta", MapType(StringType(), StringType())),
    ]
)
