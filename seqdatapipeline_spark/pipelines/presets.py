"""The reference's three end-to-end pipelines as composed stage lists
(reference mainScript.py = RNA-seq, mainChIP.py = ChIP-seq,
mainATAC.py = ATAC-seq — each a fixed sequence of filter / dedup /
aggregate steps the worker loop runs per sample, tools.py:910-930).

Each preset is a list of `dag.Stage`s over the driver's star-schema
analogs (lineitem as alignments, events as genome positions — the
same column mapping every §2 registry query uses). Run them two ways:

- `compose(source, stages)` — fold the stage functions into ONE lazy
  DataFrame: Catalyst fuses the whole pipeline into a single physical
  plan (filters push into the scan, dedup and count collapse into two
  exchanges), which is how production batches should run — no
  per-stage materialization.
- `dag.run_pipeline(spark, source, stages, ...)` — the operational
  form: per-stage status rows, short-circuit on failure/empty, status
  sink — the reference's worker-loop behavior.

The presets are deliberately thin: every step is an `ops.*` function
already proven by its own oracle; composing them adds no new
semantics, just the reference's stage ORDER.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ops import aggregates as agg
from ..ops import filters as flt
from ..ops import windows as win
from .dag import Stage


def compose(source: DataFrame, stages: list[Stage]) -> DataFrame:
    """Fold stages into one lazy plan (no per-stage actions)."""
    df = source
    for st in stages:
        df = st.fn(df)
    return df


def rna_stages(
    chrom_col: str = "l_returnflag",
    chrm: str = "R",
    gene_col: str = "l_partkey",
    pre_partitioned: bool = False,
) -> list[Stage]:
    """RNA-seq quantification (reference mainScript.py:230-260):
    exclude chrM, collapse PCR duplicates (keep first by position),
    count reads per gene — the htseq-count tail (tools.py:625-674).
    ``pre_partitioned``: the source is already clustered on
    l_orderkey (a curated bucketed copy) — the chrM filter preserves
    that clustering, so the dedup stage must not repartition."""
    return [
        Stage("filter_chrm", lambda df: flt.filter_not_chrm(df, chrom_col, chrm)),
        Stage(
            "dedup",
            lambda df: agg.dedup_keep_first(
                df,
                keys=["l_orderkey", gene_col],
                order=["l_linenumber", "l_quantity"],
                pre_partitioned=pre_partitioned,
            ),
        ),
        Stage(
            "count_genes",
            lambda df: df.groupBy(F.col(gene_col).alias("gene_id")).agg(
                F.count(F.lit(1)).alias("n")
            ),
        ),
    ]


def chip_stages(
    chrom_col: str = "event_type",
    pos_col: str = "value",
    id_col: str = "event_id",
    w: int = 5,
    min_count: int = 3,
    gap: int = 2,
) -> list[Stage]:
    """ChIP-seq peak calling (reference mainChIP.py:330-390): remove
    PCR duplicates (one read per exact position), pile up into
    fixed-width bins, threshold enriched bins, merge within-gap bins
    into peaks (macs2 island semantics, tools.py:555-622)."""
    return [
        Stage(
            "dedup_positions",
            lambda df: agg.dedup_keep_first(
                df.select(
                    F.col(chrom_col).alias("chrom"),
                    F.col(pos_col).alias("pos"),
                    F.col(id_col).alias("rid"),
                ),
                keys=["chrom", "pos"],
                order=["rid"],
            ),
        ),
        Stage("coverage", lambda df: agg.coverage_bin_count(df, "chrom", "pos", w)),
        Stage("threshold", lambda df: df.filter(F.col("count") >= min_count)),
        Stage(
            "islands",
            lambda df: win.gaps_and_islands(df, "chrom", "bin", gap=gap)
            .groupBy("chrom", "island")
            .agg(
                F.min("bin").alias("start_bin"),
                F.max("bin").alias("end_bin"),
                F.sum("count").alias("pileup"),
            ),
        ),
    ]


def atac_stages(
    chrom_col: str = "event_type",
    pos_col: str = "value",
    id_col: str = "event_id",
    hi: int = 100,
    w: int = 25,
) -> list[Stage]:
    """ATAC-seq accessibility track (reference mainATAC.py:300-360):
    keep nucleosome-free fragments (TLEN band, tools.py:244-245),
    collapse duplicate positions, emit the binned coverage track."""
    return [
        Stage(
            "tlen_band",
            lambda df: df.filter((F.col(pos_col) > -hi) & (F.col(pos_col) < hi)),
        ),
        Stage(
            "dedup_positions",
            lambda df: agg.dedup_keep_first(
                df.select(
                    F.col(chrom_col).alias("chrom"),
                    F.col(pos_col).alias("pos"),
                    F.col(id_col).alias("rid"),
                ),
                keys=["chrom", "pos"],
                order=["rid"],
            ),
        ),
        Stage("coverage", lambda df: agg.coverage_bin_count(df, "chrom", "pos", w)),
    ]
