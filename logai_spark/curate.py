"""End-to-end corpus curation pipeline: dedup -> filter -> scrub -> pack.

Ties the training-data operators into one shippable spark-submit job (the
corpus dual of pipeline.py's parse->route->aggregate): exact dedup, optional
MinHash-LSH near-dup cluster resolution, Gopher repetition filter,
per-language quality cut, PII scrub, and token-budget sequence packing, with
a manifest of per-stage row counts so every drop is accounted for.

Scale shape per stage (each documented at its operator):
  exact dedup       one shuffle on text hash + semi-join back
  near-dup          banded LSH equi-join + connected components (no cartesian)
  repetition filter row-local, zero shuffle
  quality cut       per-lang quantile partial agg + broadcast filter
  PII scrub         row-local regexp codegen
  packing           per-source applyInPandas over (id, size) only

Determinism: every stage is a deterministic function of the input table, so
re-running into the same output reproduces byte-identical parquet (modulo
file count) and an identical manifest.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logai_spark.functions.textops import (
    exact_dedup,
    pii_redact,
    quality_floor,
    repetition_stats,
)
from logai_spark.operators.features import pack_sequences


@dataclass(frozen=True)
class CurationConfig:
    keep_frac: float = 0.5          # per-language quality quantile kept
    max_top_bigram_frac: float = 0.5  # Gopher-style repetition ceiling
    pack_budget: int = 2048         # tokens per packed training sequence
    near_dup: bool = False          # MinHash-LSH near-dup cluster removal
    minhash_k: int = 16
    lsh_bands: int = 4
    id_col: str = "doc_id"
    text_col: str = "text"
    lang_col: str = "lang"
    source_col: str = "source"


def run_curation(
    spark: SparkSession,
    docs: DataFrame,
    output: str,
    cfg: CurationConfig = CurationConfig(),
) -> dict:
    """Run the curation pipeline over a documents table
    (id, text, lang, source). Writes ``curated/`` parquet and
    ``_curation_manifest.json`` under ``output``; returns the manifest."""
    c = cfg
    counts: dict[str, int] = {"input": docs.count()}

    # 1. exact dedup: keeper = min id per identical text
    keepers = exact_dedup(docs, [c.text_col], id_col=c.id_col).select(
        F.col("keeper_id").alias(c.id_col)
    )
    cur = docs.join(keepers, c.id_col, "left_semi")
    counts["after_exact_dedup"] = cur.count()

    # 2. optional near-dup cluster resolution (canonical = min id per cluster)
    if c.near_dup:
        from logai_spark.functions.components import dup_clusters

        clusters = dup_clusters(
            cur,
            id_col=c.id_col,
            text_col=c.text_col,
            bands=c.lsh_bands,
            rows_per_band=max(1, c.minhash_k // c.lsh_bands),
        )
        canonical = clusters.filter(
            F.col(c.id_col) == F.col("cluster_id")
        ).select(c.id_col)
        cur = cur.join(canonical, c.id_col, "left_semi")
        counts["after_near_dup"] = cur.count()

    # 3. repetition ceiling (row-local)
    rep = repetition_stats(cur, text_col=c.text_col, id_col=c.id_col).select(
        c.id_col, "top_bigram_frac"
    )
    cur = (
        cur.join(rep, c.id_col)
        .filter(F.col("top_bigram_frac") <= c.max_top_bigram_frac)
        .drop("top_bigram_frac")
    )
    counts["after_repetition_filter"] = cur.count()

    # 4. per-language quality cut (broadcast quantile thresholds)
    kept = quality_floor(
        cur, keep_frac=c.keep_frac, lang_col=c.lang_col,
        text_col=c.text_col, id_col=c.id_col,
    ).select(c.id_col, "quality")
    cur = cur.join(kept, c.id_col)
    counts["after_quality_floor"] = cur.count()

    # 5. PII scrub (row-local) — redacted text replaces the original
    cur = (
        pii_redact(cur, text_col=c.text_col)
        .drop(c.text_col)
        .withColumnRenamed("redacted", c.text_col)
    )

    # 6. pack into token-budget training sequences per source shard
    sized = cur.withColumn(
        "n_tokens",
        F.size(
            F.filter(F.split(F.trim(F.col(c.text_col)), r"\s+"), lambda t: t != "")
        ).cast("long"),
    )
    packs = pack_sequences(
        sized,
        budget=c.pack_budget,
        group_cols=[c.source_col],
        order_cols=[c.id_col],
        size_col="n_tokens",
    ).select(c.id_col, "pack_id")
    final = sized.join(packs, c.id_col)

    out_dir = os.path.join(output, "curated")
    final.write.mode("overwrite").parquet(out_dir)
    written = spark.read.parquet(out_dir)
    counts["written"] = written.count()
    counts["packs"] = written.select(c.source_col, "pack_id").distinct().count()

    manifest = {"config": asdict(c), "counts": counts}
    with open(os.path.join(output, "_curation_manifest.json"), "w") as fp:
        json.dump(manifest, fp, indent=2, default=str)
    return manifest
