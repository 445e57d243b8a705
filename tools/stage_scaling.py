"""Per-stage 2-vs-8-core micro-bench for the curation rewrite stages.

Isolates ONE stage per fresh JVM on the cached 150k-doc synth corpus so a
scaling regression in the full pipeline (tools/curate_scaling.py) can be
attributed to an operator. Compare each stage's 2c->8c ratio against the
host's pure-CPU ceiling for that pair (BASELINE.md §3.1b: 0.75-0.79).

Run:  taskset -c 0-1 python tools/stage_scaling.py 2 paragraph
      taskset -c 0-7 python tools/stage_scaling.py 8 paragraph
Stages: url_dedup | normalize | boilerplate | paragraph | exact_dedup
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = 150000


def main() -> None:
    cpus = int(sys.argv[1])
    stage = sys.argv[2]

    from pyspark.sql import functions as F

    from logai_spark.session import get_spark
    from logai_spark.sources.webpages import synth_webpages

    scratch = f"/dev/shm/stagescale_{cpus}"
    spark = get_spark(
        f"stagescale_{cpus}", cpus=cpus, shuffle_partitions=64,
        extra_conf={"spark.local.dir": scratch, "spark.locality.wait": "0s"},
    )
    docs = synth_webpages(spark, N_DOCS, partitions=64).select(
        F.xxhash64("url").alias("doc_id"), "text", "lang",
        F.regexp_extract("url", r"^[a-z]+://([^/]+)/", 1).alias("source"),
        "url", "warc_ts",
    ).cache()
    docs.count()

    def run() -> float:
        if stage == "url_dedup":
            from logai_spark.functions.textops import url_dedup

            keep = url_dedup(
                docs.select("doc_id", "url", "warc_ts"), url_col="url",
                id_col="doc_id", ts_col="warc_ts",
            ).select(F.col("keeper_id").alias("doc_id"), F.lit(True).alias("_uk"))
            out = (
                docs.join(keep, "doc_id", "left")
                .filter(F.col("_uk").isNotNull() | F.col("url").isNull())
                .drop("_uk")
            )
        elif stage == "normalize":
            from logai_spark.functions.curation import normalize_text_expr

            out = docs.withColumn("text", normalize_text_expr("text"))
        elif stage == "boilerplate":
            from logai_spark.functions.curation import boilerplate_rm

            out = boilerplate_rm(
                docs, id_col="doc_id", text_col="text", max_df=7500,
                inplace=True,
            )
        elif stage == "paragraph":
            from logai_spark.functions.webclean import paragraph_dedup

            out = paragraph_dedup(
                docs, text_col="text", id_col="doc_id", sep="\n", inplace=True
            )
        elif stage == "exact_dedup":
            from logai_spark.functions.textops import exact_dedup

            out = exact_dedup(docs, ["text"], id_col="doc_id", hash_key=True)
        else:
            raise SystemExit(f"unknown stage {stage!r}")
        t0 = time.time()
        # force every column incl. rewritten text without collecting rows
        out.agg(
            F.sum(F.length("text")) if "text" in out.columns
            else F.count(F.lit(1))
        ).collect()
        return time.time() - t0

    w1, w2 = run(), run()  # second run amortizes codegen; report min
    print(json.dumps({
        "cpus": cpus, "stage": stage,
        "wall": round(min(w1, w2), 2), "runs": [round(w1, 2), round(w2, 2)],
    }))
    spark.stop()
    subprocess.run(["rm", "-rf", scratch], check=False)


if __name__ == "__main__":
    main()
