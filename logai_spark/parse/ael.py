"""AEL log parser (Abstracting Execution Logs), distributed.

Behavioral contract from the published AEL algorithm (Jiang et al. 2008),
which is also what the reference implements
(/root/reference/logai/algorithms/parsing_algo/ael.py:57-200):

1. preprocess: user regexes -> ``<*>`` placeholders (ael.py:193-197)
2. bin by (token_count, placeholder_count) (ael.py:95-110)
3. exact-string dedup into events per bin (ael.py:112-129)
4. reconcile: if a bin holds more than ``min_event_count`` events, greedily
   merge events whose token-difference ratio is in (0, merge_percent];
   differing positions become ``<*>`` (ael.py:131-157, 159-173)

Spark shape (SURVEY.md §2.7): steps 1-3 are regexp_replace + groupBy (JVM);
step 4 is applyInPandas per bin over the (small) distinct-event sets; the
final line->template assignment is a join on the deduped line. Event order
inside a bin is made deterministic (first sort key: descending count, then
line text) — the reference iterates in first-occurrence order, which has no
distributed analog; its own tests assert cluster structure, not golden
strings.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PLACEHOLDER = "<*>"


@dataclass
class AELConfig:
    rex: list[str] = field(default_factory=list)
    min_event_count: int = 2
    merge_percent: float = 1.0


def _reconcile_bin(lines: list[str], cfg: AELConfig) -> dict[str, str]:
    """Merge the distinct lines of one bin; return line -> template."""
    events: list[dict] = [
        {"tokens": ln.split(), "lines": [ln], "merged": False} for ln in lines
    ]
    out: dict[str, str] = {}
    if len(events) <= cfg.min_event_count:
        for e in events:
            out[e["lines"][0]] = " ".join(e["tokens"])
        return out
    for i, e1 in enumerate(events):
        if e1["merged"]:
            continue
        e1["merged"] = True
        group = [e1]
        for e2 in events[i + 1 :]:
            if e2["merged"]:
                continue
            n_diff = sum(1 for a, b in zip(e1["tokens"], e2["tokens"]) if a != b)
            if 0 < n_diff / len(e1["tokens"]) <= cfg.merge_percent:
                e2["merged"] = True
                group.append(e2)
        # merge group left-to-right: wildcard all differing positions
        tokens = list(group[0]["tokens"])
        for e in group[1:]:
            for p, (a, b) in enumerate(zip(tokens, e["tokens"])):
                if a != b:
                    tokens[p] = PLACEHOLDER
        template = " ".join(tokens)
        for e in group:
            for ln in e["lines"]:
                out[ln] = template
    return out


def ael_parse(
    df: DataFrame, column: str = "logline", config: AELConfig | None = None
) -> DataFrame:
    """Adds ``template`` and ``template_id`` columns via distributed AEL."""
    cfg = config or AELConfig()

    cleaned = F.col(column)
    for rex in cfg.rex:
        cleaned = F.regexp_replace(cleaned, rex, PLACEHOLDER)
    work = df.withColumn("_clean", cleaned)

    toks = F.split(F.trim(F.col("_clean")), r"\s+")
    distinct = (
        work.groupBy("_clean")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn("_ntok", F.size(toks))
        .withColumn(
            "_npar",
            F.size(F.filter(toks, lambda t: t == F.lit(PLACEHOLDER))),
        )
    )

    schema = T.StructType(
        [
            T.StructField("_clean", T.StringType()),
            T.StructField("template", T.StringType()),
        ]
    )

    def per_bin(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_cnt", "_clean"], ascending=[False, True])
        mapping = _reconcile_bin(list(pdf["_clean"]), cfg)
        return pd.DataFrame(
            {"_clean": list(mapping.keys()), "template": list(mapping.values())}
        )

    templates = distinct.groupBy("_ntok", "_npar").applyInPandas(per_bin, schema)
    out = work.join(templates, "_clean", "left").drop("_clean")
    return out.withColumn(
        "template_id", F.substring(F.md5(F.col("template")), 1, 16)
    )
