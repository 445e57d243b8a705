import pyspark.sql.functions as F
import pytest

from logai_spark.functions.webclean import gopher_rules, span_dedup


def _doc(n_words: int, prefix: str = "") -> str:
    """n_words words including >=2 Gopher required stopwords."""
    base = "the data of pipeline and scale that works with spark "
    words = (base * (n_words // 10 + 1)).split()[:n_words]
    return (prefix + " ".join(words)).strip()


def test_gopher_rules_pass_and_flags(spark):
    rows = [
        (0, _doc(60)),                               # clean -> keep
        (1, _doc(10)),                               # too short
        (2, " ".join(["#tag"] * 60)),                # symbol ratio + stopwords
        (3, "\n".join(["- item " + _doc(8)] * 10)),  # all bullet lines
        (4, "\n".join([_doc(12) + "..."] * 5)),      # all ellipsis-end lines
        (5, " ".join(["12345"] * 60)),               # no alpha words
        (6, ""),                                     # empty text
        (7, None),                                   # NULL text == empty
    ]
    out = {
        r["doc_id"]: r.asDict()
        for r in gopher_rules(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert out[0]["gopher_keep"] is True
    assert out[0]["n_words"] == 60 and out[0]["stopword_hits"] >= 2

    assert out[1]["gopher_keep"] is False and out[1]["rule_word_count"] is False
    assert out[2]["rule_symbol_ratio"] is False  # one '#' per word
    assert out[3]["rule_bullet_lines"] is False and out[3]["bullet_line_frac"] == 1.0
    assert out[4]["rule_ellipsis_lines"] is False
    assert out[5]["rule_alpha_words"] is False and out[5]["alpha_word_frac"] == 0.0
    assert out[6]["n_words"] == 0 and out[6]["gopher_keep"] is False
    assert out[7]["n_words"] == 0 and out[7]["gopher_keep"] is False


def test_gopher_mean_word_len_band(spark):
    rows = [
        (0, " ".join(["ab"] * 60)),                       # mean len 2 < 3
        (1, " ".join(["abcdefghijklmnop"] * 60)),         # mean len 16 > 10
    ]
    out = {
        r["doc_id"]: r
        for r in gopher_rules(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert out[0]["rule_mean_word_len"] is False
    assert out[1]["rule_mean_word_len"] is False


S1, S2, S3, S4 = "Alpha beta gamma.", "Delta went home!", "Epsilon zeta?", "Unique tail one."


def test_span_dedup_removes_later_occurrences(spark):
    shared = f"{S1} {S2} {S3}"
    rows = [
        (1, f"{shared} {S4}"),              # first occurrence -> kept whole
        (2, f"Lead in two. {shared}"),      # span repeats -> 3 sentences cut
        (3, "Short one. Short two."),       # <3 sentences -> untouched
        (4, ""),                            # empty -> survives as empty
    ]
    out = {
        r["doc_id"]: r.asDict()
        for r in span_dedup(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert out[1]["clean_text"] == f"{S1} {S2} {S3} {S4}"
    assert out[1]["n_kept"] == 4
    # doc 2 loses exactly the duplicated 3-sentence window
    assert out[2]["clean_text"] == "Lead in two."
    assert out[2]["n_sentences"] == 4 and out[2]["n_kept"] == 1
    assert out[3]["clean_text"] == f"{'Short one.'} {'Short two.'}"
    assert out[4]["clean_text"] == "" and out[4]["n_sentences"] == 0


def test_span_dedup_within_doc_and_row_count(spark):
    # the same 3-sentence window twice INSIDE one doc: second occurrence cut
    rows = [(7, f"{S1} {S2} {S3} {S1} {S2} {S3}")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = span_dedup(df).collect()
    assert len(out) == 1
    assert out[0]["clean_text"] == f"{S1} {S2} {S3}"
    assert out[0]["n_sentences"] == 6 and out[0]["n_kept"] == 3


def test_span_dedup_plan_never_shuffles_text(spark):
    """The only exchanges carry span hashes / integer positions / per-doc
    sentence structs — the plan must contain no cartesian product."""
    df = spark.createDataFrame(
        [(i, f"{S1} {S2} {S3} doc {i}.") for i in range(20)],
        "doc_id long, text string",
    )
    plan = span_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
