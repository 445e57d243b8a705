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


# ---------------------------------------------------------------- substring


def test_substring_dedup_removes_later_token_windows(spark):
    from logai_spark.functions.webclean import substring_dedup

    shared = "one two three four five six seven eight"
    rows = [
        (1, f"{shared} tail1 tail2"),        # first occurrence -> kept whole
        (2, f"lead {shared} other"),         # 8-token window repeats -> cut
        (3, "too short to match"),           # < window tokens -> untouched
        (4, ""),                             # empty -> survives as empty
        (5, None),                           # NULL text == empty
    ]
    out = {
        r["doc_id"]: r.asDict()
        for r in substring_dedup(
            spark.createDataFrame(rows, "doc_id long, text string"), window=8
        ).collect()
    }
    assert out[1]["clean_text"] == f"{shared} tail1 tail2"
    assert out[1]["n_tokens"] == 10 and out[1]["n_kept"] == 10
    assert out[2]["clean_text"] == "lead other"
    assert out[2]["n_tokens"] == 10 and out[2]["n_kept"] == 2
    assert out[3]["clean_text"] == "too short to match"
    assert out[4]["clean_text"] == "" and out[4]["n_tokens"] == 0
    assert out[5]["clean_text"] == "" and out[5]["n_tokens"] == 0


def test_substring_dedup_long_duplicate_region_fully_covered(spark):
    """A duplicated region LONGER than the window is a union of duplicated
    windows, so the whole region is removed from the later occurrence."""
    from logai_spark.functions.webclean import substring_dedup

    region = " ".join(f"w{i}" for i in range(12))   # 12 tokens, window 8
    rows = [(1, region), (2, f"{region} suffix")]
    out = {
        r["doc_id"]: r.asDict()
        for r in substring_dedup(
            spark.createDataFrame(rows, "doc_id long, text string"), window=8
        ).collect()
    }
    assert out[1]["n_kept"] == 12
    assert out[2]["clean_text"] == "suffix" and out[2]["n_kept"] == 1


def test_substring_dedup_case_sensitive_and_no_cartesian(spark):
    from logai_spark.functions.webclean import substring_dedup

    shared = "a b c d e f g h"
    df = spark.createDataFrame(
        [(1, shared), (2, shared.upper())], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in substring_dedup(df, window=8).collect()}
    # exact-match semantics: different case -> no duplicate, both kept
    assert out[1]["n_kept"] == 8 and out[2]["n_kept"] == 8
    plan = substring_dedup(df, window=8)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


# --------------------------------------------------------------- line filter


GOOD_LINE = "This is a perfectly normal retained sentence."


def test_line_filter_c4_line_rules(spark):
    from logai_spark.functions.webclean import line_filter

    doc = "\n".join(
        [
            GOOD_LINE,                                   # kept
            "No terminal punctuation here",              # dropped: no punct
            "Short one.",                                # dropped: < 3 words
            "Enable javascript to view this page.",      # dropped: javascript
            "Read our privacy policy before continuing.", # dropped: policy
            'He said "stop right there."',               # kept (quote end)
            "What could possibly go wrong?",             # kept
            "The final line ends with a bang!",          # kept
            "One more sentence to clear the minimum.",   # kept
        ]
    )
    out = line_filter(
        spark.createDataFrame([(1, doc)], "doc_id long, text string")
    ).collect()[0]
    assert out["n_lines"] == 9 and out["n_kept_lines"] == 5
    lines = out["clean_text"].split("\n")
    assert lines[0] == GOOD_LINE and len(lines) == 5
    assert out["n_sentences"] >= 5
    assert out["c4_keep"] is True


def test_line_filter_doc_level_rules(spark):
    from logai_spark.functions.webclean import line_filter

    five_good = "\n".join([GOOD_LINE] * 5)
    rows = [
        (1, five_good),                                    # keep
        (2, "\n".join([GOOD_LINE] * 4)),                   # < 5 sentences
        (3, five_good + "\nWe Lorem Ipsum dolor sit."),    # lorem ipsum
        (4, five_good + "\nvar x = {a: 1} in body."),      # brace
        (5, ""),                                           # empty
        (6, None),                                         # NULL == empty
    ]
    out = {
        r["doc_id"]: r.asDict()
        for r in line_filter(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert out[1]["c4_keep"] is True
    assert out[2]["c4_keep"] is False and out[2]["rule_min_sentences"] is False
    assert out[3]["c4_keep"] is False and out[3]["has_lorem_ipsum"] is True
    assert out[4]["c4_keep"] is False and out[4]["has_brace"] is True
    assert out[5]["c4_keep"] is False and out[5]["n_lines"] == 0
    assert out[6]["c4_keep"] is False and out[6]["clean_text"] == ""


def test_line_filter_zero_shuffle_plan(spark):
    from logai_spark.functions.webclean import line_filter

    df = spark.createDataFrame(
        [(i, GOOD_LINE) for i in range(10)], "doc_id long, text string"
    )
    plan = line_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# gopher_repetition (Rae et al. 2021 Appendix A.1.2 — full suite)
# ---------------------------------------------------------------------------

def _rep_reference(text):
    """Independent pure-Python computation of all 13 repetition stats with
    the operator's documented semantics (engine-portable 4-dp rounding)."""
    import math
    import re as _re
    from collections import Counter

    def round4(x):
        return math.floor(x * 10000 + 0.5) / 10000

    def frac(num, den):
        return round4(min(num / den, 1.0)) if den > 0 else 0.0

    txt = text or ""
    lines = [s.strip() for s in txt.split("\n") if s.strip()]
    paras = [s.strip() for s in _re.split(r"\n{2,}", txt) if s.strip()]
    words = [w for w in _re.split(r"\s+", txt.strip()) if w] if txt.strip() else []
    wchars = len(_re.sub(r"\s+", "", txt))

    def dup_extra(units):
        c = Counter(units)
        return sum((k - 1) * len(v) for v, k in c.items() if k >= 2)

    out = {
        "dup_line_frac": frac(len(lines) - len(set(lines)), len(lines)),
        "dup_para_frac": frac(len(paras) - len(set(paras)), len(paras)),
        "dup_line_char_frac": frac(dup_extra(lines), sum(map(len, lines))),
        "dup_para_char_frac": frac(dup_extra(paras), sum(map(len, paras))),
    }
    for n in range(2, 11):
        grams = Counter(
            " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
        )
        if n <= 4:
            top = 0
            if grams:
                bc = max(grams.values())
                top = max(
                    c * (len(g) - (n - 1)) for g, c in grams.items() if c == bc
                )
            out[f"top_{n}gram_char_frac"] = frac(top, wchars)
        else:
            dup = sum(
                c * (len(g) - (n - 1)) for g, c in grams.items() if c >= 2
            )
            out[f"dup_{n}gram_char_frac"] = frac(dup, wchars)
    return out


def test_gopher_repetition_matches_reference(spark):
    from logai_spark.functions.webclean import gopher_repetition

    docs = [
        (1, "the cat sat. the cat sat. the cat sat on the mat.\n"
            "hello world\nhello world\n\npara one\n\npara one"),
        (2, "a b a b a b a b a b a b"),               # everything duplicated
        (3, "completely unique words never repeating anything at all here"),
        (4, ""),                                       # empty
        (5, None),                                     # NULL == empty
        (6, "x\n\n\nx\n\nx"),                          # fewer words than n
        (7, "one two three four five six seven "
            "one two three four five six seven extra"),
        (8, "  spaced   out\ttabs\nnew  line  new  line  "),
    ]
    out = {
        r["doc_id"]: r.asDict()
        for r in gopher_repetition(
            spark.createDataFrame(docs, "doc_id long, text string")
        ).collect()
    }
    for did, text in docs:
        exp = _rep_reference(text)
        for k, v in exp.items():
            assert abs(out[did][k] - v) < 1e-9, (did, k, out[did][k], v)
    # rule wiring: doc 2 trips every n-gram rule; empty docs trip none
    # (doc 3 is clean text but SHORT, so its top-ngram fracs exceed the
    # paper thresholds — the word-count rule in gopher_rules screens those)
    assert out[2]["repetition_keep"] is False
    assert out[2]["rule_top_2gram"] is False and out[2]["rule_dup_10gram"] is False
    for d in (4, 5):
        assert out[d]["repetition_keep"] is True
    assert out[3]["rule_dup_line"] is True and out[3]["rule_dup_10gram"] is True
    # dup-line family: doc 1 has 2 repeated lines of 5 non-blank
    assert out[1]["dup_line_frac"] == 0.4
    assert out[1]["rule_dup_line"] is False


def test_gopher_repetition_zero_shuffle_plan(spark):
    from logai_spark.functions.webclean import gopher_repetition

    df = spark.createDataFrame(
        [(i, _doc(40)) for i in range(10)], "doc_id long, text string"
    )
    plan = (
        gopher_repetition(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_paragraph_dedup_first_occurrence_wins(spark):
    from logai_spark.functions.webclean import paragraph_dedup

    rows = [
        (0, "alpha beta\n\nshared para here\n\ngamma"),
        (1, "shared para here\n\nunique one"),        # cross-doc dup dropped
        (2, "repeat me\n\nrepeat me\n\nend"),          # within-doc dup dropped
        (3, "shared para here"),                       # nothing survives
        (4, None),                                     # NULL text -> empty
    ]
    out = {
        r["doc_id"]: r.asDict()
        for r in paragraph_dedup(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert out[0]["clean_text"] == "alpha beta\n\nshared para here\n\ngamma"
    assert out[0]["n_paragraphs"] == 3 and out[0]["n_kept"] == 3
    assert out[1]["clean_text"] == "unique one"
    assert out[1]["n_paragraphs"] == 2 and out[1]["n_kept"] == 1
    assert out[2]["clean_text"] == "repeat me\n\nend"
    assert out[3]["clean_text"] == "" and out[3]["n_kept"] == 0
    assert out[4]["clean_text"] == "" and out[4]["n_paragraphs"] == 0


def test_paragraph_dedup_custom_sep_and_trim(spark):
    from logai_spark.functions.webclean import paragraph_dedup

    # sep must be regex-neutral (same contract as boilerplate_rm: it is
    # the split REGEX and the re-join literal)
    rows = [(0, "a :: b ::  :: c"), (1, " b :: d")]  # blank fragment dropped; ' b ' trims to b
    out = {
        r["doc_id"]: r.asDict()
        for r in paragraph_dedup(
            spark.createDataFrame(rows, "doc_id long, text string"), sep=" :: "
        ).collect()
    }
    assert out[0]["clean_text"] == "a :: b :: c"
    assert out[0]["n_paragraphs"] == 3 and out[0]["n_kept"] == 3
    assert out[1]["clean_text"] == "d"  # 'b' already owned by doc 0


def test_span_dedup_null_text_returns_empty_not_null(spark):
    """A NULL-text doc must come back as ('', 0, 0) — the documented
    'empty text rather than disappearing' contract (ADVICE-r4 regression:
    the window-dedup rewrite dropped the coalesce)."""
    df = spark.createDataFrame([(1, None), (2, "")], "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in span_dedup(df).collect()}
    for i in (1, 2):
        assert out[i]["clean_text"] == ""
        assert out[i]["n_sentences"] == 0 and out[i]["n_kept"] == 0
