"""Training-data text operators: dedup family, quality, fingerprints."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from logai_spark.functions.textops import (
    doc_fingerprint,
    exact_dedup,
    lsh_duplicate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    quality_score,
    simhash,
    token_count,
)


@pytest.fixture(scope="module")
def docs(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(6),
            "text": [
                "the quick brown fox jumps over the lazy dog",
                "the quick brown fox jumps over the lazy cat",   # near-dup of 0
                "the quick brown fox jumps over the lazy dog",   # exact dup of 0
                "completely different content about spark engines",
                "completely different content about spark engines here",
                "zz",
            ],
        }
    )
    return spark.createDataFrame(pdf).cache()


def test_token_count(spark, docs):
    got = token_count(docs).toPandas().set_index("doc_id")["n_tokens"]
    assert got[0] == 9 and got[5] == 1


def test_exact_dedup(spark, docs):
    out = exact_dedup(docs, ["text"]).toPandas()
    dup_row = out[out["n_dups"] == 2]
    assert len(dup_row) == 1 and dup_row.iloc[0]["keeper_id"] == 0
    assert out["n_dups"].sum() == 6


def test_minhash_identical_docs_identical_sigs(spark, docs):
    sigs = minhash_signatures(docs, k=6).toPandas().set_index("doc_id")
    assert (sigs.loc[0] == sigs.loc[2]).all()
    # near-dups share most mins; disjoint docs share few
    near = (sigs.loc[0] == sigs.loc[1]).sum()
    far = (sigs.loc[0] == sigs.loc[3]).sum()
    assert near >= far


def test_lsh_pairs_find_exact_dup(spark, docs):
    pairs = lsh_duplicate_pairs(docs, bands=3, rows_per_band=2).toPandas()
    tup = set(map(tuple, pairs[["id_a", "id_b"]].values))
    assert (0, 2) in tup


def test_ngram_jaccard(spark, docs):
    pairs = ngram_jaccard_pairs(docs, threshold=0.5).toPandas()
    tup = {tuple(r) for r in pairs[["id_a", "id_b"]].values}
    assert (0, 2) in tup  # exact dup -> jaccard 1.0
    j = pairs.set_index(["id_a", "id_b"])["jaccard"]
    assert j[(0, 2)] == 1.0
    assert ((pairs["jaccard"] > 0) & (pairs["jaccard"] <= 1.0)).all()


def test_simhash_close_for_near_dups(spark, docs):
    s = simhash(docs, bits=16).toPandas().set_index("doc_id")["simhash"]
    assert s[0] == s[2]
    ham = lambda a, b: bin(int(a) ^ int(b)).count("1")
    assert ham(s[0], s[1]) <= ham(s[0], s[3]) + 2


def test_fingerprint_order_sensitive(spark):
    pdf = pd.DataFrame({"doc_id": [0, 1], "text": ["a b c", "c b a"]})
    fp = doc_fingerprint(spark.createDataFrame(pdf)).toPandas().set_index("doc_id")["fingerprint"]
    assert fp[0] != fp[1]


def test_quality_score_bounds(spark, docs):
    q = quality_score(docs).toPandas()
    assert ((q["quality"] >= 0) & (q["quality"] <= 1)).all()
    # the stopword-rich sentence should outscore the 2-char doc
    byid = q.set_index("doc_id")["quality"]
    assert byid[0] > byid[5]


def test_lang_id_multilingual(spark):
    """Each profile language is recognized from a plain sentence; gibberish
    stays unknown; ties break deterministically."""
    import pandas as pd
    from pyspark.sql import functions as F

    from logai_spark.functions.textops import lang_id

    samples = {
        "en": "the cat is on the mat and it was not there before",
        "de": "der hund ist nicht mit der katze auf dem sofa",
        "fr": "le chien est dans le jardin avec les enfants pour jouer",
        "es": "el perro es grande y los gatos no quieren jugar con una pelota",
        "it": "il cane che corre nel parco non vuole giocare con la palla",
        "nl": "de hond is niet met de kat op de bank aan het spelen",
        "pt": "os gatos de casa querem brincar com uma bola para se divertir",
        # segmentation-free script profiles (whitespace tokenization alone
        # could never detect these)
        "zh": "今天天气很好我们一起去公园散步吧然后吃晚饭",
        "ja": "今日はとても良い天気ですから公園へ散歩に行きましょう",
        "ko": "오늘은 날씨가 좋아서 공원에 산책하러 갑니다",
        "ru": "сегодня хорошая погода и мы идем гулять в парк",
        "unknown": "zzz qqq xxyzzy blorp 12345",
    }
    df = spark.createDataFrame(
        pd.DataFrame({"expected": list(samples), "text": list(samples.values())})
    )
    out = {r["expected"]: r["lang_pred"] for r in lang_id(df).collect()}
    assert out == {k: k for k in samples}


def test_ngram_jaccard_validate_ids_fails_loudly(spark, docs):
    import pandas as pd
    import pytest

    dup = docs.union(docs.limit(1))  # duplicate id 0
    with pytest.raises(Exception, match="duplicate doc_id"):
        ngram_jaccard_pairs(dup, threshold=0.5, validate_ids=True).collect()
    # unique ids pass through the guard unchanged
    clean = ngram_jaccard_pairs(docs, threshold=0.5, validate_ids=True).toPandas()
    base = ngram_jaccard_pairs(docs, threshold=0.5).toPandas()
    key = ["id_a", "id_b"]
    assert (
        clean.sort_values(key).reset_index(drop=True).equals(
            base.sort_values(key).reset_index(drop=True))
    )


def test_repetition_stats(spark):
    from logai_spark.functions.textops import repetition_stats

    df = spark.createDataFrame(
        [
            (0, "a b a b a b"),        # 2 distinct of 6; "a b" bigram x3 of 5
            (1, "x y z"),              # all distinct; every bigram unique
            (2, "solo"),               # single token: no bigrams
            (3, "t t t t"),            # 1 distinct of 4; "t t" x3 of 3
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert out[0].n_words == 6
    assert abs(out[0].dup_word_frac - (1 - 2 / 6)) < 1e-4
    assert abs(out[0].top_bigram_frac - 3 / 5) < 1e-4
    assert out[1].dup_word_frac == 0.0
    assert abs(out[1].top_bigram_frac - 0.5) < 1e-4
    assert out[2].top_bigram_frac == 0.0
    assert out[3].top_bigram_frac == 1.0


def test_repetition_stats_no_shuffle(spark):
    from logai_spark.functions.textops import repetition_stats

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    plan = repetition_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # row-local: no shuffle at any scale


def test_pii_redact(spark):
    from logai_spark.functions.textops import pii_redact

    df = spark.createDataFrame(
        [
            (0, "mail bob.smith+x@corp.example.org now"),
            (1, "from 192.168.0.1 to 10.0.0.255"),
            (2, "ssn 123456789 acct 900000000042 ok 1234"),
            (3, "clean text with no pii at all"),
            (4, "a@b.io via 1.2.3.4 ref 999999999"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in pii_redact(df).collect()}
    assert out[0].redacted == "mail <EMAIL> now" and out[0].n_emails == 1
    assert out[1].redacted == "from <IP> to <IP>" and out[1].n_ips == 2
    assert out[2].redacted == "ssn <ID> acct <ID> ok 1234" and out[2].n_ids == 2
    assert out[3].redacted == out[3].text
    assert (out[4].n_emails, out[4].n_ips, out[4].n_ids) == (1, 1, 1)
    assert out[4].redacted == "<EMAIL> via <IP> ref <ID>"


def test_hash_sample_deterministic_and_no_shuffle(spark):
    from logai_spark.functions.textops import hash_sample

    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(1000)], "doc_id long, source string"
    )
    a = hash_sample(df, 0.2, strata_cols=["source"])
    b = hash_sample(df, 0.2, strata_cols=["source"])
    ids_a = sorted(r.doc_id for r in a.collect())
    ids_b = sorted(r.doc_id for r in b.collect())
    assert ids_a == ids_b                       # reproducible
    assert 120 <= len(ids_a) <= 280             # ~20% of 1000
    # frac=1 keeps everything; frac=0 keeps nothing
    assert hash_sample(df, 1.0).count() == 1000
    assert hash_sample(df, 0.0).count() == 0
    # nested sampling: a 10% cut is a subset of the 20% cut (same key space)
    ids_10 = {r.doc_id for r in hash_sample(df, 0.1, strata_cols=["source"]).collect()}
    assert ids_10 <= set(ids_a)
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan               # pure filter


def test_top_ngrams(spark):
    from logai_spark.functions.textops import top_ngrams

    df = spark.createDataFrame(
        [(0, "the cat sat"), (1, "the cat ran"), (2, "The Cat sat down")],
        "doc_id long, text string",
    )
    out = [(r.ngram, r.n) for r in top_ngrams(df, n=2, k=3).collect()]
    assert out[0] == ("the cat", 3)             # lowercased, corpus-wide
    assert ("cat sat", 2) in out
    plan = top_ngrams(df, n=2, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan      # top-k, not a global sort


def test_incremental_dedup(spark):
    from logai_spark.functions.textops import incremental_dedup

    snap = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma delta")], "doc_id long, text string"
    )
    inc = spark.createDataFrame(
        [(10, "alpha beta"),      # duplicate content, different id -> dropped
         (11, "epsilon zeta"),    # new -> kept
         (12, "gamma delta")],    # duplicate -> dropped
        "doc_id long, text string",
    )
    kept = sorted(r.doc_id for r in incremental_dedup(inc, snap).collect())
    assert kept == [11]


def test_quality_floor_threshold_and_plan(spark):
    from logai_spark.functions.textops import quality_floor

    # 10 docs in one lang with strictly increasing quality (longer = better
    # here), plus a second lang to prove per-lang independence
    rows = [(i, "en", "the a of to in is " + "word " * (i + 1)) for i in range(10)]
    rows += [(100, "de", "kurz"), (101, "de", "der die das und ist " + "wort " * 30)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = quality_floor(df, keep_frac=0.5)
    kept = {r.doc_id for r in out.collect()}
    # en: top half by quality (ties impossible: monotone construction);
    # with 10 rows the interpolated median is BETWEEN ranks 5 and 6, so
    # exactly 5 survive >= cutoff
    assert len([d for d in kept if d < 100]) == 5
    assert max(kept & {100, 101}) == 101 and 100 not in kept  # de cut separately
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan       # cutoff table broadcast back
    assert "Window" not in plan              # never a per-lang rank window


def test_exact_dedup_hash_key_equivalent(spark):
    from logai_spark.functions.textops import exact_dedup

    df = spark.createDataFrame(
        [(0, "same text"), (1, "same text"), (2, "other"), (3, "third")],
        "doc_id long, text string",
    )
    raw = {(r.keeper_id, r.n_dups) for r in exact_dedup(df, ["text"]).collect()}
    hashed = {
        (r.keeper_id, r.n_dups)
        for r in exact_dedup(df, ["text"], hash_key=True).collect()
    }
    assert raw == hashed == {(0, 2), (2, 1), (3, 1)}


def test_decontaminate_counts_and_broadcast(spark):
    from logai_spark.functions.textops import decontaminate

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),        # benchmark
            (1, "alpha beta gamma epsilon"),      # shares 'alpha beta gamma'
            (2, "zeta eta theta iota"),           # clean
            (3, "x alpha beta gamma delta y"),    # shares 2 benchmark 3-grams
        ],
        "doc_id long, text string",
    )
    bench = docs.filter("doc_id = 0")
    corpus = docs.filter("doc_id != 0")
    out = decontaminate(corpus, bench, n=3)
    got = {r.doc_id: r.n_hit_ngrams for r in out.collect()}
    assert got == {1: 1, 3: 2}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan     # benchmark n-gram set broadcast
    assert "SortMergeJoin" not in plan


def test_bigram_lm_score_hand_check(spark):
    from logai_spark.functions.textops import bigram_lm_score
    import math

    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b"), (2, "c")],
        "doc_id long, text string",
    )
    # corpus bigrams: 'a b' x3, 'b a' x1; c(a.)=3, c(b.)=1; V={a,b,c}=3
    out = {r.doc_id: (r.n_bigrams, r.avg_logp) for r in bigram_lm_score(docs).collect()}
    p_ab = math.log((3 + 1) / (3 + 3))
    p_ba = math.log((1 + 1) / (1 + 3))
    exp0 = math.floor((2 * p_ab + p_ba) / 3 * 10000 + 0.5) / 10000
    exp1 = math.floor(p_ab * 10000 + 0.5) / 10000
    assert out[0] == (3, exp0) and out[1] == (1, exp1)
    assert 2 not in out  # single-token doc has no bigrams


def test_domain_cap_quota_and_rank_limit(spark):
    from logai_spark.functions.textops import domain_cap

    rows = [(i, f"https://HOT.example.com/p/{i}", i % 7) for i in range(20)]
    rows += [(100 + i, f"https://cold.org:8443/q?{i}", i) for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, url string, score long")
    out = domain_cap(df, max_per_domain=5, order_cols=["score"])
    got = out.groupBy("domain").count().collect()
    counts = {r.domain: r["count"] for r in got}
    assert counts == {"hot.example.com": 5, "cold.org": 3}  # port stripped
    kept_hot = sorted(
        r.doc_id for r in out.filter("domain = 'hot.example.com'").collect()
    )
    # top-5 by score desc (score = doc_id % 7): 6,13 (score 6), 5,12,19 (5)
    assert kept_hot == [5, 6, 12, 13, 19]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan  # rank-limit pushdown caps sort buffer


def test_url_normalize_rules(spark):
    from logai_spark.functions.textops import url_normalize

    cases = [
        (0, "HTTP://Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag"),
        (1, "https://example.com:443/"),
        (2, "https://example.com:8443/x/"),
        (3, "http://example.com/p?fbclid=abc"),
        (4, "not a url"),
        (5, "https://example.com"),
    ]
    df = spark.createDataFrame(cases, "doc_id long, url string")
    got = {r.doc_id: r.url_norm for r in url_normalize(df).collect()}
    assert got[0] == "http://example.com/a/b?a=1&b=2"  # port, frag, utm, sort
    assert got[1] == "https://example.com/"            # default port, root
    assert got[2] == "https://example.com:8443/x"      # non-default port kept
    assert got[3] == "http://example.com/p"            # tracking-only query
    assert got[4] == "not a url"                       # pass-through
    assert got[5] == "https://example.com/"            # empty path -> /


def test_winnow_fingerprints_guarantee(spark):
    from logai_spark.functions.textops import winnow_fingerprints

    k, w = 3, 3
    shared = "one two three four five six seven"  # 7 tokens: run >= w+k-1=5
    df = spark.createDataFrame(
        [
            (0, "x y " + shared),
            (1, shared + " p q r"),
            (2, "totally different words here entirely now friend"),
        ],
        "doc_id long, text string",
    )
    out = winnow_fingerprints(df, k=k, w=w).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    # winnowing guarantee: docs sharing a >= w+k-1 token run share >=1 fp
    assert by_doc[0] & by_doc[1]
    assert not (by_doc[0] & by_doc[2])
    # selection density: ~|grams|/w selections, never more than |windows|
    n_grams = len(("x y " + shared).split()) - k + 1
    assert len([r for r in out if r.doc_id == 0]) <= n_grams - w + 1
    # positions are 1-based and within range
    assert all(1 <= r.pos <= n_grams for r in out if r.doc_id == 0)


def test_vocab_drift_js_bounds(spark):
    from logai_spark.functions.textops import vocab_drift
    import math

    a = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
    same = vocab_drift(a, a).collect()[0]
    assert same.js_divergence == 0.0
    b = spark.createDataFrame([(1, "x y z w")], "doc_id long, text string")
    disjoint = vocab_drift(a, b).collect()[0]
    assert abs(disjoint.js_divergence - math.log(2)) < 1e-4  # JS max = ln 2
    assert (disjoint.n_words_a, disjoint.n_words_b) == (4, 4)


def test_mixture_sample_proportions_and_determinism(spark):
    from logai_spark.functions.textops import mixture_sample

    rows = [(i, "en") for i in range(100)]
    rows += [(1000 + i, "de") for i in range(30)]
    rows += [(2000 + i, "fr") for i in range(50)]
    rows += [(3000 + i, "xx") for i in range(40)]  # untargeted -> dropped
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = mixture_sample(df, {"en": 0.5, "de": 0.25, "fr": 0.25})
    counts = {r.lang: r["count"] for r in out.groupBy("lang").count().collect()}
    # N* = min(100/.5, 30/.25, 50/.25) = 120 -> quotas 60/30/30
    assert counts == {"en": 60, "de": 30, "fr": 30}
    # deterministic: same winners on any partitioning
    ids1 = sorted(r.doc_id for r in out.collect())
    ids2 = sorted(
        r.doc_id
        for r in mixture_sample(
            df.repartition(13), {"en": 0.5, "de": 0.25, "fr": 0.25}
        ).collect()
    )
    assert ids1 == ids2
    # rank-limit pushdown: constant max-quota conjunct caps the sort buffer
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_mixture_sample_normalizes_and_guards(spark):
    import pytest

    from logai_spark.functions.textops import mixture_sample

    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "de") for i in range(40)],
        "doc_id long, lang string",
    )
    # targets normalize (2:1:1 == 0.5:0.25:0.25); missing group 'fr' with
    # positive frac makes the mixture infeasible -> empty, never skewed
    assert mixture_sample(df, {"en": 2.0, "de": 1.0, "fr": 1.0}).count() == 0
    out = mixture_sample(df, {"en": 2.0, "de": 2.0})
    counts = {r.lang: r["count"] for r in out.groupBy("lang").count().collect()}
    assert counts == {"en": 20, "de": 20}
    with pytest.raises(ValueError, match="non-empty"):
        mixture_sample(df, {})


# ---------------------------------------------------------------------------
# epoch_upsample (Pile-style component epochs)
# ---------------------------------------------------------------------------

def test_epoch_upsample_counts_and_determinism(spark):
    from logai_spark.functions.textops import epoch_upsample

    rows = [(i, "wiki" if i < 200 else "web") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = epoch_upsample(df, {"wiki": 2.5, "web": 1.0})
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # web passes through exactly once; wiki gets 2 full copies + ~50% extra
    assert counts["web"] == 800
    assert 2 * 200 <= counts["wiki"] <= 3 * 200
    assert abs(counts["wiki"] - 500) <= 40  # hash-frac ~= 0.5 within noise

    # every (id, copy) pair unique; copies numbered 1..k
    n_pairs = out.select("doc_id", "epoch_copy").distinct().count()
    assert n_pairs == out.count()

    # deterministic across partitionings
    a = sorted(out.select("doc_id", "epoch_copy").collect())
    b = sorted(
        epoch_upsample(df.repartition(13), {"wiki": 2.5, "web": 1.0})
        .select("doc_id", "epoch_copy")
        .collect()
    )
    assert a == b


def test_epoch_upsample_zero_weight_drops_and_default_passthrough(spark):
    from logai_spark.functions.textops import epoch_upsample

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, source string"
    )
    out = epoch_upsample(df, {"a": 0.0, "b": 3.0}).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["epoch_copy"])
    assert "a" not in by_src                 # weight 0 -> dropped
    assert sorted(by_src["b"]) == [1, 2, 3]  # integer weight -> exact copies
    assert by_src["c"] == [1]                # absent group -> 1 copy

    with pytest.raises(ValueError):
        epoch_upsample(df, {"a": -1.0})


def test_epoch_upsample_zero_shuffle_plan(spark):
    from logai_spark.functions.textops import epoch_upsample

    df = spark.createDataFrame(
        [(i, "a") for i in range(10)], "doc_id long, source string"
    )
    plan = (
        epoch_upsample(df, {"a": 1.5})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# url_filter (domain blocklist, subdomain-aware)
# ---------------------------------------------------------------------------

def test_url_filter_subdomain_semantics(spark):
    from logai_spark.functions.textops import url_filter

    rows = [
        (1, "https://example.com/page"),          # exact match -> blocked
        (2, "https://ads.example.com/x"),         # subdomain -> blocked
        (3, "https://a.b.example.com/y"),         # deep subdomain -> blocked
        (4, "https://notexample.com/z"),          # suffix of the STRING only
        (5, "https://example.com.evil.net/w"),    # blocklist domain as prefix
        (6, "https://good.org/ok"),               # clean
        (7, "not a url"),                         # no host -> never blocked
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    bl = spark.createDataFrame([("example.com",), ("bad.net",)], "domain string")

    kept = sorted(r["doc_id"] for r in url_filter(df, bl).collect())
    assert kept == [4, 5, 6, 7]

    flagged = {
        r["doc_id"]: r["url_blocked"]
        for r in url_filter(df, bl, action="flag").collect()
    }
    assert flagged == {1: True, 2: True, 3: True, 4: False, 5: False,
                       6: False, 7: False}
    with pytest.raises(ValueError):
        url_filter(df, bl, action="nope")


def test_url_filter_broadcasts_blocklist(spark):
    from logai_spark.functions.textops import url_filter

    df = spark.createDataFrame(
        [(i, f"https://site{i}.com/p") for i in range(20)],
        "doc_id long, url string",
    )
    bl = spark.createDataFrame([("site1.com",)], "domain string")
    plan = (
        url_filter(df, bl)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    # zero CORPUS shuffle: every hash exchange is on the blocklist's
    # _bl_domain dedup, never on a corpus column
    import re as _re

    for m in _re.finditer(r"Exchange hashpartitioning\(([^,]+),", plan):
        assert m.group(1).startswith("_bl_domain"), plan


def test_lsh_params_calibration():
    from logai_spark.functions.textops import lsh_params

    # monotone: higher thresholds want more rows per band (steeper S-curve)
    rows = [lsh_params(t, 16)[1] for t in (0.2, 0.5, 0.8, 0.95)]
    assert rows == sorted(rows)
    # the implied threshold lands near the request
    for t in (0.3, 0.5, 0.7, 0.9):
        b, r = lsh_params(t, 128)
        assert b * r <= 128
        assert abs((1.0 / b) ** (1.0 / r) - t) < 0.08
    # defaults stay within the permutation budget
    b, r = lsh_params(0.5, 16)
    assert b * r <= 16 and b >= 1 and r >= 1
    import pytest as _pytest

    with _pytest.raises(ValueError):
        lsh_params(1.5)
    with _pytest.raises(ValueError):
        lsh_params(0.5, 0)


def test_simhash_pairs_equals_brute_force(spark, docs):
    """Banded pairing with bands = max_hamming + 1 must reproduce the
    exact brute-force Hamming-threshold pair set (the Manku et al.
    pigeonhole guarantee the DuckDB oracle also checks)."""
    from itertools import combinations

    from logai_spark.functions.textops import simhash_pairs

    sigs = simhash(docs, bits=16).toPandas().set_index("doc_id")["simhash"]
    for max_h in (0, 2, 4):
        want = {
            (a, b, bin(int(sigs[a]) ^ int(sigs[b])).count("1"))
            for a, b in combinations(sorted(sigs.index), 2)
            if bin(int(sigs[a]) ^ int(sigs[b])).count("1") <= max_h
        }
        got = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in simhash_pairs(docs, bits=16, max_hamming=max_h).collect()
        }
        assert got == want, max_h
    # exact dup (docs 0 and 2) is always a hamming-0 pair
    assert (0, 2, 0) in got


def test_simhash_pairs_band_validation_and_bucket_cap(spark, docs):
    from logai_spark.functions.textops import simhash_pairs

    with pytest.raises(ValueError):
        simhash_pairs(docs, bits=8, bands=9)
    # cap of 0 drops every band bucket -> no candidates survive
    assert simhash_pairs(docs, bits=16, max_hamming=4, max_band_bucket=0).count() == 0


def test_url_dedup_latest_snapshot_wins(spark):
    from logai_spark.functions.textops import url_dedup

    rows = [
        (0, "https://a.com/x", "2024-01-01"),
        (1, "https://a.com/x/", "2024-03-01"),            # trailing slash merge
        (2, "https://a.com:443/x?utm_source=t", "2024-02-01"),  # port+tracking merge
        (3, "http://b.com/y", "2024-01-01"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = {r["url_norm"]: r.asDict() for r in url_dedup(df, ts_col="ts").collect()}
    a = out["https://a.com/x"]
    assert a["keeper_id"] == 1 and a["n_dups"] == 3  # latest snapshot kept
    assert out["http://b.com/y"]["n_dups"] == 1


def test_url_dedup_first_seen_and_string_ids(spark):
    from logai_spark.functions.textops import url_dedup

    rows = [
        ("doc-b", "https://a.com/x"),
        ("doc-a", "https://a.com/x/"),
        ("doc-c", "https://c.com/"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, url string")
    out = {r["url_norm"]: r.asDict() for r in url_dedup(df).collect()}
    # ts-less election = min id; struct ordering handles string ids (no
    # arithmetic negation, the round-3 -id bug class)
    assert out["https://a.com/x"]["keeper_id"] == "doc-a"
    assert out["https://c.com/"]["keeper_id"] == "doc-c"


def test_url_dedup_null_urls_emit_no_keeper(spark):
    from logai_spark.functions.textops import url_dedup

    rows = [(0, "https://a.com/x"), (1, None), (2, None)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = url_dedup(df).collect()
    # NULL urls must NOT collapse into one group with a single survivor
    assert len(out) == 1 and out[0]["url_norm"] == "https://a.com/x"
