"""Text-analysis operators: tokenization, quality, lang-ID,
fingerprint invariances."""

from __future__ import annotations

from pyspark.sql import Row

from pyspark.sql import functions as F
from mpg_data_warehouse_spark.operators import text as X


def test_token_counts(spark):
    df = spark.createDataFrame([Row(text="the quick  brown fox"), Row(text="a")])
    got = [r.n for r in df.select(X.token_count("text").alias("n")).collect()]
    assert got == [4, 1]


def test_bpe_ish_tokens_split_punct(spark):
    df = spark.createDataFrame([Row(text="hello, world! it's 42.")])
    toks = df.select(X.bpe_ish_tokens("text").alias("t")).collect()[0].t
    assert toks == ["hello", ",", "world", "!", "it", "'", "s", "42", "."]


def test_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta gamma"),
            Row(doc_id=2, text="gamma alpha beta alpha"),
            Row(doc_id=3, text="alpha beta delta"),
        ]
    )
    fps = {
        r.doc_id: r.fp
        for r in df.select("doc_id", X.doc_fingerprint("text").alias("fp")).collect()
    }
    assert fps[1] == fps[2]  # same token set → same fingerprint
    assert fps[1] != fps[3]


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat and the dog of to a house"),
            Row(doc_id=2, text="el gato y la casa de que y el perro"),
            Row(doc_id=3, text="der hund und die katze ist das gut"),
            Row(doc_id=4, text="le chat et les chiens des le la"),
        ]
    )
    got = {
        r.doc_id: r.lang
        for r in df.select("doc_id", X.lang_id("text").alias("lang")).collect()
    }
    assert got == {1: "en", 2: "es", 3: "de", 4: "fr"}


def test_quality_score_bands(spark):
    good = "the quick brown fox jumps over a lazy dog near the old river bank"
    short = "tiny doc"
    no_stop = "zzz qqq www eee rrr ttt yyy uuu iii ooo ppp aaa sss ddd"
    df = spark.createDataFrame(
        [Row(doc_id=1, text=good), Row(doc_id=2, text=short), Row(doc_id=3, text=no_stop)]
    )
    got = {
        r.doc_id: r.q
        for r in df.select("doc_id", X.quality_score("text").alias("q")).collect()
    }
    assert got[1] == 1.0
    assert got[2] < 1.0  # too short
    assert got[3] < 1.0  # no stopwords


def test_char_stats(spark):
    df = spark.createDataFrame([Row(text="ab, cd!")])
    row = X.char_stats(df).collect()[0]
    assert row.n_chars == 7
    assert row.n_tokens == 2
    assert row.punct_ratio == round(2 / 7, 4)


def test_rolling_fingerprint_order_sensitive(spark):
    from pyspark.sql import Row
    df = spark.createDataFrame([
        Row(doc_id=1, text="alpha beta gamma"),
        Row(doc_id=2, text="gamma beta alpha"),   # same tokens, reordered
        Row(doc_id=3, text="alpha beta gamma"),   # exact dup of 1
    ])
    fps = {r.doc_id: (r.roll, r.unordered) for r in df.select(
        "doc_id",
        X.rolling_fingerprint("text").alias("roll"),
        X.doc_fingerprint("text").alias("unordered"),
    ).collect()}
    assert fps[1][0] == fps[3][0]           # dup → same rolling fp
    assert fps[1][0] != fps[2][0]           # reorder → different rolling fp
    assert fps[1][1] == fps[2][1]           # but same unordered fingerprint


def test_bpe_ish_token_count(spark):
    from pyspark.sql import Row
    df = spark.createDataFrame([Row(text="ab, cd!ef")])
    got = df.select(
        F.size(X.tokens("text")).alias("ws"),
        F.size(X.bpe_ish_tokens("text")).alias("bpe"),
    ).collect()[0]
    assert got.ws == 2
    assert got.bpe == 5  # ab , cd ! ef


def test_term_counts_and_tfidf_small(spark):
    from mpg_data_warehouse_spark.operators.text import term_counts, tfidf

    docs = spark.createDataFrame(
        [("a", "cat sat on the mat"), ("b", "cat cat dog"), ("c", "dog runs")],
        ["doc_id", "text"],
    )
    tc = {r.term: r.n for r in term_counts(docs).collect()}
    assert tc["cat"] == 3 and tc["dog"] == 2 and tc["mat"] == 1
    tf = tfidf(docs)
    row = tf.filter("doc_id = 'b' and term = 'cat'").first()
    assert row.tf == 2 and row.doc_freq == 2
    # idf = ln(3/2); score = 2*ln(1.5)
    import math

    assert abs(row.tfidf - round(2 * math.log(3 / 2), 6)) < 1e-9
    # a term present in every doc scores 0
    assert tf.filter("term = 'cat' and tfidf != 0").count() == 2  # df=2 of 3


def test_redact_and_count(spark):
    from mpg_data_warehouse_spark.operators.text import redact, redaction_count

    docs = spark.createDataFrame(
        [("a", "mail me at bob@example.com or call 5551234567"),
         ("b", "no pii here")],
        ["doc_id", "text"],
    )
    out = docs.select(
        "doc_id",
        redaction_count("text").alias("n"),
        redact("text").alias("clean"),
    ).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id["a"].n == 2
    assert "bob@example.com" not in by_id["a"].clean
    assert "5551234567" not in by_id["a"].clean
    assert by_id["a"].clean.count("[REDACTED]") == 2
    assert by_id["b"].n == 0 and by_id["b"].clean == "no pii here"


def test_norm_tokens_drops_empties(spark):
    from pyspark.sql import functions as F

    from mpg_data_warehouse_spark.operators.text import norm_tokens

    df = spark.createDataFrame([("  Hello   WORLD ",), ("",)], ["text"])
    got = [r.t for r in df.select(norm_tokens("text").alias("t")).collect()]
    assert got[0] == ["hello", "world"]
    assert got[1] == []


# ---------------------------------------------------------------------------
# linear quality classifier (NB log-odds weights)
# ---------------------------------------------------------------------------


def _qc_corpora(spark):
    from pyspark.sql import Row

    pos = spark.createDataFrame(
        [
            Row(doc_id=i, text=t)
            for i, t in enumerate(
                [
                    "the committee published detailed findings today",
                    "researchers measured consistent improvements in yield",
                    "the study reports detailed methodology and findings",
                    "analysis of the survey data shows clear trends",
                ]
            )
        ]
    )
    neg = spark.createDataFrame(
        [
            Row(doc_id=i, text=t)
            for i, t in enumerate(
                [
                    "click here buy now free free free",
                    "winner winner click subscribe buy cheap",
                    "free prize click now buy buy",
                    "subscribe now cheap prize winner click",
                ]
            )
        ]
    )
    return pos, neg


def test_nb_weights_separate_classes(spark):
    from mpg_data_warehouse_spark.operators.text import nb_term_weights

    pos, neg = _qc_corpora(spark)
    weights, bias = nb_term_weights(pos, neg)
    w = {r.term: r.weight for r in weights.collect()}
    assert w["findings"] > 0 and w["detailed"] > 0
    assert w["click"] < 0 and w["free"] < 0
    # balanced classes -> zero prior
    assert abs(bias) < 1e-9
    # shared term ('the' never appears in neg here, so pick 'now'... absent
    # from pos): strictly negative
    assert w["now"] < 0


def test_quality_classifier_scores_rank_docs(spark):
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.text import (
        nb_term_weights,
        quality_classifier_scores,
    )

    pos, neg = _qc_corpora(spark)
    weights, bias = nb_term_weights(pos, neg)
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the findings show detailed improvements"),
            Row(doc_id=2, text="click now free prize"),
            Row(doc_id=3, text="zzz qqq unseen-vocab"),  # OOV only
            Row(doc_id=4, text=""),  # empty
        ]
    )
    got = {
        r.doc_id: r
        for r in quality_classifier_scores(
            docs, weights, bias=bias
        ).collect()
    }
    assert got[1].quality_keep and got[1].quality_p > 0.9
    assert not got[2].quality_keep and got[2].quality_p < 0.1
    # OOV and empty docs fall back to the prior: p = sigmoid(bias) = 0.5
    assert abs(got[3].quality_p - 0.5) < 1e-9
    assert abs(got[4].quality_p - 0.5) < 1e-9
    # all four docs survive the scoring join
    assert len(got) == 4


def test_quality_classifier_is_jvm_only(spark):
    from mpg_data_warehouse_spark.operators.text import (
        nb_term_weights,
        quality_classifier_scores,
    )

    pos, neg = _qc_corpora(spark)
    weights, bias = nb_term_weights(pos, neg)
    plan = (
        quality_classifier_scores(pos, weights, bias=bias)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_compression_ratio_flags_repetitive_text(spark):
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.text import (
        with_compression_ratio,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="spam " * 400),
            Row(
                doc_id=2,
                text="The committee reviewed seventeen distinct proposals "
                "covering watershed restoration, pollinator habitat, and "
                "long-term soil monitoring across the property. " * 4,
            ),
            Row(doc_id=3, text=""),
        ]
    )
    got = {r.doc_id: r.compress_ratio for r in with_compression_ratio(docs).collect()}
    assert got[1] < 0.05          # pure repetition collapses
    assert got[2] > got[1]        # prose compresses less
    assert got[3] is None         # empty -> null, never div-by-zero


def test_strip_boilerplate_keeps_null_metadata_and_empty_docs(spark):
    from pyspark.sql import Row

    from mpg_data_warehouse_spark.operators.text import (
        strip_boilerplate_lines,
    )

    boiler = "subscribe to our newsletter"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, url="a.com", text=f"real content\n{boiler}"),
            Row(doc_id=2, url=None, text=f"other words\n{boiler}"),
            Row(doc_id=3, url="c.com", text=boiler),  # all boilerplate
        ]
    )
    out = {r.doc_id: r for r in strip_boilerplate_lines(docs, 2).collect()}
    assert set(out) == {1, 2, 3}           # nobody vanishes
    assert out[2].text == "other words"    # null-metadata row intact
    assert out[3].text == ""               # fully-boilerplate -> empty
    assert out[3].n_lines_removed == 1
