"""Subword tokenizer (WordPiece greedy longest-match): hand-computed
fixtures, a pure-Python reference cross-check on arbitrary inputs,
and the token-budget integration with corpus-mix rebalancing."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from mpg_data_warehouse_spark.operators.tokenize import (
    subword_token_count,
    subword_tokenize,
    tokenize_words,
)

VOCAB = [
    "un", "##aff", "##able", "aff", "the", "run", "##ning", "##n",
    "a", "##b", "b", "runn", "##ing",
]


def _ref_wordpiece(word, vocab, max_word_len=32, max_piece_len=16,
                   unk="[UNK]"):
    """Pure-Python reference of the same algorithm."""
    if len(word) == 0 or len(word) > max_word_len:
        return [unk]
    vset = set(vocab)
    out, pos = [], 0
    while pos < len(word):
        best = None
        for plen in range(min(len(word) - pos, max_piece_len), 0, -1):
            cand = word[pos:pos + plen]
            if pos > 0:
                cand = "##" + cand
            if cand in vset:
                best = cand
                break
        if best is None:
            return [unk]
        out.append(best)
        pos += len(best) - 2 if pos > 0 else len(best)
    return out


def test_wordpiece_hand_fixture(spark):
    """The canonical WordPiece example plus greedy-vs-optimal: greedy
    takes 'runn' + '##ing' because 'runn' is the LONGEST first match,
    even though 'run' + '##ning' also exists."""
    words = spark.createDataFrame(
        [Row(word=w) for w in ["unaffable", "running", "the", "xyzzy"]]
    )
    got = {
        r.word: r.pieces
        for r in tokenize_words(words, VOCAB).collect()
    }
    assert got["unaffable"] == ["un", "##aff", "##able"]
    assert got["running"] == ["runn", "##ing"]
    assert got["the"] == ["the"]
    assert got["xyzzy"] == ["[UNK]"]


def test_subword_tokenize_documents(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="unaffable the running"),
            Row(doc_id=2, text="  THE  Unaffable  "),  # trim + lowercase
            Row(doc_id=3, text=""),  # empty doc -> empty array
            Row(doc_id=4, text="xyz ab"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.pieces for r in subword_tokenize(df, VOCAB).collect()}
    assert got[1] == ["un", "##aff", "##able", "the", "runn", "##ing"]
    assert got[2] == ["the", "un", "##aff", "##able"]
    assert got[3] == []
    assert got[4] == ["[UNK]", "a", "##b"]
    counts = {
        r.doc_id: r.n_subword_tokens
        for r in subword_token_count(df, VOCAB).collect()
    }
    assert counts == {1: 6, 2: 4, 3: 0, 4: 3}


def test_overlong_word_is_unk_and_vocab_dataframe_accepted(spark):
    vdf = spark.createDataFrame([Row(piece=p) for p in VOCAB])
    words = spark.createDataFrame(
        [Row(word="a" * 33), Row(word="a" * 32)]
    )
    got = {
        r.word: r.pieces
        for r in tokenize_words(words, vdf).collect()
    }
    assert got["a" * 33] == ["[UNK]"]
    # 32 chars is within the cap: 'a' then 31 continuations would need
    # '##a' which is absent -> UNK through the match path instead
    assert got["a" * 32] == ["[UNK]"]


_word_st = st.text(alphabet="abnfiurg", min_size=0, max_size=12)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(words=st.lists(_word_st, min_size=1, max_size=15))
def test_wordpiece_matches_python_reference(spark, words):
    """Engine output == pure-Python reference for arbitrary words over
    a vocab with rich prefix overlaps."""
    df = spark.createDataFrame([Row(word=w) for w in set(words)],
                               "word string")
    got = {r.word: r.pieces for r in tokenize_words(df, VOCAB).collect()}
    for w in set(words):
        assert got[w] == _ref_wordpiece(w, VOCAB), w


def test_rebalance_on_subword_budget(spark):
    """budget_rebalance_sample driven by the subword count column —
    the token-accurate budget path. Every kept row is from the input,
    and the over-budget stratum is down-sampled while the tiny one is
    kept whole."""
    from mpg_data_warehouse_spark.operators.sampling import (
        budget_rebalance_sample,
    )

    rows = [
        Row(doc_id=i, source="big", text="unaffable running the")
        for i in range(40)
    ] + [Row(doc_id=100, source="small", text="the")]
    df = spark.createDataFrame(rows)
    counted = subword_token_count(df, VOCAB)
    out = budget_rebalance_sample(
        counted, "source", "doc_id", "n_subword_tokens",
        target_per_stratum=60.0,
    )
    kept = out.groupBy("source").agg(
        F.sum("n_subword_tokens").alias("w"), F.count("*").alias("n")
    )
    got = {r.source: (r.w, r.n) for r in kept.collect()}
    assert got["small"] == (1, 1)  # under budget: kept whole
    # big stratum: 40 docs x 6 tokens = 240, budget 60 -> ~1/4 kept
    assert 0 < got["big"][1] < 40


def test_weird_column_names_are_quoted(spark):
    """Identifier with a space (and a reserved word) must work — the
    SQL expression quotes what it interpolates."""
    words = spark.createDataFrame(
        [Row(**{"word 1": "unaffable"}), Row(**{"word 1": "the"})]
    )
    got = {
        r["word 1"]: r.pieces
        for r in tokenize_words(words, VOCAB, word_col="word 1").collect()
    }
    assert got["unaffable"] == ["un", "##aff", "##able"]
    assert got["the"] == ["the"]
    bad = spark.createDataFrame([Row(word="x")])
    with pytest.raises(ValueError, match="must not contain"):
        tokenize_words(bad, VOCAB, word_col="wo`rd")


def test_overlong_vocab_piece_raises(spark):
    """A piece the greedy scanner can never probe (match length >
    max_piece_len) must raise, not silently never match."""
    words = spark.createDataFrame([Row(word="hi")])
    long_piece = "x" * 20
    with pytest.raises(ValueError, match="never match"):
        tokenize_words(words, ["h", "##i", long_piece], max_piece_len=16)
    # a ##-prefixed piece only consumes len-2 chars: 18 chars OK at 16
    ok = ["h", "##i", "##" + "y" * 16]
    assert tokenize_words(words, ok, max_piece_len=16).count() == 1
    # DataFrame vocab path checks too
    vdf = spark.createDataFrame([Row(piece=p) for p in ["h", long_piece]])
    with pytest.raises(ValueError, match="never match"):
        tokenize_words(words, vdf, max_piece_len=16)
    # sized correctly, the long piece is usable
    got = tokenize_words(
        spark.createDataFrame([Row(word=long_piece)]),
        ["h", long_piece],
        max_piece_len=20,
    ).collect()
    assert got[0].pieces == [long_piece]


# --- BPE vocab learning -------------------------------------------------


def _ref_bpe(word_counts, n_merges, min_pair_count=2):
    """Pure-Python reference of the same algorithm (Sennrich 2016
    recipe on a word-frequency dict, WordPiece surface pieces, same
    deterministic tie-break: count desc then (a, b) ascending)."""
    segs = {
        w: [w[0]] + ["##" + c for c in w[1:]] for w in word_counts
    }
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, n in word_counts.items():
            s = segs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), c = best
        if c < min_pair_count:
            break
        merged = a + (b[2:] if b.startswith("##") else b)
        merges.append((a, b, merged))
        for w, s in segs.items():
            out = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = merged
                else:
                    out.append(x)
            segs[w] = out
    alphabet = {
        p for w in word_counts for p in ([w[0]] + ["##" + c for c in w[1:]])
    }
    return merges, sorted(alphabet | {m[2] for m in merges})


def test_bpe_learns_textbook_merges(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="low lower lowest low low"),
            Row(doc_id=2, text="new newer newest new"),
        ]
    )
    from mpg_data_warehouse_spark.operators.tokenize import learn_bpe_vocab

    merges, vocab = learn_bpe_vocab(docs, n_merges=4, min_pair_count=2)
    assert merges[0] == ("##o", "##w", "##ow")
    assert ("l", "##ow", "low") in merges
    assert "low" in vocab and "new" in vocab
    # base alphabet survives even when fully merged away
    assert "##o" in vocab and "##w" in vocab
    # learned vocab composes with the tokenizer
    out = {r.doc_id: r.pieces for r in subword_tokenize(docs, vocab).collect()}
    assert out[1][:1] == ["low"]
    assert "[UNK]" not in out[1] + out[2]  # every trained word tokenizes


def test_bpe_matches_python_reference(spark):
    corpus = [
        "aba abba abab bab",
        "cab cabs scab scabs",
        "aba aba abba x",
    ]
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(corpus)]
    )
    from collections import Counter

    from mpg_data_warehouse_spark.operators.tokenize import learn_bpe_vocab

    wc = Counter(w for t in corpus for w in t.split())
    for n_merges in (1, 3, 8):
        got_m, got_v = learn_bpe_vocab(
            docs, n_merges=n_merges, min_pair_count=2
        )
        ref_m, ref_v = _ref_bpe(dict(wc), n_merges, min_pair_count=2)
        assert got_m == ref_m, n_merges
        assert got_v == ref_v, n_merges


def test_bpe_stops_below_min_pair_count(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="abc def ghi")]  # every pair unique
    )
    from mpg_data_warehouse_spark.operators.tokenize import learn_bpe_vocab

    merges, vocab = learn_bpe_vocab(docs, n_merges=10, min_pair_count=2)
    assert merges == []
    # vocab is exactly the alphabet pieces
    assert "a" in vocab and "##b" in vocab and "g" in vocab


def test_bpe_rejects_nonpositive_checkpoint_every(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="aa aa")])
    from mpg_data_warehouse_spark.operators.tokenize import learn_bpe_vocab

    with pytest.raises(ValueError, match="checkpoint_every"):
        learn_bpe_vocab(docs, checkpoint_every=0)
    with pytest.raises(ValueError, match="checkpoint_every"):
        learn_bpe_vocab(docs, checkpoint_every=-1)
