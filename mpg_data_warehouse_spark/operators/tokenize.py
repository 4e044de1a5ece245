"""Subword tokenization (WordPiece-style greedy longest-match) as
pure JVM column math — token-ACCURATE budget accounting for packing
and corpus-mix rebalancing, which at 100 TB are set in subword
tokens, not whitespace words.

Algorithm (public: Schuster & Nakajima 2012; the BERT WordPiece
variant): per whitespace word, repeatedly take the LONGEST vocab
piece matching the current position — word-initial pieces match
verbatim, continuations match with a ``##`` prefix; a position with
no match makes the whole word one ``[UNK]``. The reference repo has
no tokenizer (its notebooks never touch text at this grain); this
module extends the engine's text family the way
``operators/text.py::tokens`` (reference src/csv_to_bq.py's
whitespace splits) began it.

Scale design — three ideas keep this off the slow path:

* **Word-grain memoization.** Tokenization is a pure function of the
  word, so the corpus explodes to (pos, word), the DISTINCT word
  table (≪ corpus token count — Heaps' law) is tokenized once, and
  results join back and regroup in order. Two shuffles total, both
  at word grain.
* **Vocab as a broadcast MAP.** The vocabulary folds into a single
  ``map<string,int>`` row (``map_from_entries``) cross-joined
  broadcast — pieces are probed with ``element_at`` inside codegen.
  Data, not a plan literal, so a 100 k-piece vocab costs one ~MB
  broadcast, not a megabyte of SQL.
* **In-row greedy loop, zero UDFs.** The per-word while-loop is a
  bounded ``aggregate`` over ``sequence(1, max_word_len)`` (each
  step consumes ≥ 1 char); the inner longest-match scans candidate
  prefixes longest-first with ``filter(transform(...))[1]``. A
  single-element-array ``aggregate`` serves as the let-binding SQL
  lambdas lack, so the match is computed once per step. All lambda
  variables carry distinct names (nested named-lambda scoping).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "subword_tokenize",
    "subword_token_count",
    "tokenize_words",
    "learn_bpe_vocab",
]

DEFAULT_UNK = "[UNK]"


def _wordpiece_expr(
    word_col: str,
    vmap_col: str,
    max_word_len: int,
    max_piece_len: int,
    unk: str,
) -> Column:
    """array<string> of pieces for one word column (greedy longest
    match against the map column), or [unk] when the word is
    untokenizable or over ``max_word_len`` chars (the BERT long-word
    rule)."""
    if "'" in unk or "\\" in unk:
        raise ValueError("unk token must not contain quotes/backslashes")
    for ident in (word_col, vmap_col):
        if "`" in ident:
            raise ValueError(f"column name {ident!r} must not contain `")
    # backtick-quote the interpolated identifiers: a column named
    # "word 1" or a reserved word would otherwise fail to parse (or
    # resolve to the wrong column) deep inside the aggregate
    word_col = f"`{word_col}`"
    vmap_col = f"`{vmap_col}`"
    inner_match = f"""try_element_at(
      filter(
        transform(sequence(least(length(acc.rem), {max_piece_len}), 1, -1),
                  pl -> CASE WHEN size(acc.toks) = 0
                             THEN substr(acc.rem, 1, pl)
                             ELSE concat('##', substr(acc.rem, 1, pl))
                        END),
        cand -> element_at({vmap_col}, cand) IS NOT NULL),
      1)"""
    step = f"""(acc, st) -> CASE
      WHEN acc.bad OR length(acc.rem) = 0 THEN acc
      ELSE aggregate(
        array({inner_match}),
        acc,
        (a2, best) -> CASE
          WHEN best IS NULL
          THEN named_struct('rem', a2.rem, 'toks', a2.toks, 'bad', true)
          ELSE named_struct(
            'rem', substr(a2.rem,
                          (CASE WHEN size(a2.toks) = 0 THEN length(best)
                                ELSE length(best) - 2 END) + 1),
            'toks', array_append(a2.toks, best),
            'bad', false)
        END)
    END"""
    return F.expr(
        f"""CASE
          WHEN length({word_col}) = 0 OR length({word_col}) > {max_word_len}
          THEN array('{unk}')
          ELSE aggregate(
            sequence(1, {max_word_len}),
            named_struct('rem', {word_col},
                         'toks', cast(array() as array<string>),
                         'bad', false),
            {step},
            accf -> CASE WHEN accf.bad OR length(accf.rem) > 0
                         THEN array('{unk}')
                         ELSE accf.toks END)
        END"""
    )


def _match_len(piece: str) -> int:
    """Characters of the WORD a piece consumes when matched (the
    ``##`` continuation prefix is surface convention, not content)."""
    return len(piece) - 2 if piece.startswith("##") else len(piece)


def _check_piece_lengths(vocab, max_piece_len: int) -> None:
    """Raise when a vocab piece can NEVER match because the greedy
    scanner only probes candidate lengths up to ``max_piece_len`` —
    otherwise the piece is silently dead (the word decomposes into
    shorter pieces or [UNK]) and the bug is invisible."""
    if isinstance(vocab, DataFrame):
        p = F.col(vocab.columns[0])
        row = (
            vocab.select(
                F.max(
                    F.length(p)
                    - F.when(p.startswith("##"), F.lit(2)).otherwise(F.lit(0))
                ).alias("_m")
            ).first()
        )
        longest = row["_m"] or 0
        if longest > max_piece_len:
            raise ValueError(
                f"vocab contains a piece matching {longest} chars but "
                f"max_piece_len={max_piece_len}: it would never match. "
                "Raise max_piece_len (learn_bpe_vocab can emit pieces "
                "up to its max_word_len)."
            )
    else:
        for piece in vocab:
            if _match_len(str(piece)) > max_piece_len:
                raise ValueError(
                    f"vocab piece {piece!r} matches "
                    f"{_match_len(str(piece))} chars but "
                    f"max_piece_len={max_piece_len}: it would never "
                    "match. Raise max_piece_len (learn_bpe_vocab can "
                    "emit pieces up to its max_word_len)."
                )


def _vocab_map(vocab, spark) -> DataFrame:
    """One-row frame holding the vocab as map<piece, 1>."""
    if isinstance(vocab, DataFrame):
        vdf = vocab.select(F.col(vocab.columns[0]).alias("piece"))
    else:
        vdf = spark.createDataFrame(
            [(str(p),) for p in vocab], "piece string"
        )
    return vdf.distinct().agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("piece"), F.lit(1)))
        ).alias("_vmap")
    )


def tokenize_words(
    words: DataFrame,
    vocab,
    word_col: str = "word",
    out_col: str = "pieces",
    max_word_len: int = 32,
    max_piece_len: int = 16,
    unk: str = DEFAULT_UNK,
) -> DataFrame:
    """(word → pieces) at word grain — the memoizable core. ``vocab``
    is a piece list or a one-column DataFrame of pieces. Raises if any
    vocab piece exceeds ``max_piece_len`` match characters (it could
    never be emitted — see ``_check_piece_lengths``)."""
    _check_piece_lengths(vocab, max_piece_len)
    vmap = _vocab_map(vocab, words.sparkSession)
    return words.crossJoin(F.broadcast(vmap)).withColumn(
        out_col,
        _wordpiece_expr(word_col, "_vmap", max_word_len, max_piece_len, unk),
    ).drop("_vmap")


def subword_tokenize(
    df: DataFrame,
    vocab,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "pieces",
    lowercase: bool = True,
    max_word_len: int = 32,
    max_piece_len: int = 16,
    unk: str = DEFAULT_UNK,
) -> DataFrame:
    """Append ``out_col``: the document's subword pieces in order.
    ``id_col`` must be unique per row (it keys the order-preserving
    regroup). Empty/whitespace-only documents get an empty array."""
    base = F.trim(F.col(text_col))
    if lowercase:
        base = F.lower(base)
    words = F.filter(F.split(base, r"\s+"), lambda t: t != F.lit(""))
    exploded = df.select(
        F.col(id_col), F.posexplode_outer(words).alias("_pos", "_w")
    )
    distinct_words = (
        exploded.filter(F.col("_w").isNotNull()).select("_w").distinct()
    )
    word_pieces = tokenize_words(
        distinct_words,
        vocab,
        word_col="_w",
        out_col="_wp",
        max_word_len=max_word_len,
        max_piece_len=max_piece_len,
        unk=unk,
    )
    per_doc = (
        exploded.join(word_pieces, "_w", "left")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.filter(
                        F.array_sort(
                            F.collect_list(F.struct("_pos", "_wp"))
                        ),
                        lambda e: e["_pos"].isNotNull(),
                    ),
                    lambda e: e["_wp"],
                )
            ).alias(out_col)
        )
    )
    return df.join(per_doc, id_col, "left").withColumn(
        out_col,
        F.coalesce(F.col(out_col), F.array().cast("array<string>")),
    )


def subword_token_count(
    df: DataFrame,
    vocab,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "n_subword_tokens",
    **kw,
) -> DataFrame:
    """Append the subword token COUNT — the budget column
    ``sampling.budget_rebalance_sample`` (pass it as ``weight``) and
    any packing-budget accounting should use at 100 TB instead of
    whitespace word counts."""
    pieces = subword_tokenize(
        df, vocab, id_col=id_col, text_col=text_col, out_col="_sw_p", **kw
    )
    return pieces.withColumn(
        out_col, F.size("_sw_p").cast("long")
    ).drop("_sw_p")


def learn_bpe_vocab(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 100,
    min_pair_count: int = 2,
    lowercase: bool = True,
    max_word_len: int = 32,
    checkpoint_every: int = 16,
) -> tuple[list[tuple[str, str, str]], list[str]]:
    """Learn a WordPiece-compatible vocabulary from the corpus by
    byte-pair-encoding merges (Sennrich et al. 2016 — the public BPE
    recipe): start from characters, repeatedly merge the most
    frequent adjacent symbol pair, stop after ``n_merges`` or when no
    pair reaches ``min_pair_count``. Returns ``(merges, vocab)`` —
    merges as (left, right, merged) in application order, and the
    vocab (alphabet pieces + merged pieces) directly consumable by
    ``subword_tokenize``/``tokenize_words``. Learned pieces can grow
    up to ``max_word_len`` match characters, while the tokenizers
    default ``max_piece_len=16`` — pass them
    ``max_piece_len=max_word_len`` (or the actual longest piece) when
    consuming a learned vocab; ``tokenize_words`` raises on the
    mismatch rather than silently never matching the long pieces.

    Pieces use the WordPiece surface convention (word-initial
    verbatim, continuations ``##``-prefixed), so greedy
    longest-match tokenization against the returned vocab composes
    with the rest of this module. (Greedy matching does not replay
    the merge ORDER — the standard practice: BPE learns the vocab,
    WordPiece-style matching applies it.)

    Scale shape: the corpus collapses to the DISTINCT-WORD frequency
    table up front (Heaps' law — sublinear in corpus size; exactly
    how the reference BPE implementation trains on a word-frequency
    dict), and every merge round is one pair-count aggregate over
    that word table plus a one-row collect — the corpus text is
    never touched again. Iterative lineage is cut with
    ``localCheckpoint`` every ``checkpoint_every`` rounds (the same
    pattern as the connected-components loop in dedup). At 100 TB,
    train on a sample or a capped word table — the merges ARE the
    model; ``n_merges`` one-row collects is the driver traffic.
    """
    if checkpoint_every < 1:
        raise ValueError(
            "checkpoint_every must be >= 1 (it bounds the iterative "
            f"lineage between localCheckpoints); got {checkpoint_every}"
        )
    spark = df.sparkSession
    base = F.trim(F.col(text_col))
    if lowercase:
        base = F.lower(base)
    words = (
        df.select(F.explode(F.split(base, r"\s+")).alias("_w"))
        .filter((F.col("_w") != "") & (F.length("_w") <= max_word_len))
        .groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    # initial segmentation: [c0, ##c1, ##c2, ...]
    chars = F.split(F.col("_w"), "")
    segs = F.transform(
        chars,
        lambda c, i: F.when(i == 0, c).otherwise(F.concat(F.lit("##"), c)),
    )
    table = words.select("_w", "_n", segs.alias("_segs")).localCheckpoint()

    # alphabet from the INITIAL segmentation — a symbol whose every
    # occurrence later merges away must still be in the vocab, or an
    # unseen word needing it over-UNKs (standard BPE keeps the base
    # alphabet)
    alphabet = {
        r["_s"]
        for r in table.select(F.explode("_segs").alias("_s"))
        .distinct()
        .collect()
    }

    # guard single-symbol words: sequence(1, 0) counts DOWN in Spark
    # (step −1 inferred), indexing past the array under ANSI
    pair_structs = F.expr(
        """CASE WHEN size(_segs) < 2 THEN
             cast(array() as array<struct<a string, b string>>)
           ELSE
             transform(sequence(1, size(_segs) - 1),
                       pi -> struct(element_at(_segs, pi) AS a,
                                    element_at(_segs, pi + 1) AS b))
           END"""
    )
    merges: list[tuple[str, str, str]] = []
    for step in range(n_merges):
        top = (
            table.select(F.explode(pair_structs).alias("_p"), "_n")
            .groupBy("_p")
            .agg(F.sum("_n").alias("_c"))
            .orderBy(F.col("_c").desc(), F.col("_p.a"), F.col("_p.b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["_c"] < min_pair_count:
            break
        a, b = top[0]["_p"]["a"], top[0]["_p"]["b"]
        merged = a + (b[2:] if b.startswith("##") else b)
        merges.append((a, b, merged))
        # left-to-right single-pass merge of adjacent (a, b) — the
        # fold matches the reference implementation's re.sub pass
        # ("aaa" under (a,a) becomes [aa, a], not [a, aa])
        la, lb, lm = (F.lit(a), F.lit(b), F.lit(merged))
        new_segs = F.aggregate(
            F.col("_segs"),
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == la)
                & (x == lb),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(lm)
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        table = table.select("_w", "_n", new_segs.alias("_segs"))
        if (step + 1) % checkpoint_every == 0:
            table = table.localCheckpoint()

    vocab = sorted(alphabet | {m[2] for m in merges})
    return merges, vocab
