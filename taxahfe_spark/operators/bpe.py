"""Distributed byte-pair-encoding tokenizer training + corpus encoding
(Sennrich et al. 2016), Spark-first.

The classic BPE observation makes this cluster-friendly: training never
needs the corpus — it needs the DISTINCT-WORD COUNT TABLE, which is
vocab-sized (10^6-10^8 rows at web scale) while the corpus is 10^12 rows.
So the plan is:

  1. ONE corpus scan aggregates (word, count)          [corpus-sized shuffle
     of 8-byte-ish keys, map-side combined]
  2. the merge loop iterates on the vocab-sized symbol frame: each step is
     one map-side-combinable pair-count aggregate + a TakeOrdered(1) argmax
     + an in-task fold applying the merge (F.aggregate — pure built-ins,
     whole-stage codegen, NO Python). localCheckpoint every few steps cuts
     the growing expression lineage.
  3. encoding runs the learned merge list over the DISTINCT words only
     (vocab-sized Arrow-vectorized pandas UDF — the sanctioned exception),
     then the corpus is tokenized by a broadcast word->pieces join + the
     tokenize re-assembly idiom. Encode cost is O(vocab) Python +
     O(corpus) JVM join — the 100 TB shape.

Merge-application semantics (pinned, documented): merges apply left-to-
right greedily, one merge pair at a time, IN LEARNED ORDER — exactly the
fold used during training, so train and encode agree by construction (the
pytest independent oracle re-derives both from scratch in pure Python with
a different code shape).

Determinism: argmax tiebreak is (count desc, a asc, b asc); ids/order
never depend on partition layout.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from taxahfe_spark.tokens import words as _words


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus scan -> (word, count). The only corpus-sized stage in BPE
    training; map-side combine keeps the exchange small."""
    return (
        _words(docs, text_col)
        .select(F.explode("words").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _char_syms(word_col: str = "word") -> F.Column:
    """word -> array of single characters (in-task projection)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(word_col)),
        lambda i: F.col(word_col).substr(i, F.lit(1)),
    )


def _merge_fold(syms_col, a: str, b: str) -> F.Column:
    """Greedy left-to-right replacement of adjacent (a, b) with a+b via
    F.aggregate — in-task, built-ins only. try_element_at: ANSI-safe on
    the empty accumulator."""
    merged = a + b
    return F.aggregate(
        syms_col,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.try_element_at(acc, F.lit(-1)) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _adjacent_pairs(syms_col: str) -> F.Column:
    return F.when(
        F.size(syms_col) >= 2,
        F.transform(
            F.sequence(F.lit(2), F.size(syms_col)),
            lambda i: F.struct(
                F.element_at(F.col(syms_col), i - 1).alias("a"),
                F.element_at(F.col(syms_col), i).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))


def bpe_train(
    wc: DataFrame,
    num_merges: int,
    min_pair_count: int = 2,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn up to ``num_merges`` merges from a (word, count) frame.

    Each step: weighted adjacent-pair count over the vocab-sized symbol
    frame (map-side combined), TakeOrdered(1) argmax with the pinned
    tiebreak, then the in-task fold applies the winner. Stops early when
    the best pair's weighted count drops below ``min_pair_count``.
    Returns the merge list in learned order.
    """
    cur = wc.select(
        F.col("count").cast("long").alias("count"), _char_syms("word").alias("syms")
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for step in range(num_merges):
        top = (
            cur.filter(F.size("syms") >= 2)
            .select("count", F.explode(_adjacent_pairs("syms")).alias("__p"))
            .groupBy(F.col("__p.a").alias("a"), F.col("__p.b").alias("b"))
            .agg(F.sum("count").alias("c"))
            .orderBy(F.col("c").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["c"] < min_pair_count:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        cur = cur.withColumn("syms", _merge_fold(F.col("syms"), a, b))
        if (step + 1) % checkpoint_every == 0:
            # truncate the fold-expression lineage (same discipline as
            # dedup.connected_components)
            cur = cur.localCheckpoint(eager=True)
    return merges


def _apply_merges(word: str, merges: list[tuple[str, str]]) -> list[str]:
    syms = list(word)
    for a, b in merges:
        out: list[str] = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        syms = out
    return syms


def bpe_encode_words(
    distinct_words: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """(word) -> (word, pieces array<string>): the learned merge list
    applied per DISTINCT word — the only Python stage, Arrow-vectorized,
    vocab-sized input by construction."""
    mlist = list(merges)

    @F.pandas_udf(ArrayType(StringType()))
    def enc(col: pd.Series) -> pd.Series:
        return col.map(lambda w: _apply_merges(w, mlist))

    return distinct_words.select("word", enc("word").alias("pieces"))


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus encoding: (id_col, pieces array<string>, n_pieces int).

    Python touches only the distinct-word frame; the corpus-sized work is
    a broadcast word->pieces join over the posexploded word stream plus
    the order-preserving re-assembly (array_sort((pos, pieces)) ->
    flatten) — shuffle keys are scalars and per-word piece arrays, never
    documents."""
    dw = _words(docs, text_col)
    piece_map = bpe_encode_words(
        dw.select(F.explode("words").alias("word")).distinct(), merges
    )
    exploded = dw.select(id_col, F.posexplode("words").alias("pos", "word"))
    joined = exploded.join(F.broadcast(piece_map), "word", "inner")
    return (
        joined.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("pieces")))
            ).alias("_pp")
        )
        .withColumn("pieces", F.flatten(F.transform("_pp", lambda s: s["pieces"])))
        .select(id_col, "pieces", F.size("pieces").cast("int").alias("n_pieces"))
    )
