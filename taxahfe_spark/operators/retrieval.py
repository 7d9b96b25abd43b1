"""Lexical retrieval over the documents table: TF-IDF weights and BM25
ranking, pure built-ins end to end.

A training-data pipeline needs lexical retrieval in two places: picking
in-domain documents for a target task (quality/topicality filters scored by
BM25 against a task description), and building retrieval-augmented eval
sets. Both reduce to sparse (doc, term) statistics that Spark's aggregate
engine computes without any Python in the hot path.

Graft operators (SURVEY LLM-pipeline family); the reference R engine has no
retrieval surface. Tokenization reuses tokens.words (TOKEN_RE ASCII split)
so every statistic is engine-independent and the DuckDB oracle replays the
whole scoring chain in SQL.

Scale shapes (10^12 docs):

- ``bm25_topk``: the query's terms are a LITERAL array (bytes, not a
  DataFrame), so the postings build filters the exploded word stream to
  |query| terms AT THE SCAN — the per-term postings that reach the
  (doc, word) aggregate are matching-docs-sized, never corpus-sized. The
  corpus constants (N, avgdl) come from one map-side-combinable aggregate
  over doc lengths (8-byte rows). Per-term document frequencies are at
  most |query| rows — driver-collected by construction. The final top-k is
  ``orderBy().limit(k)`` = TakeOrderedAndProject: per-partition heap top-k,
  merged on the driver, no global sort, no one-task window.
- ``tfidf_weights``: one exploded-word aggregate builds tf; df derives from
  tf (no second corpus scan). The vocab-sized df join is AQE's call — its
  size is only known post-shuffle, the textbook adaptive-broadcast case.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from taxahfe_spark.tokens import TOKEN_RE, words


def query_terms(query: str) -> list[str]:
    """The query-side tokenization: same split as tokens.words, distinct
    terms in first-seen order (BM25 scores each distinct term once)."""
    seen: dict[str, None] = {}
    for w in re.split(TOKEN_RE, query.lower()):
        if w:
            seen.setdefault(w, None)
    return list(seen)


def tfidf_weights(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sparse TF-IDF matrix as (id_col, word, tf, df, tfidf) rows.

    tf is the raw in-document count; idf is the smooth
    ``ln((1 + N) / (1 + df)) + 1`` (sklearn's smooth_idf form — never
    divides by zero, engine-independent); tfidf = tf * idf, unnormalized
    (callers needing L2-normalized rows divide by the per-doc norm, one
    more window-free aggregate).

    Plan: one explode into the (id, word) tf aggregate (map-side
    combinable), then df is DERIVED from tf — ``tf`` already holds one row
    per distinct (doc, word), so document frequency is a plain count over
    it, never a second corpus scan. The df-side join is left to AQE: the
    vocab frame's size is only known post-shuffle, which is exactly the
    case adaptive broadcast conversion exists for (no forced-broadcast
    hint to bypass the planner's size check — ADVICE r6 convention).
    """
    n_docs = docs.select(F.countDistinct(id_col).alias("n")).collect()[0]["n"]
    tf = (
        words(docs.select(id_col, text_col), text_col)
        .select(F.col(id_col), F.explode("words").alias("word"))
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log((F.lit(1.0) + F.lit(float(n_docs))) / (F.lit(1.0) + F.col("df"))) + F.lit(1.0)
    return tf.join(dfreq, "word").select(
        id_col,
        "word",
        "tf",
        "df",
        (F.col("tf") * idf).alias("tfidf"),
    )


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    materialize: bool = True,
) -> DataFrame:
    """Top-``k`` documents for ``query`` under BM25 (Robertson/Okapi, the
    standard ``idf = ln(1 + (N - df + 0.5) / (df + 0.5))`` non-negative
    form). Returns (id_col, score) ordered by (score desc, id asc) — the id
    tiebreak makes the cut deterministic across engines and layouts.

    score(d) = sum over distinct query terms t of
        idf(t) * tf(t,d) * (k1 + 1) / (tf(t,d) + k1 * (1 - b + b * dl(d)/avgdl))

    Plan: corpus constants (N, avgdl) from one length aggregate; the word
    stream is filtered to the literal query-term array BEFORE the tf
    aggregate, so only matching postings shuffle; per-term df is <= |query|
    rows. Docs matching no term score 0 and are not returned (standard
    sparse-retrieval semantics).

    ``materialize=True`` (default) eagerly localCheckpoints the k-row
    result so the slim per-doc cache can be unpersisted before returning —
    the retrieval call is terminal by nature. ``materialize=False`` returns
    the lazy plan (the slim frame stays persisted until the context
    cleaner collects it) — used by plan-shape tests to audit the
    TakeOrderedAndProject cut.
    """
    import math

    terms = query_terms(query)
    if not terms:
        raise ValueError("query has no tokens after normalization")
    term_arr = F.array(*[F.lit(t) for t in terms])
    # ONE corpus scan: per doc, length + (word, tf) pairs for matched query
    # terms only — ~16 bytes/row for non-matching docs, no text, no full
    # word arrays. Everything downstream (corpus constants, per-term df,
    # scoring) reads this persisted slim frame.
    slim = (
        words(docs.select(id_col, text_col), text_col)
        .select(
            id_col,
            F.size("words").alias("dl"),
            F.transform(
                F.array_intersect(F.array_distinct("words"), term_arr),
                lambda t: F.struct(
                    t.alias("word"),
                    F.size(
                        F.filter("words", lambda w: w == t)
                    ).alias("tf"),
                ),
            ).alias("tfs"),
        )
        .persist()
    )
    try:
        stats = slim.agg(
            F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
        ).collect()[0]
        if not stats["n"]:
            raise ValueError("empty corpus")
        n_docs, avgdl = float(stats["n"]), float(stats["avgdl"])
        posting = slim.select(
            id_col, "dl", F.explode("tfs").alias("kv")
        ).select(id_col, "dl", F.col("kv.word").alias("word"), F.col("kv.tf").alias("tf"))
        # one row per (doc, term) by construction -> df is a plain count;
        # at most |query| result rows, driver-sized by definition
        dfreq = {
            r["word"]: r["df"]
            for r in posting.groupBy("word").agg(F.count(F.lit(1)).alias("df")).collect()
        }
        idf_map = F.map_from_arrays(
            F.array(*[F.lit(t) for t in dfreq]),
            F.array(
                *[
                    F.lit(math.log(1.0 + (n_docs - dfreq[t] + 0.5) / (dfreq[t] + 0.5)))
                    for t in dfreq
                ]
            ),
        )
        contrib = (
            F.element_at(idf_map, F.col("word"))
            * F.col("tf")
            * (k1 + 1.0)
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl)))
        )
        out = (
            posting.withColumn("__c", contrib)
            .groupBy(id_col)
            .agg(F.sum("__c").alias("score"))
            .orderBy(F.col("score").desc(), F.col(id_col).asc())
            .limit(k)
        )
        if materialize:
            out = out.localCheckpoint(eager=True)  # k rows; frees slim below
    finally:
        if materialize:
            slim.unpersist()
    return out
