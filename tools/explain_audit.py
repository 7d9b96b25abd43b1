"""Physical-plan audit: assert the scale-determining plan properties hold.

The properties below are what actually decide 100 TB behavior (predicate
pushdown, column pruning, broadcast vs shuffle joins, Exchange reuse across
the window chain, whole-stage codegen in the hot path). This script checks
them MECHANICALLY from `.explain`-level plan text, so plan regressions fail
loudly instead of silently costing a shuffle.

Usage: python tools/explain_audit.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from taxahfe_spark.session import get_spark

    spark = get_spark("explain_audit", master="local[8]", shuffle_partitions=8)
    failures: list[str] = []

    def check(name: str, ok: bool, detail: str = "") -> None:
        print(f"{'OK  ' if ok else 'FAIL'} {name}" + (f" ({detail})" if detail else ""))
        if not ok:
            failures.append(name)

    # 1. predicate pushdown + column pruning reach the parquet scan
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") <= "1995-01-01").select("l_orderkey", "l_quantity")
    p = plan(q)
    check(
        "scan pushdown: filter reaches parquet",
        "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p,
    )
    check(
        "scan pruning: 3-column ReadSchema for a 16-column table",
        "ReadSchema: struct<l_orderkey" in p and "l_extendedprice" not in p.split("ReadSchema")[1],
    )

    # 2. small-dim join is broadcast, not shuffled
    cu = spark.read.parquet(f"{sf_dir}/customer.parquet")
    na = spark.read.parquet(f"{sf_dir}/nation.parquet")
    p = plan(cu.join(F.broadcast(na), cu.c_nationkey == na.n_nationkey))
    check("dim join: BroadcastHashJoin", "BroadcastHashJoin" in p)

    # 3. the composed window chain (sessionize -> lag/lead -> LOCF) reuses
    #    ONE Exchange for the shared (user_id) partitioning
    from taxahfe_spark.operators.windows import lag_lead_features, locf, sessionize

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    chain = locf(
        lag_lead_features(
            sessionize(ev, "user_id", "ts", 3600.0, tiebreak="event_id"),
            "user_id", "ts", ["value"], tiebreak="event_id",
        ).withColumn("cv", F.when(F.col("event_type") == "click", F.col("value"))),
        "user_id", "ts", ["cv"], tiebreak="event_id",
    )
    p = plan(chain)
    n_exchange = p.count("Exchange hashpartitioning")
    check("window chain: single Exchange", n_exchange == 1, f"found {n_exchange}")

    # 4. as-of join (union strategy): one shuffle total, no join operator
    from taxahfe_spark.operators.asof import asof_join

    snap = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy(F.col("o_custkey").alias("user_id"), F.col("o_orderdate").alias("snap_ts"))
        .agg(F.max("o_totalprice").alias("o_totalprice"))
    )
    p = plan(
        asof_join(
            ev.select("event_id", "user_id", "ts"), snap, on="user_id",
            left_ts="ts", right_ts="snap_ts", value_cols=["o_totalprice"],
            strategy="union",
        )
    )
    check(
        "as-of union strategy: no SortMergeJoin (union+window instead)",
        "SortMergeJoin" not in p,
    )

    # 5. rollup: map-side partial aggregation before the exchange
    from taxahfe_spark.taxonomy import hierarchical_rollup

    long = spark.createDataFrame(
        [("a|b|c", "e1", 1.0), ("a|b|d", "e1", 2.0)],
        "clade_name string, entity_id string, value double",
    )
    p = plan(hierarchical_rollup(long, checkpoint=False))
    check(
        "rollup: partial_sum before the exchange (map-side combine)",
        "partial_sum" in p,
    )

    # 6. whole-stage codegen covers the text/token hot path (no Python UDFs)
    from taxahfe_spark.tokens import tokenize

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = plan(tokenize(docs, "text", "doc_id"))
    check("tokenize: no Python row UDFs", "BatchEvalPython" not in p)
    # AQE prints codegen spans as "*(n)" only inside finalized (sub)plans;
    # the top-level AdaptiveSparkPlan is not final before execution
    check("tokenize: whole-stage codegen spans present", "*(" in p)

    # 7. minhash: no exchange between the pre-explode respread and the
    #    partial aggregation (the explode/hash pipeline stays fused)
    from taxahfe_spark.operators.dedup import minhash_signatures

    p = plan(minhash_signatures(docs))
    check("minhash: partial min agg before exchange", "partial_min" in p)

    # 8. dietML path: NO unpartitioned window anywhere (an unpartitioned
    #    windowspecdefinition starts with an ORDER col, i.e. "col#N ASC|DESC";
    #    a partitioned one lists partition cols first) — the round-2 global
    #    ntile/rank trio funnelled every row through one task
    import re

    def unpartitioned_windows(p: str) -> list[str]:
        return re.findall(r"windowspecdefinition\(\w+#\d+L? (?:ASC|DESC)", p)

    from taxahfe_spark.dietml import fold_assignments, stratified_split
    from taxahfe_spark.functions.metrics import midrank_frame

    ev_num = ev.select(
        F.col("event_id").cast("string").alias("subject_id"),
        F.col("value").alias("feature_of_interest"),
    )
    p = plan(stratified_split(ev_num, feature_type="numeric"))
    check("dietML strata: no unpartitioned window", not unpartitioned_windows(p))
    p = plan(fold_assignments(ev_num, feature_type="numeric", folds=3, repeats=2))
    check("dietML folds: no unpartitioned window", not unpartitioned_windows(p))
    pred = ev.select(
        F.when(F.col("event_type") == "click", "a").otherwise("b").alias("truth"),
        (F.col("value") / (F.col("value") + 1)).alias("prob"),
    )
    p = plan(midrank_frame(pred, "truth", "prob", "a"))
    check("AUC midranks: no unpartitioned window", not unpartitioned_windows(p))
    check("AUC midranks: no SinglePartition exchange", "SinglePartition" not in p)

    # 9. IVF ANN: the inverted-list probing is fused into the corpus scan —
    #    zero Exchange before the mapInPandas scorer (the only shuffle in the
    #    whole query is the final bounded top-k window over local-top-k rows)
    from taxahfe_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    p = plan(ivf_topk(emb.filter("vec_id < 5"), emb, k=3, n_centroids=4, nprobe=2))
    scan_side = p.split("MapInPandas")[-1]  # plan text below the scorer
    check(
        "IVF: no Exchange between parquet scan and the scoring pass",
        "Exchange" not in scan_side,
    )
    n_exchange = p.count("Exchange hashpartitioning")
    check("IVF: exactly one Exchange total (final top-k window)", n_exchange == 1,
          f"found {n_exchange}")

    # 10. exact-dedup family: unique rows kept IN PLACE via broadcast anti
    #     join — the array/text payload never enters an exchange for unique
    #     rows; the ONLY exchange whose partitioning keys include the payload
    #     column is the dup-group tie-break window (dup rows only)
    from taxahfe_spark.operators.dedup import exact_dedup
    from taxahfe_spark.tokens import dedup_sequences, tokenize

    seqs = tokenize(docs, "text", "doc_id")
    p = plan(dedup_sequences(seqs))
    check("dedup_sequences: no SortMergeJoin anywhere", "SortMergeJoin" not in p)
    check(
        "dedup_sequences: broadcast LeftAnti keeps unique rows in place",
        "BroadcastHashJoin" in p and "LeftAnti" in p,
    )
    ex_keys = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", p)
    tok_ex = [k for k in ex_keys if "tokens#" in k]
    check(
        "dedup_sequences: tokens exchanged ONLY for the dup-group window",
        len(tok_ex) <= 1,
        f"payload-carrying exchanges: {tok_ex}",
    )
    p = plan(exact_dedup(docs))
    check("exact_dedup: no SortMergeJoin anywhere", "SortMergeJoin" not in p)
    check(
        "exact_dedup: broadcast LeftAnti keeps unique rows in place",
        "BroadcastHashJoin" in p and "LeftAnti" in p,
    )
    ex_keys = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", p)
    txt_ex = [k for k in ex_keys if "text#" in k]
    check(
        "exact_dedup: document text never enters an exchange",
        len(txt_ex) == 0,
        f"payload-carrying exchanges: {txt_ex}",
    )

    # 11. round-6 token-shape quality operators: the corpus-sized exchanged
    #     streams carry 8-byte keys/positions, never token arrays or text
    from taxahfe_spark.operators.textstats import repetition_stats
    from taxahfe_spark.tokens import substring_dedup, unigram_logprob

    p = plan(substring_dedup(seqs, k=3))
    ex_keys = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", p)
    tok_ex = [k for k in ex_keys if "tokens#" in k]
    check(
        "substring_dedup: token arrays never keyed into an exchange",
        len(tok_ex) == 0,
        f"payload-keyed exchanges: {tok_ex}",
    )
    check(
        "substring_dedup: dup-hash probe is a broadcast semi join",
        "BroadcastHashJoin" in p and "LeftSemi" in p,
    )
    p = plan(unigram_logprob(seqs))
    check(
        "unigram_logprob: frequency lookup is a broadcast join, no Python",
        "BroadcastHashJoin" in p
        and "mapInPandas" not in p
        and "BatchEvalPython" not in p,
    )
    p = plan(repetition_stats(docs))
    check(
        "repetition_stats: pure JVM (no Python eval) and no text in "
        "exchange keys",
        "BatchEvalPython" not in p
        and "mapInPandas" not in p
        and not [
            k
            for k in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", p)
            if "text#" in k
        ],
    )

    # 12. round-7 operators: retrieval top-k is a per-partition heap cut;
    #     budget_mix is a pure projection (zero Exchange above the scan);
    #     DSIR scoring joins the broadcast bucket-LM frame, no Python
    from taxahfe_spark.operators.retrieval import bm25_topk
    from taxahfe_spark.operators.selection import dsir_logweights
    from taxahfe_spark.tokens import budget_mix

    p = plan(bm25_topk(docs, "spark data engine", k=10, materialize=False))
    check(
        "bm25_topk: TakeOrderedAndProject cut, no Python in the hot path",
        "TakeOrderedAndProject" in p
        and "BatchEvalPython" not in p
        and "mapInPandas" not in p,
    )
    p = plan(
        budget_mix(
            docs.select("doc_id", "source", "n_chars"),
            budget_tokens=1e6, tau=0.7, ntok_col="n_chars",
        )
    )
    check(
        "budget_mix: pure projection — zero Exchange, zero Window, no Python",
        "Exchange" not in p and "Window" not in p and "BatchEvalPython" not in p,
    )
    p = plan(
        dsir_logweights(
            docs.select("doc_id", "text"),
            docs.select("doc_id", "text").limit(50),
            n_buckets=256,
        )
    )
    check(
        "dsir_logweights: broadcast bucket-LM join, no Python, no text in "
        "exchange keys",
        "BroadcastHashJoin" in p
        and "BatchEvalPython" not in p
        and not [
            k
            for k in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", p)
            if "text#" in k
        ],
    )

    # 13. round-7 second wave: bigram LM shuffles carry no arrays; the BPE
    #     merge fold is built-ins only; rolling_stats is ONE Exchange; CMS
    #     probes the broadcast cell grid
    from taxahfe_spark.operators.bpe import _char_syms, _merge_fold, word_counts
    from taxahfe_spark.operators.lm import bigram_logprob
    from taxahfe_spark.operators.windows import rolling_stats
    from taxahfe_spark.tokens import cms_token_counts, tokenize

    seqs = tokenize(docs.limit(200), "text", "doc_id")
    p = plan(bigram_logprob(seqs))
    check(
        "bigram_logprob: no Python, no token arrays in exchange keys",
        "BatchEvalPython" not in p
        and "mapInPandas" not in p
        and not [
            k
            for k in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", p)
            if "__tk#" in k or "tokens#" in k
        ],
    )
    cur = word_counts(docs).select("count", _char_syms("word").alias("syms"))
    p = plan(cur.withColumn("syms", _merge_fold(F.col("syms"), "a", "b")))
    check(
        "bpe merge step: in-task fold, zero Python eval",
        "BatchEvalPython" not in p and "PythonUDF" not in p,
    )
    p = plan(rolling_stats(ev, "user_id", "ts", "value", 3600))
    check(
        "rolling_stats: exactly one Exchange, no Python",
        len(re.findall(r"Exchange hashpartitioning", p)) == 1
        and "BatchEvalPython" not in p,
    )
    p = plan(cms_token_counts(seqs, width=256, depth=4))
    check(
        "cms_token_counts: broadcast cell-grid probe, no arrays in "
        "exchange keys",
        "BroadcastHashJoin" in p
        and not [
            k
            for k in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", p)
            if "tokens#" in k
        ],
    )

    spark.stop()
    if failures:
        print(f"\n{len(failures)} plan properties FAILED: {failures}")
        sys.exit(1)
    print("\nall plan properties hold")


if __name__ == "__main__":
    main()
