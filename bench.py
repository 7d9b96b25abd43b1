"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line
{"metric", "value", "unit", "queries", "sf", ...}.

--scaling runs the identical suite at local[8] and local[32] on the same
input and reports throughput at both plus scaling efficiency
eta = throughput(32) / (4 * throughput(8)) — the sandbox proxy for the
north rule's N vs 4N executor criterion (see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _suite(spark, sf_dir: str) -> dict[str, tuple[float, int]]:
    """name -> (seconds, output_rows). Each query is fully materialized via
    a count over the final frame (no driver collect of data)."""
    import __spark_entry__ as em

    headline = [
        "hfe_rollup",
        "hfe_filters",
        "asof_events_orders",
        "asof_events_orders_salted",
        "sessionize_events",
        "session_stats_events",
        "locf_events",
        "lag_lead_events",
        "tokenize_docs",
        "token_rollup_docs",
        "pit_token_features",
        "minhash_dedup_docs",
        "cosine_topk_embeddings",
        "hfe_collapse",
    ]
    qs = em.queries()
    out: dict[str, tuple[float, int]] = {}
    for name in headline:
        t0 = time.time()
        rows = qs[name](spark, sf_dir).count()
        out[name] = (round(time.time() - t0, 3), rows)
        print(f"# {name}: {out[name][0]}s {rows} rows", file=sys.stderr, flush=True)
    return out


def run_once(cpus: int, sf_dir: str) -> dict:
    from taxahfe_spark.session import get_spark

    spark = get_spark(
        f"bench_{cpus}", master=f"local[{cpus}]", shuffle_partitions=max(8, cpus)
    )
    try:
        # warm the JVM/Python-worker pools so the measurement is steady-state
        spark.range(1000000).selectExpr("sum(id)").collect()
        res = _suite(spark, sf_dir)
    finally:
        spark.stop()
    total_sec = round(sum(s for s, _ in res.values()), 3)
    total_rows = sum(r for _, r in res.values())
    return {
        "cpus": cpus,
        "total_sec": total_sec,
        "total_rows": total_rows,
        "rows_per_sec": round(total_rows / total_sec, 1),
        "queries": {k: s for k, (s, _) in res.items()},
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    if "--scaling" in sys.argv:
        lo = run_once(8, sf_dir)
        hi = run_once(32, sf_dir)
        eta = round(hi["rows_per_sec"] / (4 * lo["rows_per_sec"]), 3)
        print(
            json.dumps(
                {
                    "metric": "feature_rows_per_sec_scaling",
                    "value": eta,
                    "unit": "efficiency",
                    "local8": lo,
                    "local32": hi,
                    "sf": sf,
                }
            )
        )
        return
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    r = run_once(cpus, sf_dir)
    print(
        json.dumps(
            {
                "metric": "bench_suite_wall_seconds",
                "value": r["total_sec"],
                "unit": "sec",
                "queries": r["queries"],
                "sf": sf,
                "rows_per_sec": r["rows_per_sec"],
                "total_rows": r["total_rows"],
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
