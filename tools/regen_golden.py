"""Regenerate the frozen hfe_collapse golden (constant-VALUES oracle input).

The full RF collapse is bit-deterministic at fixed seed (see
tests/test_competition.py determinism suite), so its sf0.01 output can be
frozen and served to the driver's correctness gate as a VALUES table
(__spark_entry__._hfe_collapse_oracle). Re-run this after ANY intentional
change to collapse semantics, then re-run
pytest tests/test_competition.py -k frozen_golden.

Usage: python tools/regen_golden.py
"""
import sys, json, gzip, os
sys.path.insert(0, "/root/repo")
from taxahfe_spark.session import get_spark
import __spark_entry__ as em
spark = get_spark("golden", master="local[8]", shuffle_partitions=8)
df = em.q_hfe_collapse(spark, "/root/testdata/sf0.01")
cols = df.columns
rows = [ [r[c] for c in cols] for r in df.collect() ]
rows.sort(key=lambda x: str(x[0]))
# non-finite doubles would render as invalid SQL literals in the VALUES
# oracle (lit(float('nan')) -> 'nan'); refuse to freeze such a golden
import math
for ri, row in enumerate(rows):
    for ci, v in enumerate(row):
        if isinstance(v, float) and not math.isfinite(v):
            sys.exit(f"non-finite double at row {ri} col {cols[ci]}: {v!r} "
                     "— fix upstream or extend _hfe_collapse_oracle to emit "
                     "CAST('NaN' AS DOUBLE) literals before freezing")
print("cols:", cols[:5], "...", len(cols), "ncols")
print("rows:", len(rows))
print("dtypes:", df.dtypes[:6])
# independent certification (ADVICE r4): refuse to freeze unless the
# pure-pandas dual implementation (tests/oracle_collapse.py — shares only
# the seeded-RNG contract) agrees on the winner set. This makes the golden
# a certified value oracle, not a self-produced drift gate.
sys.path.insert(0, "/root/repo/tests")
from oracle_collapse import oracle_collapse
long, meta = em.supplier_hierarchy(spark, "/root/testdata/sf0.01")
ostate = oracle_collapse(
    meta.toPandas(), long.toPandas(),
    filter_prevalence=0.05, lowest_level=1, nperm=4, num_trees=5,
    seed=42, super_filter_nperm_factor=4,
)
oracle_cols = {p.replace("|", "_") for p in ostate.loc[ostate["winner"], "path"]}
engine_cols = {c for c in cols if c not in ("subject_id", "feature_of_interest")}
if oracle_cols != engine_cols:
    sys.exit(
        "REFUSING to freeze: engine winner set disagrees with the "
        f"independent oracle — engine-only={sorted(engine_cols - oracle_cols)[:5]} "
        f"oracle-only={sorted(oracle_cols - engine_cols)[:5]}"
    )
print("independent oracle certifies the winner set:", len(oracle_cols), "columns")
os.makedirs("/root/repo/taxahfe_spark/golden", exist_ok=True)
with gzip.open("/root/repo/taxahfe_spark/golden/hfe_collapse_sf001.json.gz", "wt") as f:
    json.dump({"columns": cols, "types": [t for _, t in df.dtypes], "rows": rows}, f)
# second run for determinism check
df2 = em.q_hfe_collapse(spark, "/root/testdata/sf0.01")
rows2 = [ [r[c] for c in cols] for r in df2.collect() ]
rows2.sort(key=lambda x: str(x[0]))
print("deterministic:", rows == rows2)
spark.stop()
