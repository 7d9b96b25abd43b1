"""Runtime evidence for the north rule's `spark-submit --py-files` launch
path: build the real taxahfe_spark.zip with tools/make_submit_zip.py, then
launch a driver through spark-submit FROM A CLEAN WORKING DIRECTORY (the
repo itself is not importable there), so the package genuinely resolves
from the --py-files archive — the same mechanics a multi-executor cluster
submission uses.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = '''
import sys

# fail loudly if the REPO leaked onto the path: the whole point is that
# taxahfe_spark resolves from the --py-files zip, as on a cluster
sys.path = [p for p in sys.path if not p.rstrip("/").endswith("repo")]

from pyspark.sql import SparkSession

spark = SparkSession.builder.getOrCreate()  # spark-submit's conf wins
import taxahfe_spark
from taxahfe_spark.tokens import chunk_sequences, dedup_sequences

assert "taxahfe_spark.zip" in taxahfe_spark.__file__, taxahfe_spark.__file__

rows = [
    ("a", [1, 2, 3, 4, 5], 5, "s"),
    ("b", [1, 2, 3, 4, 5], 5, "s"),   # exact duplicate of a
    ("c", [9, 8], 2, "s"),
]
df = spark.createDataFrame(
    rows, "doc_id string, tokens array<int>, n_tok int, source string"
)
kept = dedup_sequences(df)
chunks = chunk_sequences(kept, max_len=3)
n_kept, n_chunks = kept.count(), chunks.count()
assert n_kept == 2, n_kept
assert n_chunks == 3, n_chunks  # a: [1,2,3],[4,5]; c: [9,8]
print(f"SUBMIT_OK kept={n_kept} chunks={n_chunks}")
spark.stop()
'''


def _spark_submit() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    import pyspark

    p = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return p if os.path.exists(p) else None


@pytest.mark.skipif(_spark_submit() is None, reason="spark-submit not on this box")
def test_spark_submit_py_files_end_to_end(tmp_path):
    zip_path = tmp_path / "taxahfe_spark.zip"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_submit_zip.py"), str(zip_path)],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr
    assert zip_path.exists() and zip_path.stat().st_size > 10_000

    driver = tmp_path / "driver.py"
    driver.write_text(DRIVER)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # nothing from the repo leaks in
    r = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zip_path),
            str(driver),
        ],
        cwd=str(tmp_path),  # NOT the repo: import must come from the zip
        env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "SUBMIT_OK kept=2 chunks=3" in r.stdout, r.stdout[-2000:]
