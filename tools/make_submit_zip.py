"""Build the --py-files archive for cluster submission.

Usage:  python tools/make_submit_zip.py [out.zip]

Produces a zip of the ``taxahfe_spark`` package (sources only, no caches)
suitable for:

    spark-submit --py-files taxahfe_spark.zip \
        --master <cluster-master> \
        run_hfe.py run-hfe METADATA DATA [options]

where ``run_hfe.py`` is any driver script that calls
``taxahfe_spark.cli.main([...], spark=spark)`` — pass ``master=None`` to
``taxahfe_spark.get_spark`` (or build the session yourself) so spark-submit's
cluster configuration wins. The engine itself has no local-mode assumptions:
every operator is expressed against the DataFrame API, per-partition state
lives in checkpoint manifests (checkpointing.py), and all randomness derives
from (seed, key) hashes, so a resumed or re-scheduled cluster run reproduces
the same results.
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "taxahfe_spark.zip")
    pkg = os.path.join(ROOT, "taxahfe_spark")
    n = 0
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(pkg):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for f in sorted(filenames):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(dirpath, f)
                z.write(full, os.path.relpath(full, ROOT))
                n += 1
    print(f"{out}: {n} modules")


if __name__ == "__main__":
    main()
