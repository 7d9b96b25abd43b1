"""Source connectors: parquet/csv/tsv/json now, Iceberg behind a gate.

The production layout for the 10^12-sequence table (north rule) is an
Iceberg table partitioned by ``days(ts)`` with a bucket on ``doc_id`` —
partition pruning handles the as-of time ranges, bucketing co-locates each
entity's timeline so the point-in-time window shuffles nothing across days
it does not read. The Iceberg runtime jar is not in this container, so the
connector is gated: it raises a clear error locally and works unchanged when
the jar + catalog conf are present on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TOKENIZED_SEQUENCE_SCHEMA = (
    "doc_id string, tokens array<int>, n_tok int, source string"
)

ICEBERG_TABLE_DDL = """
-- production DDL for the tokenized-sequence table (BASELINE.json input_hint)
CREATE TABLE IF NOT EXISTS {catalog}.{db}.sequences (
    doc_id  string,
    tokens  array<int>,
    n_tok   int,
    source  string,
    ts      timestamp
)
USING iceberg
PARTITIONED BY (days(ts), bucket(64, doc_id))
TBLPROPERTIES ('write.distribution-mode' = 'hash')
"""


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, path_or_table: str, fmt: str = "auto") -> DataFrame:
    """Unified reader. fmt: auto|parquet|csv|tsv|json|iceberg."""
    if fmt == "auto":
        if path_or_table.endswith(".parquet"):
            fmt = "parquet"
        elif path_or_table.endswith((".csv",)):
            fmt = "csv"
        elif path_or_table.endswith((".tsv", ".txt")):
            fmt = "tsv"
        elif path_or_table.endswith(".json"):
            fmt = "json"
        else:
            fmt = "iceberg"
    if fmt == "parquet":
        return spark.read.parquet(path_or_table)
    if fmt == "csv":
        return spark.read.option("header", True).csv(path_or_table)
    if fmt == "tsv":
        return spark.read.option("header", True).option("sep", "\t").csv(path_or_table)
    if fmt == "json":
        return spark.read.json(path_or_table)
    if fmt == "iceberg":
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime not on the classpath. Add "
                "org.apache.iceberg:iceberg-spark-runtime and a catalog conf "
                "(spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog); "
                "table layout DDL in sources.readers.ICEBERG_TABLE_DDL."
            )
        return spark.read.format("iceberg").load(path_or_table)
    raise ValueError(f"unknown format {fmt!r}")


def read_tokenized_sequences(
    spark: SparkSession, path_or_table: str, fmt: str = "auto"
) -> DataFrame:
    """Read the graft input table and enforce its schema contract."""
    df = read_table(spark, path_or_table, fmt)
    required = {"doc_id", "tokens", "n_tok", "source"}
    missing = required - set(df.columns)
    if missing:
        raise ValueError(f"tokenized-sequence table missing columns: {sorted(missing)}")
    return df
