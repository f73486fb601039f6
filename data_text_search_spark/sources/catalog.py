"""Table catalog abstraction (SURVEY §7 sandbox constraint).

The north rule targets Iceberg tables of source-code repositories. This
sandbox has no Iceberg runtime jar, so the engine talks to a minimal
catalog contract — `read_table / write_table / commit_snapshot /
snapshots` — with two implementations:

- `IcebergCatalog`: activates when the Iceberg Spark runtime is on the
  classpath (`spark.sql.catalog...` configured); tables are referenced
  by identifier and snapshot commits are Iceberg's own.
- `ParquetDirCatalog` (default here): emulates the same contract with
  parquet data directories plus a JSON `_snapshots.json` log per table
  (append-only: snapshot id, timestamp-free lineage of input paths, row
  count). This keeps engine code catalog-agnostic and honest about the
  contract without the runtime dependency.

Engine jobs accept either; `get_catalog(spark)` picks automatically.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class ParquetDirCatalog:
    """Parquet directories + JSON snapshot log under a warehouse root."""

    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    def _table_dir(self, name: str) -> str:
        return os.path.join(self.warehouse, *name.split("."))

    def _snap_log(self, name: str) -> str:
        return os.path.join(self._table_dir(name), "_snapshots.json")

    def read_table(self, name: str) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self._table_dir(name), "data"))

    def write_table(self, df: DataFrame, name: str, mode: str = "overwrite",
                    partition_by: list[str] | None = None) -> str:
        tdir = self._table_dir(name)
        data = os.path.join(tdir, "data")
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(data)
        return self.commit_snapshot(name, {"mode": mode})

    def commit_snapshot(self, name: str, info: dict | None = None) -> str:
        tdir = self._table_dir(name)
        os.makedirs(tdir, exist_ok=True)
        log = self._snap_log(name)
        snaps = self.snapshots(name)
        sid = uuid.uuid4().hex[:16]
        n_rows = None
        data = os.path.join(tdir, "data")
        if os.path.exists(data):
            n_rows = self.spark.read.parquet(data).count()
        snaps.append({"snapshot_id": sid, "rows": n_rows,
                      "parent": snaps[-1]["snapshot_id"] if snaps else None,
                      **(info or {})})
        tmp = log + ".tmp"
        with open(tmp, "w") as f:
            json.dump(snaps, f, indent=1)
        os.replace(tmp, log)
        return sid

    def snapshots(self, name: str) -> list[dict]:
        log = self._snap_log(name)
        if not os.path.exists(log):
            return []
        with open(log) as f:
            return json.load(f)


class IcebergCatalog:
    """Thin adapter over a configured Iceberg catalog (same contract)."""

    def __init__(self, spark: SparkSession, catalog_name: str = "spark_catalog"):
        self.spark = spark
        self.catalog_name = catalog_name

    def read_table(self, name: str) -> DataFrame:
        return self.spark.read.format("iceberg").load(f"{self.catalog_name}.{name}")

    def write_table(self, df: DataFrame, name: str, mode: str = "overwrite",
                    partition_by: list[str] | None = None) -> str:
        w = df.writeTo(f"{self.catalog_name}.{name}")
        if partition_by:
            from pyspark.sql import functions as F
            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        (w.createOrReplace() if mode == "overwrite" else w.append())
        return self.snapshots(name)[-1]["snapshot_id"]

    def snapshots(self, name: str) -> list[dict]:
        rows = self.spark.sql(
            f"SELECT snapshot_id, parent_id FROM "
            f"{self.catalog_name}.{name}.snapshots ORDER BY committed_at"
        ).collect()
        return [{"snapshot_id": str(r["snapshot_id"]),
                 "parent": str(r["parent_id"]) if r["parent_id"] else None}
                for r in rows]


def iceberg_available(spark: SparkSession) -> bool:
    try:
        # py4j attribute access is lazy (returns a JavaPackage even for
        # missing classes) — force real classloading
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def get_catalog(spark: SparkSession, warehouse: str = "/tmp/warehouse"):
    if iceberg_available(spark):
        return IcebergCatalog(spark)
    return ParquetDirCatalog(spark, warehouse)
