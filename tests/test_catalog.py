"""Catalog abstraction: parquet-dir implementation of the Iceberg contract."""

from __future__ import annotations

import pandas as pd

from data_text_search_spark.sources.catalog import (
    ParquetDirCatalog,
    get_catalog,
    iceberg_available,
)


def test_catalog_roundtrip_and_snapshots(spark, tmp_path):
    cat = ParquetDirCatalog(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame(pd.DataFrame({"a": [1, 2, 3]}))
    s1 = cat.write_table(df, "db.t1")
    got = cat.read_table("db.t1")
    assert got.count() == 3
    s2 = cat.write_table(df.filter("a > 1"), "db.t1")
    snaps = cat.snapshots("db.t1")
    assert [s["snapshot_id"] for s in snaps] == [s1, s2]
    assert snaps[1]["parent"] == s1
    assert snaps[1]["rows"] == 2


def test_get_catalog_picks_parquet_fallback(spark, tmp_path):
    # no Iceberg runtime jar in this sandbox → parquet emulation
    assert not iceberg_available(spark)
    cat = get_catalog(spark, str(tmp_path / "wh2"))
    assert isinstance(cat, ParquetDirCatalog)
