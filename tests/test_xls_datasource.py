"""The PySpark-4 Python DataSource wrapping the BIFF .xls reader:
standard `spark.read.format("xls")` surface, one partition per file,
header-drift strictness, lineage/_row_idx contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_rj_spark.sinks.xls_legacy import write_xls
from etl_rj_spark.sources.xls_datasource import register_xls_source


def _write(path, rows, header=("cliente", "total")):
    write_xls(str(path), {"Hoja1": [list(header)] + [list(r) for r in rows]})


def test_xls_datasource_reads_glob_one_partition_per_file(spark, tmp_path):
    _write(tmp_path / "a.xls", [["acme", "1,000.50"], ["beta", "7"]])
    _write(tmp_path / "b.xls", [["gamma", "9"]])
    register_xls_source(spark)
    df = spark.read.format("xls").option("path", f"{tmp_path}/*.xls").load()
    rows = sorted((r.cliente, r.total, r._row_idx) for r in df.collect())
    assert rows == [("acme", "1,000.50", 0), ("beta", "7", 1), ("gamma", "9", 0)]
    # one input partition per file — the distributed-read contract
    assert df.rdd.getNumPartitions() == 2
    assert df.select(F.count_distinct("_file")).collect()[0][0] == 2


def test_xls_datasource_sheet_by_name_and_numeric_cells(spark, tmp_path):
    write_xls(
        str(tmp_path / "m.xls"),
        {
            "Resumen": [["x"], ["ignored"]],
            "Ventas": [["k", "v"], ["a", 1.5], ["b", 2]],
        },
    )
    register_xls_source(spark)
    df = (
        spark.read.format("xls")
        .option("path", f"{tmp_path}/m.xls")
        .option("sheet", "Ventas")
        .load()
    )
    got = {(r.k, r.v) for r in df.collect()}
    # cells surface as strings; typed parse kernels own coercion
    assert got == {("a", "1.5"), ("b", "2")}


def test_xls_datasource_header_drift_fails_loudly(spark, tmp_path):
    _write(tmp_path / "a.xls", [["acme", "1"]])
    _write(tmp_path / "b.xls", [["x"]], header=("other",))
    register_xls_source(spark)
    df = spark.read.format("xls").option("path", f"{tmp_path}/*.xls").load()
    with pytest.raises(Exception, match="schema drift|does not match"):
        df.collect()


def test_xls_datasource_missing_files_and_option(spark, tmp_path):
    register_xls_source(spark)
    with pytest.raises(Exception, match="matched no files"):
        spark.read.format("xls").option("path", f"{tmp_path}/none/*.xls").load()


def test_xls_datasource_streaming_only_new_files(spark, tmp_path):
    """readStream.format('xls'): each trigger delivers exactly the
    files not yet in the committed offset — manifest semantics at the
    DataSource level."""
    drop = tmp_path / "drop"
    drop.mkdir()
    _write(drop / "a.xls", [["acme", "1"]])
    register_xls_source(spark)
    ck = str(tmp_path / "ck")

    def drain():
        (
            spark.readStream.format("xls")
            .option("path", f"{drop}/*.xls")
            .load()
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    drain()
    got = spark.read.parquet(str(tmp_path / "out"))
    assert {r.cliente for r in got.collect()} == {"acme"}
    # second file arrives; next drain delivers ONLY it
    _write(drop / "b.xls", [["beta", "2"]])
    drain()
    rows = sorted((r.cliente, r.total) for r in
                  spark.read.parquet(str(tmp_path / "out")).collect())
    assert rows == [("acme", "1"), ("beta", "2")]
    # a third drain with nothing new appends nothing
    drain()
    assert spark.read.parquet(str(tmp_path / "out")).count() == 2
