"""XML source/sink: roundtrip fidelity (entity escaping, typed
read-back), the PERMISSIVE dead-letter contract, and the in-plan
``to_xml``/``from_xml`` kernels."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_rj_spark.sources.jsonl import quarantine_corrupt
from etl_rj_spark.sources.parquet import read_parquet_table
from etl_rj_spark.sources.xml import read_xml, write_xml, xml_encode, xml_extract


def test_xml_roundtrip_lossless(spark, sf_dir, tmp_path):
    d = str(tmp_path / "orders_xml")
    orders = read_parquet_table(spark, f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
        "o_orderpriority",
    )
    write_xml(orders, d, row_tag="order", root_tag="orders")
    schema = (
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string"
    )
    back = read_xml(spark, d, row_tag="order", schema=schema).select(*orders.columns)
    assert back.count() == orders.count()
    # exceptAll both ways: doubles must survive the text roundtrip
    # exactly (Java shortest round-trip repr)
    assert back.exceptAll(orders).count() == 0
    assert orders.exceptAll(back).count() == 0


def test_xml_entity_escaping(spark, tmp_path):
    d = str(tmp_path / "esc")
    df = spark.createDataFrame(
        [(1, 'a<b&c>"d\'e'), (2, "</row><row>injection attempt</row>")],
        "k int, v string",
    )
    write_xml(df, d)
    back = read_xml(spark, d, schema="k int, v string").select("k", "v")
    assert sorted((r.k, r.v) for r in back.collect()) == sorted(
        (r.k, r.v) for r in df.collect()
    )


def test_xml_corrupt_quarantine(spark, tmp_path):
    d = str(tmp_path / "bad")
    good = spark.createDataFrame([(1, "x"), (2, "y")], "k long, v string")
    write_xml(good, d)
    with open(os.path.join(d, "broken.xml"), "w") as f:
        f.write("<rows><row><k>not-a-long</k><v>z</v></row></rows>")
    ok, bad = quarantine_corrupt(read_xml(spark, d, schema="k long, v string"))
    assert bad.count() == 1
    assert sorted(r.k for r in ok.select("k").collect()) == [1, 2]
    # the raw broken element is preserved in the dead-letter rows
    # (quarantine_corrupt renames the corrupt column to raw_line)
    raw = bad.collect()[0].raw_line
    assert "not-a-long" in raw


def test_xml_schema_add_is_nondestructive(spark, tmp_path):
    # passing a StructType must not mutate the caller's schema object
    # (StructType.add mutates in place; read_xml must copy)
    d = str(tmp_path / "nd")
    write_xml(spark.createDataFrame([(1,)], "k long"), d)
    schema = T.StructType([T.StructField("k", T.LongType())])
    read_xml(spark, d, schema=schema).count()
    from etl_rj_spark.sources.xml import CORRUPT_COL

    assert CORRUPT_COL not in schema.fieldNames()


def test_xml_column_kernels_roundtrip(spark, sf_dir):
    nation = read_parquet_table(spark, f"{sf_dir}/nation.parquet")
    frag = nation.select(
        xml_encode(F.struct("n_nationkey", "n_name", "n_regionkey")).alias("x")
    )
    parsed = frag.select(
        xml_extract("x", "n_nationkey int, n_name string, n_regionkey int").alias("r")
    ).select("r.*")
    assert parsed.exceptAll(nation.select(*parsed.columns)).count() == 0
    # malformed fragment → null struct, not a task failure
    junk = spark.createDataFrame([("<not-xml",)], "x string")
    out = junk.select(xml_extract("x", "k int").alias("r")).collect()
    assert out[0].r is None or out[0].r.k is None
