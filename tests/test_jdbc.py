"""Live JDBC tests against embedded Apache Derby (bundled with the
Spark distribution) — the S5/S6 source reads and the K1 JDBC
incremental append, previously gated on "no database in container".
Derby is a real SQL database in the same JVM, so Spark's JDBC source/
sink runs its genuine code path: query pushdown, batched writes,
type mapping.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_rj_spark.sinks.incremental import append_incremental_jdbc
from etl_rj_spark.sources.jdbc import read_dim_table, read_key_projection
from etl_rj_spark.sources.parquet import read_parquet_table

PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture()
def derby_url(tmp_path):
    return f"jdbc:derby:{tmp_path}/db;create=true"


def _seed(spark, derby_url, table, df):
    df.write.format("jdbc").option("url", derby_url).option("dbtable", table).options(
        **PROPS
    ).mode("overwrite").save()


def test_jdbc_dim_read_projects_columns(spark, sf_dir, derby_url):
    """S5: the dimension read pushes its projection into the query —
    only the requested columns come back."""
    cust = read_parquet_table(spark, f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("ID_CLIENTE"),
        F.col("c_name").alias("NOMBRE_CLIENTE"),
        F.col("c_nationkey").alias("ID_ZONE"),
        F.col("c_acctbal").alias("BAL"),
    )
    _seed(spark, derby_url, "CLIENTES", cust)

    dim = read_dim_table(
        spark, derby_url, "CLIENTES", ["ID_CLIENTE", "NOMBRE_CLIENTE", "ID_ZONE"], PROPS
    )
    assert dim.columns == ["ID_CLIENTE", "NOMBRE_CLIENTE", "ID_ZONE"]  # BAL pruned at the DB
    assert dim.count() == cust.count()


def test_jdbc_key_projection_pushes_predicate(spark, sf_dir, derby_url):
    """S6: key projection with a WHERE clause evaluated by the
    database (wor2.py:232's `WHERE id_cliente = 0` move), and the
    partitioned-read path fans the cursor out across bounds."""
    orders = read_parquet_table(spark, f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("K1"),
        F.col("o_custkey").alias("K2"),
        F.col("o_totalprice").alias("PRICE"),
    )
    _seed(spark, derby_url, "FACTS", orders)

    keys = read_key_projection(
        spark, derby_url, "FACTS", ["K1", "K2"], predicate="K2 = 0", properties=PROPS
    )
    want = orders.filter(F.col("K2") == 0).count()
    assert keys.count() == want and keys.columns == ["K1", "K2"]

    fanned = read_key_projection(
        spark, derby_url, "FACTS", ["K1", "K2"], properties=PROPS,
        num_partitions=4, partition_column="K1", lower_bound=0, upper_bound=2000,
    )
    assert fanned.rdd.getNumPartitions() == 4
    assert fanned.count() == orders.count()


def test_jdbc_incremental_append_idempotent(spark, sf_dir, derby_url):
    """K1 (JDBC variant): anti-join against the database's key
    projection, batched append; re-running the same batch inserts 0
    (the reference's recovery invariant, Ventas PDF §9)."""
    orders = read_parquet_table(spark, f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("K"),
        F.col("o_totalprice").alias("PRICE"),
    )
    first = orders.filter(F.col("K") < 100)
    batch = orders.filter(F.col("K") < 150)  # 100-key overlap + 50 new
    _seed(spark, derby_url, "VENTAS", first)

    append_incremental_jdbc(batch, derby_url, "VENTAS", ["K"], properties=PROPS)
    n = (
        spark.read.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "VENTAS")
        .options(**PROPS)
        .load()
        .count()
    )
    assert n == 150

    append_incremental_jdbc(batch, derby_url, "VENTAS", ["K"], properties=PROPS)
    n2 = (
        spark.read.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "VENTAS")
        .options(**PROPS)
        .load()
        .count()
    )
    assert n2 == 150  # idempotent: nothing new inserted


def test_jdbc_merge_upsert_updates_and_inserts(spark, sf_dir, derby_url):
    """K1-upsert (MERGE): matched keys UPDATE their non-key columns,
    unmatched keys INSERT, one server-side transaction; re-delivering
    the same batch is a value-level no-op; NULL keys are refused."""
    from etl_rj_spark.sinks.incremental import upsert_jdbc

    orders = read_parquet_table(spark, f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("K"),
        (F.round(F.col("o_totalprice") * 100)).cast("long").alias("CENTS"),
    )
    _seed(spark, derby_url, "VENTAS_U", orders.filter(F.col("K") < 100))

    # corrected batch: existing keys re-priced (x2), 50 new keys
    batch = orders.filter(F.col("K") < 150).withColumn(
        "CENTS", F.col("CENTS") * 2
    )
    upsert_jdbc(batch, derby_url, "VENTAS_U", ["K"], properties=PROPS)

    def readback():
        return {
            (r.K, r.CENTS)
            for r in spark.read.format("jdbc")
            .option("url", derby_url)
            .option("dbtable", "VENTAS_U")
            .options(**PROPS)
            .load()
            .collect()
        }

    want = {(r.K, 2 * r.CENTS) for r in orders.filter(F.col("K") < 150).collect()}
    got = readback()
    assert got == want  # updates applied AND inserts landed

    upsert_jdbc(batch, derby_url, "VENTAS_U", ["K"], properties=PROPS)
    assert readback() == want  # redelivery is a value-level no-op

    bad = batch.withColumn("K", F.when(F.col("K") == 5, None).otherwise(F.col("K")))
    with pytest.raises(ValueError, match="NULL in key"):
        upsert_jdbc(bad, derby_url, "VENTAS_U", ["K"], properties=PROPS)


def test_jdbc_batch_error_localizes_source_rows(spark, derby_url):
    """A poisoned batch (VARCHAR overflow) raises JdbcBatchInsertError
    naming the batch's _row_idx range and the mapped source file lines
    (ventas_totales.py:236-262 parity), and the batches before the
    poisoned one stay committed (per-batch transactions)."""
    from etl_rj_spark.sinks.incremental import JdbcBatchInsertError

    # constrained target: V VARCHAR(5) (created empty via overwrite)
    empty = spark.createDataFrame([], "K INT, V STRING")
    (
        empty.write.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "FACTS_LOC")
        .option("createTableColumnTypes", "K INT, V VARCHAR(5)")
        .options(**PROPS)
        .mode("overwrite")
        .save()
    )
    rows = [(i, "ok", i) for i in range(25)]
    rows[17] = (17, "way too long for varchar5", 17)  # poison in 2nd batch
    batch = spark.createDataFrame(rows, "K INT, V STRING, _row_idx INT")

    with pytest.raises(JdbcBatchInsertError) as exc:
        append_incremental_jdbc(
            batch, derby_url, "FACTS_LOC", ["K"],
            batchsize=10, properties=PROPS,
            row_idx_col="_row_idx", source_line_offset=8,
        )
    err = exc.value
    assert err.row_idx_range == (10, 19)
    assert err.source_lines == (18, 27)  # +8: 6 junk + header + 1-based
    assert "FACTS_LOC" in str(err) and "lines 18-27" in str(err)

    committed = (
        spark.read.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "FACTS_LOC")
        .options(**PROPS)
        .load()
    )
    assert committed.count() == 10  # batch 0..9 committed before the failure


def test_legacy_xls_rejected_with_clear_error(spark, tmp_path):
    """A true BIFF .xls (OLE2 magic) gets an actionable error, not an
    opaque zip failure; a zip-content file mislabeled .xls loads."""
    from etl_rj_spark.pipelines.ventas import read_sales_export
    from etl_rj_spark.sinks.xlsx import write_xlsx

    biff = tmp_path / "legacy.xls"
    biff.write_bytes(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 64)
    with pytest.raises(ValueError, match="legacy BIFF .xls.*re-export"):
        read_sales_export(spark, str(biff))

    mislabeled = tmp_path / "mislabeled.xls"
    write_xlsx(str(mislabeled), [("T1", [["a", "b"], [1, "x"]])])
    df = read_sales_export(spark, str(mislabeled))
    assert df.columns == ["a", "b"] and df.count() == 1


def test_jdbc_batch_tied_row_idx_never_double_inserts(spark, derby_url):
    """Duplicate _row_idx values (per-file indices from a multi-file
    source) split by row_number across a batch boundary must each be
    written exactly once — batching attaches the dense batch id to the
    rows instead of re-filtering sparse index ranges, where adjacent
    [lo,hi] ranges would both match the tied boundary value."""
    empty = spark.createDataFrame([], "K INT, V STRING")
    (
        empty.write.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "FACTS_TIED")
        .options(**PROPS)
        .mode("overwrite")
        .save()
    )
    # 20 rows, every _row_idx duplicated (two "files" of 10): with
    # batchsize=4 each tied pair straddles a boundary somewhere
    rows = [(i, f"v{i}", i % 10) for i in range(20)]
    batch = spark.createDataFrame(rows, "K INT, V STRING, _row_idx INT")

    append_incremental_jdbc(
        batch, derby_url, "FACTS_TIED", ["K"],
        batchsize=4, properties=PROPS, row_idx_col="_row_idx",
    )
    written = (
        spark.read.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "FACTS_TIED")
        .options(**PROPS)
        .load()
    )
    assert written.count() == 20
    assert written.select("K").distinct().count() == 20


def _exec_sql(spark, url, sql):
    jvm = spark.sparkContext._jvm
    jvm.java.lang.Class.forName(PROPS["driver"])
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        try:
            st.executeUpdate(sql)
        finally:
            st.close()
    finally:
        conn.close()


def test_jdbc_atomic_staging_publish_rolls_back_whole_batch(spark, derby_url):
    """K1 staging-table commit protocol (SURVEY §4): the publish is one
    transaction — a failure mid-publish leaves the target byte-
    identical (the reference's conn.rollback semantics,
    ventas_totales.py:227-262), unlike the per-batch path whose
    partial append relies on anti-join healing at the next run."""
    from etl_rj_spark.sinks.incremental import append_incremental_jdbc_atomic

    _exec_sql(spark, derby_url, "CREATE TABLE T_AT (K1 INT PRIMARY KEY, V VARCHAR(10))")
    first = spark.createDataFrame(
        [(i, f"v{i}") for i in range(1, 6)], "K1 int, V string"
    )
    assert append_incremental_jdbc_atomic(first, derby_url, "T_AT", ["K1"], properties=PROPS) == 5
    # idempotent re-run: anti-join strips everything, publish is a no-op
    assert append_incremental_jdbc_atomic(first, derby_url, "T_AT", ["K1"], properties=PROPS) == 0

    # poison batch: row 3 is anti-joined away (already in the target),
    # rows 6/7 are new, but 7 appears twice — the second 7 violates the
    # primary key MID-publish, after 6 would already have been inserted
    bad = spark.createDataFrame(
        [(3, "dup"), (6, "f"), (7, "g"), (7, "h")], "K1 int, V string"
    )
    with pytest.raises(Exception, match="(?i)duplicate|constraint"):
        append_incremental_jdbc_atomic(bad, derby_url, "T_AT", ["K1"], properties=PROPS)

    # the target is untouched: no 6, no 7 — not a partial append
    got = (
        spark.read.format("jdbc").option("url", derby_url)
        .option("dbtable", "T_AT").options(**PROPS).load()
    )
    assert sorted(r.K1 for r in got.collect()) == [1, 2, 3, 4, 5]

    # staging tables were dropped on the way out (names are salted —
    # check the catalog has nothing but the target)
    sysnames = (
        spark.read.format("jdbc").option("url", derby_url)
        .option("query", "SELECT TABLENAME FROM SYS.SYSTABLES WHERE TABLETYPE = 'T'")
        .options(**PROPS).load()
    )
    assert sorted(r.TABLENAME for r in sysnames.collect()) == ["T_AT"]


def test_jdbc_atomic_publish_handles_lowercase_columns(spark, derby_url):
    """Spark's JDBC writer creates staging with QUOTED exact-case
    columns; the publish SQL must quote them too or Derby folds the
    unquoted names to uppercase and the publish fails for any
    DataFrame with lowercase columns."""
    from etl_rj_spark.sinks.incremental import append_incremental_jdbc_atomic

    lower = spark.createDataFrame([(1, "a"), (2, "b")], "k1 int, v string")
    # target created by Spark itself (quoted lowercase columns)
    lower.limit(0).write.format("jdbc").option("url", derby_url).option(
        "dbtable", "T_LC"
    ).options(**PROPS).mode("overwrite").save()
    assert append_incremental_jdbc_atomic(lower, derby_url, "T_LC", ["k1"], properties=PROPS) == 2
    assert append_incremental_jdbc_atomic(lower, derby_url, "T_LC", ["k1"], properties=PROPS) == 0


def test_jdbc_bulk_append_routes_large_batches_to_staged_publish(
    spark, derby_url, monkeypatch
):
    """K1 scale seam (VERDICT r5 #5): a bulk append whose surviving
    rows exceed the threshold goes through the staging-table protocol
    with a MULTI-partition staging write (the single-connection
    coalesce(1) path is reserved for small/error-localized loads)."""
    import etl_rj_spark.sinks.incremental as inc

    seed = spark.range(0, 50).selectExpr("id AS K", "CAST(id AS DOUBLE) AS V")
    _seed(spark, derby_url, "BULK", seed)

    calls = {}
    orig = inc._publish_staged

    def spy(new, *a, **kw):
        calls["staging_partitions"] = new.rdd.getNumPartitions()
        return orig(new, *a, **kw)

    monkeypatch.setattr(inc, "_publish_staged", spy)

    # 500 rows, 50 overlapping keys; threshold 100 → staged path
    batch = spark.range(0, 500).selectExpr(
        "id AS K", "CAST(id AS DOUBLE) AS V"
    ).repartition(4)
    append_incremental_jdbc(
        batch, derby_url, "BULK", ["K"], properties=PROPS,
        atomic_threshold_rows=100,
    )
    assert calls["staging_partitions"] > 1
    got = (
        spark.read.format("jdbc").option("url", derby_url)
        .option("dbtable", "BULK").options(**PROPS).load()
    )
    assert got.count() == 500  # 50 dups skipped, 450 new + 50 seeded

    # small batch under the threshold: the legacy single-connection
    # path (staged publish NOT invoked again)
    calls.clear()
    small = spark.range(500, 520).selectExpr("id AS K", "CAST(id AS DOUBLE) AS V")
    append_incremental_jdbc(small, derby_url, "BULK", ["K"], properties=PROPS)
    assert "staging_partitions" not in calls
    assert got.count() == 520


def test_db_config_drives_ventas_jdbc_pipeline(spark, derby_url, tmp_path):
    """Operational parity with the reference's .env-fed connection
    (ventas_totales.py:16-41): a DbConfig resolves the dimension read
    [S5] and the K1 JDBC load end to end against live Derby, with
    idempotent re-run."""
    from etl_rj_spark.config import load_db_config
    from etl_rj_spark.pipelines.ventas import (
        clean_ventas,
        load_ventas_jdbc,
        read_clientes_dim,
    )

    cfg = load_db_config(
        environ={},
        url=derby_url,
        driver=PROPS["driver"],
        ventas_table="VENTAS_T",
        clientes_table="CLIENTES",
    )
    assert cfg.jdbc_url() == derby_url

    # dimension: unquoted DDL column case (Derby folds to UPPER), the
    # posture reference schemas use; Spark resolves case-insensitively
    clientes = spark.createDataFrame(
        [(1, "ACME Corp.", 10), (2, "Beta  Industries", 20)],
        "ID_CLIENTE int, NOMBRE_CLIENTE string, ID_ZONE int",
    )
    _seed(spark, derby_url, cfg.clientes_table, clientes)
    dim = read_clientes_dim(spark, cfg)
    assert dim.count() == 2

    csv = tmp_path / "ventas.csv"
    csv.write_text(
        "Company Name,Date,Document Number,Type,Item,Description,Class,"
        "Quantity,UOM,Amount,Created From,Status\n"
        "acme corp.,01/15/2024,INV-1,Invoice,SKU1,d,C,2,EA,100.5,,ok\n"
        "Beta  industries,02/01/2024,INV-4,Invoice,SKU4,d,C,1,EA,7.25,,ok\n"
        "Nobody Inc,01/17/2024,INV-3,Invoice,SKU3,d,C,3,EA,30,,ok\n"
    )
    src = spark.read.option("header", True).csv(str(csv))

    # bootstrap the empty target with the fact schema (the reference's
    # table pre-exists in the warehouse)
    facts, _ = clean_ventas(src, dim)
    _seed(spark, derby_url, cfg.ventas_table, facts.limit(0))

    unmapped = load_ventas_jdbc(src, dim, cfg)
    assert [r.nombre_cliente for r in unmapped.collect()] == ["Nobody Inc"]

    def target_count():
        return (
            spark.read.format("jdbc").option("url", derby_url)
            .option("dbtable", cfg.ventas_table).options(**PROPS).load().count()
        )

    assert target_count() == 2
    # idempotent re-run (Ventas PDF §9)
    load_ventas_jdbc(src, dim, cfg)
    assert target_count() == 2
