"""Arrow IPC sink commit protocol: the write happens exactly once at
call time; re-using the returned manifest never re-executes the job,
shard names are deterministic per partition, and a re-run overwrites
rather than accumulating shards."""

from __future__ import annotations

import glob
import os


def _nation(spark, sf_dir):
    from etl_rj_spark.sources.parquet import read_parquet_table

    return read_parquet_table(spark, f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name", "n_regionkey"
    )


def test_manifest_actions_do_not_rewrite(spark, sf_dir, tmp_path):
    from etl_rj_spark.sources.arrow_ipc import read_arrow_files, write_arrow_files

    d = str(tmp_path / "arrow_once")
    n = _nation(spark, sf_dir)
    manifest = write_arrow_files(n.repartition(4), d)

    def shards():
        return sorted(glob.glob(os.path.join(d, "part-*.arrow")))

    first = shards()
    assert 1 <= len(first) <= 4
    # multiple actions on the manifest: still the same files on disk
    assert manifest.count() == len(first)
    total = sum(r.n_rows for r in manifest.collect())
    assert total == 25
    assert shards() == first
    # no stray in-progress temp files
    assert glob.glob(os.path.join(d, "*.inprogress")) == []

    back = read_arrow_files(
        spark, d, "n_nationkey long, n_name string, n_regionkey long"
    )
    assert back.count() == 25


def test_rerun_overwrites_instead_of_accumulating(spark, sf_dir, tmp_path):
    from etl_rj_spark.sources.arrow_ipc import read_arrow_files, write_arrow_files

    d = str(tmp_path / "arrow_rerun")
    n = _nation(spark, sf_dir)
    write_arrow_files(n.repartition(4), d)
    # re-run with FEWER partitions: stale shards from the first layout
    # must not survive to be double-read
    write_arrow_files(n.repartition(2), d)
    back = read_arrow_files(
        spark, d, "n_nationkey long, n_name string, n_regionkey long"
    )
    assert back.count() == 25
    assert len(glob.glob(os.path.join(d, "part-*.arrow"))) <= 2
