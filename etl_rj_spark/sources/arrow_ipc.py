"""Arrow IPC / Feather V2 files as a distributed source and sink.

Spark has no built-in Arrow-file datasource, but the container format
is Arrow's own wire format, so the right Spark-first composition is:
``binaryFile`` scan (one row per .arrow file, glob-pruned before any
bytes load) → ``mapInPandas`` decoding each file with
``pyarrow.ipc.open_file`` and yielding its record batches as pandas
frames. Decoding is Arrow-native end to end — the bytes go
pyarrow → pandas → Arrow back to the JVM, no per-row Python.

Scale posture: parallelism is per FILE (like every container format —
a .arrow file's batches are sequential within one task), so shard
datasets into many files; the sink does exactly that, writing one
IPC file per Spark partition via ``mapInPandas`` and returning the
written manifest (path, rows) as a DataFrame — the same
manifest-returning pattern as the JSONL shard export.

A corrupt or non-Arrow file raises with its path (fail-fast with
provenance) — pass ``on_error="quarantine"`` to get per-file
dead-lettering (path + reason) through the same quarantine contract
the CSV/JSONL/XML sources use.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_arrow_files(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    *,
    glob: str = "*.arrow",
    on_error: str = "raise",
) -> DataFrame:
    """All record batches of every Arrow IPC file under ``path``
    matching ``glob``, as one DataFrame with ``schema`` (the expected
    ARROW schema, declared not inferred — the engine's explicit-schema
    ingest contract). ``on_error='quarantine'`` adds a
    ``_corrupt_file`` column (NULL for good rows; bad files yield one
    row with only path+reason populated)."""
    if on_error not in ("raise", "quarantine"):
        raise ValueError(f"on_error must be raise|quarantine, got {on_error!r}")
    files = spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)

    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    out_schema = T.StructType(list(schema.fields))
    quarantine = on_error == "quarantine"
    if quarantine:
        out_schema = T.StructType(
            list(schema.fields) + [T.StructField("_corrupt_file", T.StringType())]
        )
    col_names = [f.name for f in schema.fields]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow as pa

        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                try:
                    reader = pa.ipc.open_file(pa.BufferReader(content))
                    tbl = reader.read_all().select(col_names)
                    out = tbl.to_pandas()
                except Exception as ex:  # noqa: BLE001 — path-tagged handling
                    if not quarantine:
                        raise ValueError(f"unreadable Arrow IPC file {fpath}: {ex}") from ex
                    out = pd.DataFrame({c: [None] for c in col_names})
                    out["_corrupt_file"] = f"{fpath}: {type(ex).__name__}: {ex}"
                    yield out
                    continue
                if quarantine:
                    out["_corrupt_file"] = None
                yield out

    return files.select("path", "content").mapInPandas(decode, out_schema)


def write_arrow_files(
    df: DataFrame,
    path: str,
    *,
    prefix: str = "part",
) -> DataFrame:
    """Write one Arrow IPC file per partition under ``path``; returns
    the manifest (file, n_rows), already materialized. Partition count
    = file count: ``repartition`` first to choose the shard layout.

    SHARED-FILESYSTEM CONTRACT: the shards are written with
    executor-local ``os`` file APIs inside mapInPandas (Arrow IPC has
    no Hadoop-FS writer), so ``path`` must be a mount every executor
    AND the driver see (local mode, NFS, a fuse-mounted object store).
    On a non-shared-disk cluster the files would land on executor-local
    disks and vanish at container teardown — use the parquet/ORC sinks
    there instead.

    Commit protocol (the side effect must happen exactly once, however
    the caller or the scheduler behaves):

    - the write job is run EAGERLY inside this call and the manifest is
      re-wrapped via ``createDataFrame`` — re-using / re-counting the
      returned frame never re-executes the write (a lazy mapInPandas
      plan would rewrite the whole dataset on every action);
    - shard names are DETERMINISTIC per partition id, and each shard is
      staged to a ``.inprogress`` temp then atomically ``os.replace``d
      — task retries and speculative attempts overwrite the same final
      name instead of leaving orphan duplicate shards for
      ``read_arrow_files`` to double-count;
    - pre-existing ``{prefix}-*.arrow`` shards under ``path`` are
      removed first (overwrite semantics, like Spark's own
      ``mode("overwrite")``) so a re-run with fewer partitions can't
      leave stale extra shards behind.
    """
    os.makedirs(path, exist_ok=True)
    manifest_schema = "file string, n_rows long"
    import glob as _glob

    for stale in _glob.glob(os.path.join(path, f"{_glob.escape(prefix)}-*.arrow")):
        os.remove(stale)

    def write_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import uuid

        import pyarrow as pa
        from pyspark import TaskContext

        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        tbl = pa.Table.from_pandas(pd.concat(pdfs, ignore_index=True), preserve_index=False)
        pid = TaskContext.get().partitionId()
        fname = os.path.join(path, f"{prefix}-{pid:05d}.arrow")
        tmp = f"{fname}.{uuid.uuid4().hex}.inprogress"
        with pa.ipc.new_file(tmp, tbl.schema) as w:
            w.write_table(tbl)
        os.replace(tmp, fname)
        yield pd.DataFrame({"file": [fname], "n_rows": [tbl.num_rows]})

    rows = df.mapInPandas(write_part, manifest_schema).collect()
    return df.sparkSession.createDataFrame(rows, manifest_schema)
