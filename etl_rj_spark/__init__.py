"""etl_rj_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference ETL suite jorgelqc/ETL-RJ.

Layers (SURVEY.md §7):
  - ``functions``: scalar column kernels (string/date/numeric cleaning).
  - ``operators``: composable DataFrame→DataFrame dataflow ops
    (projection, filter, join/recode, dedup, aggregate, window, setops)
    plus LLM-data-pipeline extensions (text dedup, similarity search,
    text analysis, multimodal plumbing).
  - ``sources`` / ``sinks``: messy-CSV & Excel-named-table readers,
    JDBC, snapshot & incremental writers.
  - ``pipelines``: the four reference ETL flows recomposed from the ops.
  - ``analytics``: the documented read-side query library and the
    oracle-checked query suite.

Everything is lazy DataFrame API — Catalyst does pruning/pushdown/join
selection; custom code is confined to sources, sinks and the op library.
"""

__version__ = "0.1.0"
