"""Python UDTFs (Spark 4 table functions) — one row in, many rows out,
usable in SQL ``LATERAL`` position.

``NGramsUDTF`` is the demonstration surface: token n-grams with
multiplicity. The pure-expression form (``text_analysis.char_shingles``
/ ``text_dedup.token_ngrams`` + ``explode``) is the production path —
JVM-side, no Python round trip; the UDTF exists so pipelines that need
imperative per-row expansion have a vetted pattern with the same
normalization semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="gram: string")
class NGramsUDTF:
    """Whitespace-token n-grams of lowercased, whitespace-collapsed
    text (the dedup normalization), with multiplicity, in order."""

    def eval(self, text: str, n: int):  # noqa: D102
        if text is None:
            return
        toks = text.strip().lower().split()
        for i in range(len(toks) - n + 1):
            yield (" ".join(toks[i : i + n]),)


def explode_ngrams_udtf(
    spark: SparkSession, df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(id, gram) rows via the UDTF in SQL LATERAL position."""
    spark.udtf.register("ngrams_udtf", NGramsUDTF)
    df.createOrReplaceTempView("__ngrams_src")
    return spark.sql(
        f"SELECT s.`{id_col}`, g.gram "
        f"FROM __ngrams_src s, LATERAL ngrams_udtf(s.`{text_col}`, {n}) g"
    )
