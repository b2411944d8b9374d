#!/usr/bin/env python3
"""Multimodal 5× scale ladder (VERDICT r12 #5): time the four binary-
column operators — PNG decode, AVI frame demux, WAV stats, opaque
binary features — at n payloads and 5n payloads, and report the
wall-clock ratio. The driver-oracled queries pin these operators'
CORRECTNESS on fixture-capped inputs (doc_id < 50/60/64); this ladder
records their COST SHAPE, which for mapInPandas codecs is Arrow batch
throughput: executor-side, no shuffle, so the honest expectation is
~linear (ratio ≈ 5 in total work ⇒ ≈ 5/ parallelism in wall, i.e.
ratio ≤ ~1.3× per-row drift once the 32 cores are saturated — the
BASELINE.md acceptance band, same as the relational ladder).

Payload GENERATION rides inside the timed plan on both rungs (it is
itself a mapInPandas stage, so the ladder measures the whole
Arrow-batched pipeline the queries run, not a cached input).

Usage: python scripts/multimodal_ladder.py [n_base] [factor]
Prints one JSON line per operator: {"op", "n_base", "base_sec",
"scaled_sec", "per_row_ratio"} — per_row_ratio = (scaled/factor)/base,
the number the ≤1.3 band applies to.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def _png_payloads(spark, n):
    d = spark.range(n).select(F.col("id").alias("doc_id"))

    def make(batches):
        import numpy as np
        import pandas as pd

        from etl_rj_spark.functions.png import encode_png

        i = np.arange(8).reshape(8, 1)
        j = np.arange(8).reshape(1, 8)
        for pdf in batches:
            payloads = [
                encode_png(
                    ((int(doc_id) * 31 + i * 7 + j) % 256).astype("uint8"),
                    filter_type=int(doc_id) % 5,
                )
                for doc_id in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return d.mapInPandas(make, "doc_id long, payload binary")


def _avi_payloads(spark, n):
    d = spark.range(n).select(F.col("id").alias("doc_id"))

    def make(batches):
        import pandas as pd

        from etl_rj_spark.functions.riff import build_avi

        for pdf in batches:
            payloads = [
                b"these bytes are no container at all"
                if int(doc_id) % 10 == 9
                else build_avi(
                    [f"{int(doc_id)}:{i}".encode() for i in range(1 + int(doc_id) % 7)]
                )
                for doc_id in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return d.mapInPandas(make, "doc_id long, payload binary")


def _wav_payloads(spark, n):
    d = spark.range(n).select(F.col("id").alias("doc_id"))

    def make(batches):
        import pandas as pd

        from etl_rj_spark.functions.wav import build_wav

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                did = int(doc_id)
                if did % 10 == 7:
                    payloads.append(b"these bytes are no audio container")
                else:
                    ns = 400 + (did % 5) * 100
                    payloads.append(
                        build_wav(
                            [((did * 31 + i * 7) % 65536) - 32768 for i in range(ns)]
                        )
                    )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return d.mapInPandas(make, "doc_id long, payload binary")


def _binary_payloads(spark, n):
    from etl_rj_spark.operators.multimodal import with_binary_payload

    d = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("synthetic document text payload #"), F.col("id").cast("string"),
                 F.lit(" — "), F.repeat(F.lit("lorem ipsum dolor "), 20)).alias("text"),
    )
    return with_binary_payload(d, "doc_id", "text")


def main() -> int:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from etl_rj_spark.operators.multimodal import (
        audio_stats,
        binary_features,
        decode_image,
        sample_frames,
    )
    from etl_rj_spark.session import get_spark

    spark = get_spark(
        app_name="multimodal-ladder", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )

    ops = {
        "png_decode": (lambda n: decode_image(_png_payloads(spark, n))),
        "avi_frame_sampling": (lambda n: sample_frames(_avi_payloads(spark, n), every_n=2)),
        "wav_audio_stats": (lambda n: audio_stats(_wav_payloads(spark, n))),
        "binary_features": (lambda n: binary_features(_binary_payloads(spark, n))),
    }

    def timed(build, n) -> float:
        def once():
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            build(n).write.mode("overwrite").format("noop").save()
            return time.perf_counter() - t0

        once()  # warm-up
        return round(min(once(), once()), 3)

    worst = 0.0
    for name, build in ops.items():
        base = timed(build, n_base)
        scaled = timed(build, n_base * factor)
        per_row = round((scaled / factor) / base, 2) if base else None
        worst = max(worst, per_row or 0)
        print(json.dumps({
            "op": name, "n_base": n_base, "factor": factor,
            "base_sec": base, "scaled_sec": scaled, "per_row_ratio": per_row,
        }), flush=True)
    print(json.dumps({"summary": "multimodal_ladder", "worst_per_row_ratio": worst}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
