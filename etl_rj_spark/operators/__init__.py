"""Composable DataFrame→DataFrame dataflow operators (SURVEY.md §2).

Core reference surface: projection (P), filters (F), joins/recodes (J),
dedup (J4/J5), aggregates (A), windows (W), set ops (U).

LLM-data-pipeline extensions (SURVEY §7 step 9): ``text_dedup``,
``similarity``, ``text_analysis``, ``multimodal``.
"""

from etl_rj_spark.operators.aggregates import (  # noqa: F401
    distinct_topk,
    merge_partial_sums,
    distinct_values,
    latest_snapshot,
    money_sum,
)
from etl_rj_spark.operators.asof import asof_join, range_join_count  # noqa: F401
from etl_rj_spark.operators.components import connected_components  # noqa: F401
from etl_rj_spark.operators.curation import (  # noqa: F401
    hash_split,
    keep_latest,
    stratified_sample,
)
from etl_rj_spark.operators.dedup import anti_join_new_rows  # noqa: F401
from etl_rj_spark.operators.grouped_pandas import zscore_by_group  # noqa: F401
from etl_rj_spark.operators.profiling import profile_columns  # noqa: F401
from etl_rj_spark.operators.scd import merge_upsert, snapshot_diff  # noqa: F401
from etl_rj_spark.operators.fuzzy import fuzzy_best_match, fuzzy_dim_lookup  # noqa: F401
from etl_rj_spark.operators.multimodal import (  # noqa: F401
    binary_features,
    resize_images,
    sample_frames,
    with_binary_payload,
)
from etl_rj_spark.operators.similarity import (  # noqa: F401
    cosine_near_pairs,
    cosine_near_pairs_lsh,
    cosine_topk,
    ivf_topk,
    lsh_topk,
    near_dup_vector_pairs,
)
from etl_rj_spark.operators.skew import salted_join  # noqa: F401
from etl_rj_spark.operators.text_dedup import (  # noqa: F401
    exact_collapse_star_pairs,
    exact_dedup,
    exact_dedup_mapping,
    minhash_lsh_dedup_pairs,
    near_dup_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)
from etl_rj_spark.operators.filters import (  # noqa: F401
    drop_null_rows,
    rows_where_no_column_contains,
)
from etl_rj_spark.operators.joins import dim_lookup  # noqa: F401
from etl_rj_spark.operators.projection import (  # noqa: F401
    first_present_column,
    rename_map,
    rename_positional,
    select_present,
)
from etl_rj_spark.operators.setops import union_all_by_name  # noqa: F401
from etl_rj_spark.operators.windows import with_lag_delta  # noqa: F401
from etl_rj_spark.operators.validate import quarantine_split, with_validation_reasons  # noqa: F401,E402
