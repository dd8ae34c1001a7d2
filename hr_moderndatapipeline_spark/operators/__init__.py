from hr_moderndatapipeline_spark.operators.relational import (  # noqa: F401
    assign_stable_ids,
    change_pairs,
    deterministic_sample,
    duplicate_keys,
    latest_per_key,
    topk,
    topk_per_group,
)
from hr_moderndatapipeline_spark.operators.bloom import (  # noqa: F401
    bloom_semi_filter,
    build_bloom,
    filter_by_bloom,
    might_contain,
)
from hr_moderndatapipeline_spark.operators.layout import (  # noqa: F401
    morton_key,
    zorder_cluster,
)
from hr_moderndatapipeline_spark.operators.cdc import (  # noqa: F401
    classify_cdc_ops,
    upsert_apply,
)
from hr_moderndatapipeline_spark.operators.scd2 import (  # noqa: F401
    as_of_join,
    scd2_apply,
    scd2_from_history,
    validate_scd2,
)
from hr_moderndatapipeline_spark.operators.incremental import (  # noqa: F401
    aggregate_batch,
    finalize_aggs,
    incremental_fold,
    merge_agg_state,
)
from hr_moderndatapipeline_spark.operators.sampling import (  # noqa: F401
    leakage_safe_split,
    pack_sequences,
    stratified_sample,
    training_shuffle,
)
