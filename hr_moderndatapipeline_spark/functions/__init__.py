from hr_moderndatapipeline_spark.functions.kit import (  # noqa: F401
    dec_sum,
    null_safe_ratio,
    with_period_keys,
)
from hr_moderndatapipeline_spark.functions.dq import (  # noqa: F401
    apply_rules,
    load_rules,
)
from hr_moderndatapipeline_spark.functions.schema_registry import (  # noqa: F401
    SchemaRegistry,
    decode_wire_df,
    wire_decode,
    wire_encode,
)
