from hr_moderndatapipeline_spark.sources.readers import (  # noqa: F401
    TABLES,
    jdbc_pushdown_query,
    load_table,
    register_views,
)
from hr_moderndatapipeline_spark.sources.fileindex import (  # noqa: F401
    build_file_index,
    pruned_paths,
    read_pruned,
    update_file_index,
)
from hr_moderndatapipeline_spark.sources.watermark import (  # noqa: F401
    FileWatermarkStore,
    MemoryWatermarkStore,
    incremental_read,
)
