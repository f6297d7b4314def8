from graphragdatapipeline_spark.operators.relational import (  # noqa: F401
    best_row_per_group,
    collect_list_sorted,
    dedup_by_priority,
    duplicate_groups,
    null_counts,
    top_k_per_group,
    top_n_frequency,
    union_relaxed,
)
