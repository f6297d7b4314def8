from graphragdatapipeline_spark.vector.similarity import (  # noqa: F401
    cosine_similarity,
    cosine_topk,
    dot_product,
    embed_text_udf,
    embedding_near_dup_pairs,
    ivf_assignments,
    l2_norm,
    upsert_dedup,
)
