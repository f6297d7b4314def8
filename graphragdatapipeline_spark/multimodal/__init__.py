from graphragdatapipeline_spark.multimodal.blob import (  # noqa: F401
    blob_features,
    blob_table_from_documents,
    decode_media,
    frame_sample_stub,
)
