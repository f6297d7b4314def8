from graphragdatapipeline_spark.text.chunking import (  # noqa: F401
    chunk_text_chars,
    chunked_documents,
    parse_sections,
)
from graphragdatapipeline_spark.text.analysis import (  # noqa: F401
    build_inverted_index,
    language_scores,
    quality_features,
    token_count_bpe,
    token_count_ws,
)
