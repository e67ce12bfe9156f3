from energydatalake_spark.similarity.neardup import embedding_near_dup
from energydatalake_spark.similarity.search import (
    cosine_topk,
    ivf_topk,
    lsh_topk,
    with_norm,
)

__all__ = ["cosine_topk", "embedding_near_dup", "ivf_topk", "lsh_topk", "with_norm"]
