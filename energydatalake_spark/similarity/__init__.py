from energydatalake_spark.similarity.search import (
    cosine_topk,
    lsh_topk,
    with_norm,
)

__all__ = ["cosine_topk", "lsh_topk", "with_norm"]
