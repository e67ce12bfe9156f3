from energydatalake_spark.text.stats import language_id, text_stats, fingerprints
from energydatalake_spark.text.dedup import (
    exact_dedup,
    minhash_pairs,
    ngram_jaccard_pairs,
    simhash,
)

__all__ = [
    "text_stats",
    "language_id",
    "fingerprints",
    "exact_dedup",
    "minhash_pairs",
    "ngram_jaccard_pairs",
    "simhash",
]
