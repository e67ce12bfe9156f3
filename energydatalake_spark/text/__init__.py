from energydatalake_spark.text.dedup import (
    exact_dedup,
    minhash_pairs,
    ngram_jaccard_pairs,
    release_shingle_cache,
    simhash,
    simhash_pairs,
)
from energydatalake_spark.text.normalize_text import normalize_text
from energydatalake_spark.text.sampling import (
    chunk_documents,
    hash_split,
    pack_chunks,
    stratified_sample,
)
from energydatalake_spark.text.stats import (
    fingerprints,
    language_id,
    text_stats,
    token_counts,
)

__all__ = [
    "text_stats",
    "language_id",
    "fingerprints",
    "token_counts",
    "exact_dedup",
    "minhash_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_pairs",
    "release_shingle_cache",
    "normalize_text",
    "hash_split",
    "stratified_sample",
    "chunk_documents",
    "pack_chunks",
]
