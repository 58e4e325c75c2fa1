from .text import TextStats, LangId, fingerprint_batch
from .dedup import exact_dedup, minhash_dedup, simhash_dedup, embedding_dedup
from .similarity import knn_bruteforce, knn_lsh

__all__ = [
    "TextStats",
    "LangId",
    "fingerprint_batch",
    "exact_dedup",
    "minhash_dedup",
    "simhash_dedup",
    "embedding_dedup",
    "knn_bruteforce",
    "knn_lsh",
]
