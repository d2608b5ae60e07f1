from linkgraph.dedup.exact import deduplicate_exact, exact_duplicate_groups
from linkgraph.dedup.minhash import minhash_near_duplicates, minhash_signatures
from linkgraph.dedup.ngram import ngram_jaccard_pairs
from linkgraph.dedup.simhash import simhash_near_duplicates, simhash_signatures
from linkgraph.dedup.embedding import embedding_near_duplicates

__all__ = [
    "exact_duplicate_groups",
    "deduplicate_exact",
    "minhash_signatures",
    "minhash_near_duplicates",
    "ngram_jaccard_pairs",
    "simhash_signatures",
    "simhash_near_duplicates",
    "embedding_near_duplicates",
]
