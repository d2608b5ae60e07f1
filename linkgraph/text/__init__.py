from linkgraph.text.analysis import (
    doc_fingerprint,
    language_id,
    quality_features,
    token_stats,
)

__all__ = ["token_stats", "quality_features", "language_id", "doc_fingerprint"]
