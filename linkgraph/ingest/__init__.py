from linkgraph.ingest.corpus import synthetic_corpus
from linkgraph.ingest.derive import (
    commit_cooccurrence_edges,
    content_sha,
    file_vertices,
    import_edges,
    repo_graph,
    repo_vertices,
    sha_invariant_violations,
)

__all__ = [
    "synthetic_corpus",
    "content_sha",
    "repo_vertices",
    "file_vertices",
    "import_edges",
    "commit_cooccurrence_edges",
    "repo_graph",
    "sha_invariant_violations",
]
