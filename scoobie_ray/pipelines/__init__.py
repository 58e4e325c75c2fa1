from .extract import ExtractActor, extract_triples, annotate_docs
from .canonicalize import canonicalize

__all__ = ["ExtractActor", "extract_triples", "annotate_docs", "canonicalize"]
