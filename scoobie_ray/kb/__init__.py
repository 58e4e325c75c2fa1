from .bundle import KBBundle, KBIndex
from .build import build_kb_from_triples

__all__ = ["KBBundle", "KBIndex", "build_kb_from_triples"]
