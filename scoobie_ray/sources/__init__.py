from .docs import SPAN_TYPE, DOC_SCHEMA, add_plain_text, read_docs, flatten_spans_table

__all__ = [
    "SPAN_TYPE",
    "DOC_SCHEMA",
    "add_plain_text",
    "read_docs",
    "flatten_spans_table",
]
