"""Language identification — pipeline slot 0.

The reference wraps the Nutch n-gram ``LanguageIdentifier`` and defaults
to EN (transducer/LanguageIdentification.java:43-86).  This stage applies
the same stopword-profile vote as ops.text.LangId to the document's
``plain_text`` and records a ``lang`` column (default "en" on no
evidence, like the reference)."""

from __future__ import annotations

import pyarrow as pa

from ..ops.text import LangId
from ..sources.docs import add_plain_text


class DocLangId:
    def __init__(self, langs: tuple[str, ...] = ("en", "es", "de", "fr")):
        self._inner = LangId(langs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if "plain_text" not in batch.column_names:
            batch = add_plain_text(batch)
        tmp = pa.table({"text": batch["plain_text"]})
        out = self._inner(tmp)
        return batch.append_column("lang", out["lang_pred"])
