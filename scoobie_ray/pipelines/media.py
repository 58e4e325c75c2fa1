"""Media-span plumbing — the multimodal side of the interleaved docs.

Media spans carry no text but must flow end-to-end (the per-row
span-sequence invariant) and feed media pipelines: this module explodes
them into a flat media dataset (doc_id, span_idx, kind, media_ref) that
ops.multimodal stages consume (decode / resize / frame-sample / feature
extraction as actor pools over payload batches fetched by media_ref).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def media_refs(docs_ds):
    """docs Dataset -> (doc_id, span_idx, kind, media_ref) for media spans."""
    from ..sources.docs import flatten_spans_table

    def explode(batch: pa.Table) -> pa.Table:
        flat = flatten_spans_table(batch)
        media = flat.filter(pc.not_equal(flat["kind"], "text"))
        return media.select(["doc_id", "span_idx", "kind", "media_ref"])

    return docs_ds.select_columns(["doc_id", "spans"]).map_batches(
        explode, batch_format="pyarrow"
    )


def media_features(docs_ds, fetch_payload=None, batch_size: int = 32, concurrency=None):
    """Media spans -> deterministic (fake) feature vectors.

    ``fetch_payload(media_ref) -> bytes`` resolves the opaque reference; the
    default derives a deterministic payload from the ref itself (no media
    store in this environment).  Small ``batch_size``: wide binary rows
    (SURVEY.md §7.4).
    """
    from ..ops.multimodal import DecodeImage, ExtractAudioFeatures
    from ..util import autoscale_concurrency

    if concurrency is None:
        concurrency = autoscale_concurrency(cap=8)
    fetch = fetch_payload or (lambda ref: ref.encode("utf-8"))

    class Featurize:
        def __init__(self):
            self.image = DecodeImage(fake=True)
            self.audio = ExtractAudioFeatures(fake=True)

        def __call__(self, batch: pa.Table) -> pa.Table:
            payloads = pa.array(
                [fetch(r) for r in batch["media_ref"].to_pylist()], pa.binary()
            )
            batch = batch.append_column("payload", payloads)
            is_image = pc.equal(batch["kind"], "image")
            img = self.image(batch.filter(is_image))
            aud = self.audio(batch.filter(pc.invert(is_image)))
            img = img.append_column(
                "features", img["image_features"]
            ).drop_columns(["image_features", "payload"])
            aud = aud.append_column(
                "features", aud["audio_features"]
            ).drop_columns(["audio_features", "payload"])
            return pa.concat_tables([img, aud], promote_options="default")

    return media_refs(docs_ds).map_batches(
        Featurize,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
