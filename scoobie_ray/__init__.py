"""scoobie_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch reimplementation of the capabilities of SCOOBIE
(benjamin-adrian/scoobie): information extraction initialised with an RDF
graph — literal spotting, instance recognition, graph disambiguation,
relevance rating and fact prediction — re-expressed as a streaming Ray Data
pipeline over Arrow batches, plus the large-scale training-data operators
(dedup, similarity search, text analysis, multimodal plumbing) such an
engine needs at 100 TB scale.

Layout:
    kb/         knowledge-base bundle: triple parsing, dictionary encoding,
                statistics (cardinalities, type clusters, markov chain),
                broadcast + per-actor index structures
    sources/    document readers (interleaved text+media span tables),
                TPC-H-ish table readers, deterministic fixture generators
    stages/     per-document pipeline stages (segment, spot, link,
                disambiguate, facts, rate, serialize)
    pipelines/  end-to-end assemblies: extract, canonicalize, materialize
                (partitioned + resumable), kb_build
    ops/        training-data operators: dedup, similarity, text analysis,
                multimodal
    relational/ generic relational pipelines over the TPC-H-ish tables
"""

__version__ = "0.1.0"
