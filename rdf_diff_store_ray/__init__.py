"""ray-kg-diff-store: a from-scratch, Ray-Data-native knowledge-graph
construction engine rebuilding the versioned-RDF semantics of the reference
(``Informasjonsforvaltning/rdf-diff-store``, read-only at ``/root/reference``)
as a distributed batch build.

Layout
------
- ``schemas``        Arrow schema contracts (the reference's OpenAPI models analog)
- ``ntriples``       canonical N-Triples serializer/parser + digests
                     (the reference's prettifier analog, ``src/rdf.rs:29-84``)
- ``html_extract``   deterministic boilerplate-stripped text extraction
- ``corpus``         deterministic synthetic Common-Crawl-style ``pages`` corpus
- ``oracle``         single-process reference oracle: dict-based diff store
                     replicating ``store_graph``/``checkout_timestamp`` semantics
- ``stages/``        Ray Data ``map_batches`` stages (extract, ner, link,
                     canonicalize, triples, deltas)
- ``state/``         as-of reconstruction over the delta log
- ``query/``         BGP (SPARQL-subset) evaluator + cached reader
- ``functions/``     training-data ops: dedup, similarity, text analysis,
                     multimodal plumbing
- ``pipelines/``     end-to-end builds and relational operator demos

No module in this package calls ``ray.init``/``ray.shutdown``; sessions are
owned by the driver, ``bench.py``, and the pytest fixture.
"""

__version__ = "0.1.0"
