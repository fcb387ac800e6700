"""Ray Data stages: stateless ``map_batches`` functions and actor-pool
callable classes. Stateless = validation, extraction, digests, triple
emission, MinHash signatures. Actor pools = gazetteer NER / linking /
canonical rewrite (state built once per actor in ``__init__`` — the analog
of the reference's pool-held repos ``/root/reference/src/git.rs:32-75`` and
reused HTTP client ``src/rdf.rs:41``)."""
