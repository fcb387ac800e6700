"""Training-data pipeline operators over ``documents``/``embeddings``-shaped
tables: text analysis, exact/near deduplication, similarity search, and
multimodal column plumbing. All operators are Ray Data stages (vectorized
``map_batches`` bodies; actor pools where state is loaded once)."""
