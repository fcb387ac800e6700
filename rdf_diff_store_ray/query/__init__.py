"""Query layer: BGP (SPARQL-subset) evaluation at a timestamp, with the
reference's 3-level cache semantics (``/root/reference/src/query.rs:28-43``)."""
