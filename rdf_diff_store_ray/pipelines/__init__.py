"""End-to-end pipelines (KG build) and relational operator demos."""
