"""Operator packs.

``relational``  — the [Q] relational inventory from SURVEY.md §2.2-2.8.
``dedup``       — exact + near-duplicate detection (SURVEY.md §2.11).
``similarity``  — embedding similarity search (SURVEY.md §2.11).
``text``        — text analysis: lang-id, quality, tokens, fingerprints.
``multimodal``  — binary-column plumbing for image/audio payloads.

Every module exposes ``QUERIES`` (name -> callable(spark, sf_dir) ->
DataFrame) and ``ORACLES`` (name -> DuckDB SQL) registries that
``__spark_entry__.py`` aggregates for the driver's correctness gate.
"""
