"""PySpark-native knowledge-graph construction engine.

A from-scratch rebuild of the capabilities of
``janschachtschabel/entity-extractor-linker-api-v2`` as distributed DataFrame
stages: HTML→text extraction, deterministic mention detection, alias/redirect
KB entity linking, triple emission, canonicalization, graph materialization,
plus training-data-pipeline operators (dedup, similarity search, text
analysis).  See SURVEY.md for the operator inventory this implements.
"""

__version__ = "0.1.0"
