"""Operator modules. Importing this package registers every query in
``duckdb_httpd_log_spark.plans.registry.REGISTRY``."""

from . import analytics, corpus, dedup, events, multimodal, probes, relational, similarity, sketches, textops  # noqa: F401
