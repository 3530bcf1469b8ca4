"""duckdb_httpd_log_spark — a PySpark-native HTTP log analytics engine.

A from-scratch reimplementation of the capabilities of the
saygox/duckdb-httpd-log DuckDB extension on Apache Spark, plus the
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) a 100 TB corpus needs.

Public API:
    read_httpd_log(spark, path, format_type=, format_str=, conf=, raw=)
    read_httpd_conf(spark, path)
    get_spark() — tuned local session helper
"""

from .session import get_spark
from .sources.conf import read_httpd_conf
from .sources.reader import read_httpd_log

__all__ = ["read_httpd_log", "read_httpd_conf", "get_spark"]
