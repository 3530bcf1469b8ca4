"""Structured-Streaming surface: the streaming twins of the batch
operators (source, rollups, dedup, decontamination, alerting, joins,
sessionization, rate limiting, CUSUM drift detection)."""

from .cusum import cusum_alerts_stream, cusum_replay  # noqa: F401
from .log_stream import (  # noqa: F401
    correlate_error_context,
    dau_stream,
    dedup_against_index_stream,
    dedup_stream,
    error_rate_alerts,
    flag_contaminated_stream,
    hot_paths_stream,
    read_httpd_log_stream,
    windowed_percentiles_stream,
    windowed_status_counts,
)
from .ratelimit import rate_limit_stream  # noqa: F401
from .sessionize import sessionize_batch, sessionize_stream  # noqa: F401
