"""Python user-defined table functions (Spark 4 `@udtf`) for log
analytics — the row-expanding surface SQL users reach with
`SELECT ... FROM udtf(...)` or `LATERAL`.

UDTFs are the one place the engine deliberately exposes arbitrary
Python in the query language (the reference's host engine exposes the
same power through DuckDB table functions). They run per-partition on
executors — no driver involvement, no state — so they scale like any
narrow transform; keep heavy per-row logic out of hot paths (the core
parse pipeline stays pure Catalyst, see sources/exprs.py).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="param_key: string, param_value: string")
class ExplodeQueryParams:
    """One row per query-string parameter: `?a=1&b=2` -> (a,1), (b,2).

    Keys without '=' yield NULL values; percent-decoding applied to
    both sides (utf-8, errors kept as literals)."""

    def eval(self, query_string: str):  # noqa: D401
        if not query_string:
            return
        from urllib.parse import unquote_plus

        for part in query_string.lstrip("?").split("&"):
            if not part:
                continue
            if "=" in part:
                k, v = part.split("=", 1)
                yield unquote_plus(k), unquote_plus(v)
            else:
                yield unquote_plus(part), None


@udtf(returnType="segment: string, depth: int")
class ExplodePathSegments:
    """One row per URL path segment with its 1-based depth:
    `/a/b/c.html` -> (a,1), (b,2), (c.html,3)."""

    def eval(self, path: str):
        if not path:
            return
        depth = 0
        for seg in path.split("/"):
            if seg:
                depth += 1
                yield seg, depth


def register_udtfs(spark) -> None:
    """Register the UDTFs for SQL use:

        SELECT l.*, p.param_key, p.param_value
        FROM logs l, LATERAL explode_query_params(l.query_string) p
    """
    spark.udtf.register("explode_query_params", ExplodeQueryParams)
    spark.udtf.register("explode_path_segments", ExplodePathSegments)
