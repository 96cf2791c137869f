"""Session-safe wrapper for module-level pandas UDFs.

A ``pyspark.sql.functions.pandas_udf`` object caches its JVM-side
UserDefinedPythonFunction the first time it is used
(``UserDefinedFunction._judf_placeholder``). The cached PythonFunction
embeds the *creating* SparkContext's ``PythonAccumulatorV2`` — the
JVM-to-driver socket that ships Python-worker accumulator/metrics blobs
back after every task. When that context is stopped and a NEW one is
started in the same Python process (bench legs, notebooks, test suites),
a module-level UDF silently reuses the stale JVM function: every task
completion then tries to write accumulator updates to the dead server's
socket, and the DAGScheduler logs an endless ``EOF reached before Python
server acknowledged`` / ``Broken pipe`` storm — hundreds of stack traces
per job, observed live in ``bench.py`` runs (the bench stops the AQE-off
crawl session and opens an AQE-on session for the analytical legs).

``SessionSafeUdf`` rebuilds the underlying ``pandas_udf`` whenever the
active SparkContext is not the one the cache was built against (object
identity — robust to id() reuse after GC), which is exactly the
invalidation the upstream cache is missing. Driver-side cost is one
identity check per expression construction, nothing per task/row.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql.functions import pandas_udf


class SessionSafeUdf:
    """A pandas UDF whose JVM-side cache is invalidated on context change."""

    def __init__(self, fn: Callable[..., Any], return_type: Any) -> None:
        self._fn = fn
        self._return_type = return_type
        self._ctx: Any = None
        self._udf: Any = None
        self.__doc__ = getattr(fn, "__doc__", None)
        self.__name__ = getattr(fn, "__name__", "session_safe_udf")

    @property
    def func(self) -> Callable[..., Any]:
        """The wrapped batch function (parity with UserDefinedFunction.func)."""
        return self._fn

    def __call__(self, *cols: Any) -> Any:
        try:
            from pyspark import SparkContext

            ctx = SparkContext._active_spark_context
        except Exception:  # Connect mode or no active classic context
            ctx = None
        if self._udf is None or self._ctx is not ctx:
            self._udf = pandas_udf(self._fn, self._return_type)
            self._ctx = ctx
        return self._udf(*cols)


def session_safe_pandas_udf(fn: Callable[..., Any], return_type: Any) -> SessionSafeUdf:
    """Drop-in replacement for module-level ``pandas_udf(fn, type)``."""
    return SessionSafeUdf(fn, return_type)
