"""Column-level functions: vectorized pandas UDFs and JVM expressions."""

from .url_udfs import canonicalize_udf, host_udf  # noqa: F401
