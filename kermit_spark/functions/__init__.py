from kermit_spark.functions.urls import (  # noqa: F401
    clean_url_series,
    clean_urls,
    host_of,
    normalize_url_series,
    normalize_urls,
    to_local_path,
    to_local_path_series,
    url_hash,
)
