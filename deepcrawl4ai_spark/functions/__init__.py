from deepcrawl4ai_spark.functions.urlnorm import (  # noqa: F401
    normalize_url,
    sha1_hex,
    url_host,
    host_hash_64,
    normalize_urls_udf,
    url_hash_udf,
    url_host_udf,
    host_hash_udf,
    url_slug_udf,
)
