from spark_dns_spark.functions.dnsfn import (  # noqa: F401
    fqdn_normalize,
    zone_from_fqdn,
    fqdn_lower,
    portable_hash60,
    json_get,
    encode_update_json,
)
