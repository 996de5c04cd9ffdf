from deltalake_poc_spark.cdc.parse import parse_debezium  # noqa: F401
from deltalake_poc_spark.cdc.apply import CDCApplier  # noqa: F401
from deltalake_poc_spark.cdc import schema  # noqa: F401
