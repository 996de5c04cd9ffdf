from deltalake_poc_spark.analytics import queries  # noqa: F401
from deltalake_poc_spark.analytics.io import load_table, load_tables  # noqa: F401
