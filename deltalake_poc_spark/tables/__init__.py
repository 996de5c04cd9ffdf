from deltalake_poc_spark.tables.table import VersionedTable  # noqa: F401
from deltalake_poc_spark.tables.log import TableLog, Commit  # noqa: F401
