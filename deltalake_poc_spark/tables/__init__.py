from deltalake_poc_spark.tables.table import VersionedTable  # noqa: F401
from deltalake_poc_spark.tables.log import TableLog, Commit  # noqa: F401
from deltalake_poc_spark.tables.streamsource import (  # noqa: F401
    register_stream_source,
)
from deltalake_poc_spark.tables.deltareader import (  # noqa: F401
    DeltaLakeReader,
)
