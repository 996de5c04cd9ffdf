from deltalake_poc_spark.streaming.runner import CDCStreamRunner  # noqa: F401
from deltalake_poc_spark.streaming.views import MaterializedView  # noqa: F401
