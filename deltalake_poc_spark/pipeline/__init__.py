from deltalake_poc_spark.pipeline import dedup, multimodal, similarity, text  # noqa: F401
