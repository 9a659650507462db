from data_pipeline_spark.sources import file_topic  # noqa: F401
