from data_pipeline_spark.streaming import monitor  # noqa: F401
