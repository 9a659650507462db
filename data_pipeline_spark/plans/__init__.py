from data_pipeline_spark.plans import audit  # noqa: F401
