from data_pipeline_spark.functions import scalars  # noqa: F401
