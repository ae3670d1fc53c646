from cdc_export_system_spark.io.sources import load_table, register_views  # noqa: F401
