from gmall_flink_spark.sources.tables import TABLES, table
