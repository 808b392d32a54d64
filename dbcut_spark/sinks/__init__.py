from dbcut_spark.sinks.insert_ignore import insert_ignore_parquet  # noqa: F401
from dbcut_spark.sinks.json_export import nested_export  # noqa: F401
from dbcut_spark.sinks.sqldump import dump_sql  # noqa: F401
