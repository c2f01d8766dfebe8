from db_converter_spark.sources.files import read_export_csv, read_parquet_dir  # noqa: F401
from db_converter_spark.sources.jdbc import chunk_predicates, read_jdbc_chunked  # noqa: F401
