from db_converter_spark.functions.pg_compat import (  # noqa: F401
    pg_size_pretty,
    quote_ident,
    pg_format,
    register_pg_compat,
)
from db_converter_spark.functions.hashing import md5_i64, md5_i32  # noqa: F401
from db_converter_spark.functions.vectors import cosine_similarity, dot, l2_norm  # noqa: F401
