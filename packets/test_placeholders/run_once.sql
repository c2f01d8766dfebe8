CREATE TABLE IF NOT EXISTS pl_users (usename STRING, passwd_md5 STRING) USING parquet
