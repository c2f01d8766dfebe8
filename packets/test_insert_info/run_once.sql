CREATE TABLE IF NOT EXISTS dbc_packets_local (name STRING, packet_hash STRING, meta_data STRING) USING parquet
