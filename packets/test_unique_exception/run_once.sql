CREATE TABLE IF NOT EXISTS dbc_packets_unique (name STRING, packet_hash STRING, meta_data STRING) USING parquet
