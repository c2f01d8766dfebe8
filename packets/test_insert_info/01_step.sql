DELETE from dbc_packets_local where name = 'from_test_insert_info';
ALTER TABLE dbc_packets_local SET (autovacuum_enabled = true);
