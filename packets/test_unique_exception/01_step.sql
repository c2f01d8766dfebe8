INSERT INTO dbc_packets_unique(
	name, packet_hash, meta_data)
	VALUES ('test_exception', 'acb', '{}');
INSERT INTO dbc_packets_unique(
	name, packet_hash, meta_data)
	VALUES ('test_exception', 'acb', '{}');
SELECT assert_true(
  (select count(1) from dbc_packets_unique where name = 'test_exception') <= 1,
  'duplicate key value violates unique constraint "dbc_packets_unique_name_key"'
) as unique_check;
