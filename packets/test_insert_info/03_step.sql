INSERT INTO dbc_packets_local(
	name, packet_hash, meta_data)
	VALUES ('from_test_insert_info', 'acb', '{}');
UPDATE dbc_packets_local set packet_hash = 'bca' where packet_hash = 'abc';
select name, packet_hash from dbc_packets_local where packet_hash = 'bca' limit 10;
