INSERT INTO dbc_packets_local VALUES ('test_insert_delete_select_dbg', 'a', '{}');
DELETE FROM dbc_packets_local WHERE name = 'test_insert_delete_select_dbg';
SELECT name, status FROM dbc_packets WHERE name = 'test_insert_delete_select';
