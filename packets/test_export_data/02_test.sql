select * from test_tbl_export_1 where id > 10 and id < 200 order by id;
select * from test_tbl_export_2 where id > 20 and id < 300 order by id
