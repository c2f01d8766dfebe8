select fname, content from test_tbl_import order by fname;
