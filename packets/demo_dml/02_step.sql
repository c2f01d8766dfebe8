UPDATE demo_dml_tbl SET amt = amt + 5, grp = upper(grp) WHERE id <= 10;
DELETE FROM demo_dml_tbl WHERE id > 90
