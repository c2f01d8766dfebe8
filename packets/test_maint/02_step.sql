analyze maint_tbl;
