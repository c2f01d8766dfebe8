vacuum maint_tbl;
