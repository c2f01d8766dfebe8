drop index maint_tbl_dt_test_idx;
