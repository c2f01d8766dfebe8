CREATE INDEX CONCURRENTLY maint_tbl_dt_test_idx
    ON maint_tbl USING btree
    (dt);
