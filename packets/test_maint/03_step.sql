drop index if exists maint_tbl_dt_test_idx;

CREATE INDEX maint_tbl_dt_test_idx
    ON maint_tbl USING btree
    (dt);
