select count(1) as cnt from GEN_NSP_FLD_1.tbl_a;
