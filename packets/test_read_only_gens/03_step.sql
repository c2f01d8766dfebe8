select count(1) as cnt from nsp_a.GEN_OBJ_FLD_1;
