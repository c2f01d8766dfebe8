insert into demo_gen_tbl values ('GEN_NSP_FLD_1', 'GEN_OBJ_FLD_1', GEN_OBJ_FLD_2)
