select GEN_OBJ_FLD_1 as fld1, GEN_OBJ_FLD_2 as fld2, 'GEN_OBJ_FLD_3' as fld3;
