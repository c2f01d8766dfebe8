select 'GEN_NSP_FLD_1';
