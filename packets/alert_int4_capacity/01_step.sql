-- Port of reference packets/alert_int4_capacity/01_step.sql: the plpgsql
-- ratio check becomes a HAVING-gated SELECT — rows appear only when a
-- column is past 70% of its type capacity, which the hook then raises
-- (resultset-as-alert; the reference's RAISE carries the same content).
select
  'GEN_OBJ_FLD_1.GEN_OBJ_FLD_2.GEN_OBJ_FLD_4' as column_path,
  'GEN_OBJ_FLD_3' as typname,
  max(GEN_OBJ_FLD_4) as current_max,
  round(max(GEN_OBJ_FLD_4) / (case when 'GEN_OBJ_FLD_3' = 'int4'
                                   then pow(2, 31) else pow(2, 15) end), 4)
    as capacity_ratio
from GEN_OBJ_FLD_1.GEN_OBJ_FLD_2
having max(GEN_OBJ_FLD_4) / (case when 'GEN_OBJ_FLD_3' = 'int4'
                                  then pow(2, 31) else pow(2, 15) end) > 0.7
