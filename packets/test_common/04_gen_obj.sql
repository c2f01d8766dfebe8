-- this generator returns list of tables (reference: 04_gen_obj.sql)
select 'analyze common_maint_tbl' as maint, 'tbl_a'
UNION
select 'analyze common_maint_tbl', 'tbl_b'
UNION
select null, 'tbl_c'
order by 2
