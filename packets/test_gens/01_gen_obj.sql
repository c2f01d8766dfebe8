-- this generator returns list of tables (reference: 01_gen_obj.sql)
select null as maint, 'tbl_a'
UNION
select null, 'tbl_b'
UNION
select null, 'tbl_c'
order by 2
