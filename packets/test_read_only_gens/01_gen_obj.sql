-- this generator returns list of tables
select null as maint, 'tbl_a'
UNION
select null, 'tbl_b'
UNION
select null, 'tbl_c'
order by 2
