select null as maint, 'nsp_a'
UNION
select 'analyze common_maint_tbl', 'nsp_b'
UNION
select null, 'nsp_c'
order by 2
