select null as maint, 'nsp_d'
UNION
select null, 'nsp_e'
UNION
select 'analyze common_maint_tbl', 'nsp_f'
order by 2
