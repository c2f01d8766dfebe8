select null as maint, 'nsp_a'
UNION
select null, 'nsp_b'
UNION
select null, 'nsp_c'
order by 2
