-- reference: packets/test_gens/01_gen_nsp.sql (ORDER BY added: Spark UNION
-- output order is nondeterministic and the goldens need a stable sequence)
select null as maint, 'nsp_a'
UNION
select null, 'nsp_b'
UNION
select null, 'nsp_c'
order by 2
