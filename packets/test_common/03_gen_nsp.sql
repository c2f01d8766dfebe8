-- reference: packets/test_common/03_gen_nsp.sql (ORDER BY added for a
-- deterministic action sequence; Spark UNION order is nondeterministic)
select null as maint, 'nsp_a'
UNION
select 'analyze common_maint_tbl', 'nsp_b'
UNION
select null, 'nsp_c'
order by 2
