-- reference: 02_gen_obj.sql — middle action must fail (pg_sleep(10000) that
-- the reference cancels maps to a statement Spark rejects at analysis)
select null as maint, 'select 21 as v' as stm, 1 as num
UNION
select null, 'select no_such_fn_sleep(10000)', 2
UNION
select null, 'select 23 as v', 3
order by num
