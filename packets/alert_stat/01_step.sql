select n.nspname,
	c.relname,
	c.reltuples::bigint,
	st.last_autoanalyze,
	st.last_autovacuum,
	st.last_analyze,
	st.last_vacuum
from pg_class c
join pg_namespace n on c.relnamespace = n.oid
left join pg_stat_all_tables st on st.relid = c.oid
where c.reltuples > 1000 and c.relkind in ('r', 'm') and
(
	(st.last_autoanalyze is null and st.last_autovacuum is null and st.last_analyze is null and st.last_vacuum is null)     -- attention!
	OR
	(
		LEAST(
			now() - coalesce(st.last_autoanalyze, timestamp '2000-01-01'),
			now() - coalesce(st.last_analyze, timestamp '2000-01-01')
		) > INTERVAL '15' DAY
		AND
		LEAST(
			now() - coalesce(st.last_autovacuum, timestamp '2000-01-01'),
			now() - coalesce(st.last_vacuum, timestamp '2000-01-01')
		) > INTERVAL '15' DAY
	)
)
order by
	st.last_autoanalyze asc nulls first,
	st.last_autovacuum asc nulls first,
	st.last_analyze asc nulls first,
	st.last_vacuum asc nulls first,
	c.relname asc
limit 10;
