-- Port of reference packets/dba_top_tables/01_step.sql: top relations by
-- size with tuple statistics, over the pg_class/pg_stat_all_tables
-- emulation. Indexes do not exist on parquet, so idxs_size is 0 and total
-- equals heap size (the reference's pg_total_relation_size collapses).
SELECT
	T.nspname,
	T.relname,
	pg_size_pretty(T.size_raw) AS size,
	pg_size_pretty(0) AS idxs_size,
	pg_size_pretty(T.size_raw) AS total,
	T.n_live_tup,
	T.n_dead_tup,
	T.n_tup_ins,
	T.n_tup_upd
FROM (
	WITH pg_class_prep AS (
		SELECT c_1.relname,
			c_1.relnamespace,
			c_1.relkind,
			c_1.oid,
			c_1.relpages,
			s.n_live_tup,
			s.n_dead_tup,
			s.n_tup_ins,
			s.n_tup_upd
		FROM pg_class c_1
		JOIN pg_stat_all_tables s ON c_1.oid = s.relid
		WHERE c_1.relpages > 10 AND c_1.relkind = 'r'
		ORDER BY c_1.relpages DESC
		LIMIT 50
	)
	SELECT n.nspname,
		c.relname,
		c.relpages * 8192 AS size_raw,
		c.n_live_tup,
		c.n_dead_tup,
		c.n_tup_ins,
		c.n_tup_upd
	FROM pg_class_prep c
	JOIN pg_namespace n ON n.oid = c.relnamespace
) T
ORDER BY T.size_raw DESC, T.relname
