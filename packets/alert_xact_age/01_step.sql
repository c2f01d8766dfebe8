-- PG: age(relfrozenxid)/mxid_age(relminmxid); the emulated columns are
-- identically 0 (no MVCC wraparound on parquet) so the alert never fires.
SELECT
    n.nspname,
    c.relname,
    c.relfrozenxid as relfrozenxid_age,
    c.relminmxid as relminmxid_age
FROM pg_class c
JOIN pg_namespace n on c.relnamespace = n.oid
WHERE c.relkind IN ('r', 'm', 't') and
	(c.relfrozenxid > 1300000000 or c.relminmxid > 1400000000)
ORDER BY c.relfrozenxid desc
LIMIT 10;
