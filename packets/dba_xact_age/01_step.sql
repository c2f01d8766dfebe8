-- PG computes age(relfrozenxid); parquet has no xid wraparound, so the
-- emulated relfrozenxid is identically 0 and no relation ever ages.
SELECT n.nspname, c.relname, greatest(c.relfrozenxid, t.relfrozenxid) as age
FROM pg_class c
JOIN pg_namespace n on c.relnamespace = n.oid
LEFT JOIN pg_class t ON c.reltoastrelid = t.oid
WHERE c.relkind IN ('r', 'm') and greatest(c.relfrozenxid, t.relfrozenxid) > 1200000000
ORDER BY greatest(c.relfrozenxid, t.relfrozenxid) desc
LIMIT 10;

SELECT datname, datfrozenxid FROM pg_database
ORDER BY datfrozenxid desc, datname;
