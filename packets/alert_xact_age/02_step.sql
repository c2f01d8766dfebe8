SELECT
	datname,
	datfrozenxid as datfrozenxid_age,
	datminmxid as datminmxid_age
FROM pg_database
WHERE (datfrozenxid > 1300000000 or datminmxid > 1400000000)
ORDER BY datfrozenxid DESC;
