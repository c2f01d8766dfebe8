SELECT
	name,
	setting AS value,
	(
		CASE
		WHEN unit = 'B' THEN
			pg_size_pretty(try_cast(setting as bigint))
		ELSE ''
		END
	) AS pretty_value,
	boot_val,
	unit
FROM pg_settings
WHERE name in (
	'max_connections',
	'spark.sql.shuffle.partitions',
	'spark.sql.autoBroadcastJoinThreshold',
	'spark.sql.files.maxPartitionBytes',
	'spark.sql.adaptive.enabled',
	'spark.sql.adaptive.coalescePartitions.enabled',
	'spark.sql.parquet.compression.codec',
	'spark.sql.session.timeZone',
	'spark.sql.inMemoryColumnarStorage.batchSize',
	'spark.sql.statistics.histogram.enabled'
)
ORDER BY name ASC
