CREATE TABLE IF NOT EXISTS maint_tbl USING parquet AS
  SELECT v AS id, timestamp_seconds(1700000000 + v) AS dt
  FROM (SELECT explode(sequence(1, 1000)) AS v)
