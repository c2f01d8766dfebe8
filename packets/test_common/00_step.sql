-- Port addition: the reference's maint commands analyze live pg_catalog
-- tables (analyze pg_am etc.); the Spark twins analyze a packet-owned
-- table instead (the emulated pg_* relations are temp views - metadata,
-- not analyzable storage).
DROP TABLE IF EXISTS common_maint_tbl;
CREATE TABLE common_maint_tbl USING parquet AS
  SELECT explode(sequence(1, 100)) AS fld
