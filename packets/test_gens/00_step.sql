-- Ported from reference packets/test_gens/00_step.sql: the plpgsql loop
-- creating 3 schemas x 3 tables x 30 rows, unrolled to Spark SQL
-- (databases stand in for PG schemas; SURVEY §2.8 mapping).
DROP DATABASE IF EXISTS nsp_a CASCADE;
DROP DATABASE IF EXISTS nsp_b CASCADE;
DROP DATABASE IF EXISTS nsp_c CASCADE;
CREATE DATABASE nsp_a;
CREATE DATABASE nsp_b;
CREATE DATABASE nsp_c;
CREATE TABLE nsp_a.tbl_a USING parquet AS SELECT explode(sequence(1, 30)) AS fld;
CREATE TABLE nsp_a.tbl_b USING parquet AS SELECT explode(sequence(1, 30)) AS fld;
CREATE TABLE nsp_a.tbl_c USING parquet AS SELECT explode(sequence(1, 30)) AS fld;
CREATE TABLE nsp_b.tbl_a USING parquet AS SELECT explode(sequence(1, 30)) AS fld;
CREATE TABLE nsp_b.tbl_b USING parquet AS SELECT explode(sequence(1, 30)) AS fld;
CREATE TABLE nsp_b.tbl_c USING parquet AS SELECT explode(sequence(1, 30)) AS fld;
CREATE TABLE nsp_c.tbl_a USING parquet AS SELECT explode(sequence(1, 30)) AS fld;
CREATE TABLE nsp_c.tbl_b USING parquet AS SELECT explode(sequence(1, 30)) AS fld;
CREATE TABLE nsp_c.tbl_c USING parquet AS SELECT explode(sequence(1, 30)) AS fld
