-- Port of reference 07_step.sql: insert rows through the serial DEFAULT —
-- id is omitted and filled from nextval('test_tbl_id_seq') (reference uses
-- generate_series; Spark-side that's explode(sequence(...))). The runner
-- expands the recorded default and block-allocates the sequence values:
-- one counter bump for all 11 rows.
INSERT INTO test_tbl(fld_1, fld_2)
SELECT v AS fld_1, concat('text_', v) AS fld_2
FROM (SELECT explode(sequence(4000000000, 4000000010)) AS v)
