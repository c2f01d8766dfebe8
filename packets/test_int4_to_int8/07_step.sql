-- Port of reference 07_step.sql: insert rows whose serial ids continue past
-- the old int4 ceiling — the emulated nextval is max(id)+row_number.
INSERT INTO test_tbl
SELECT (SELECT MAX(id) FROM test_tbl) + row_number() OVER (ORDER BY v) AS id,
       v AS fld_1,
       concat('text_', v) AS fld_2
FROM (SELECT explode(sequence(4000000000, 4000000010)) AS v)
