INSERT INTO demo_dml_tbl
SELECT id, CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END, id * 10
FROM range(1, 101)
