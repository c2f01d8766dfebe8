SELECT count(*) AS n_rows,
       count(CASE WHEN id_new = id THEN 1 END) AS n_backfilled,
       count(CASE WHEN id_new IS NULL THEN 1 END) AS n_missing
FROM demo_mig_tbl
