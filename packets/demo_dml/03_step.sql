SELECT grp, count(*) AS n, sum(amt) AS total_amt
FROM demo_dml_tbl
GROUP BY grp
ORDER BY grp
