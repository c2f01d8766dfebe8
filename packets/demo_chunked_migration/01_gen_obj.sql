select case when a % 2000 = 1 then 'vacuum analyze demo_mig_tbl' end as maint,
       a, a + 499 as b
from (select explode(sequence(1, 2000, 500)) as a)
