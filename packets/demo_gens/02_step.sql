select nsp, count(*) as n_objs, sum(n) as total
from demo_gen_tbl group by nsp order by nsp
