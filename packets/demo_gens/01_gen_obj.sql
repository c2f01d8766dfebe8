select cast(null as string) as maint, s, n
from values ('tbl_a', 10), ('tbl_b', 20) as t(s, n)
