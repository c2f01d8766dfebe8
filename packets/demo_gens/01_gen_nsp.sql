select cast(null as string) as maint, s
from values ('nsp_a'), ('nsp_b'), ('nsp_c') as t(s)
