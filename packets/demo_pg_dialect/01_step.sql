select (v % 3)::text as bucket,
       count(1)::int8 as n,
       string_agg(v::text, ',') as members
from generate_series(1, 9) as T(v)
group by 1
order by 1
