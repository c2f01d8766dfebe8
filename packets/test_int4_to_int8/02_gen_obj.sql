-- Port of reference packets/test_int4_to_int8/02_gen_obj.sql: the same
-- double row_number grid join producing [a, b] backfill ranges, with the
-- same every-5th-chunk maintenance command (vacuum analyze -> ANALYZE TABLE
-- via the runner's maint channel).
with pk_intervals as (
  select 0 as point_a, (select max(id) from test_tbl) as point_b
),
grid_a as (
  select point_a, row_number() over (order by point_a) as id
  from (
    select explode(sequence((select point_a from pk_intervals),
                            (select point_b from pk_intervals) + 10000,
                            10000)) as point_a
  )
),
grid_b as (
  select point_b, row_number() over (order by point_b) as id
  from (
    select explode(sequence((select point_a from pk_intervals) + 100000,
                            (select point_b from pk_intervals) + 10000,
                            10000)) as point_b
  )
)
select
  (case when A.id % 5 = 1 then 'vacuum analyze test_tbl' end) as maint,
  A.point_a as a,
  B.point_b as b
from grid_a A
join grid_b B on A.id = B.id
order by A.point_a
