-- Port of reference packets/test_common/02_gen_obj.sql: the pk-interval
-- grid generator. Adaptations: scalar-subquery bounds inlined (pk_intervals
-- is a constants CTE), row_number ordered (Spark needs a window ORDER BY for
-- a deterministic grid), maint targets the packet's own table (see 00_step).
with grid_a as (
	select T.point_a as point_a, row_number() OVER (order by T.point_a) as id
	from (
		SELECT generate_series(0, 1000 + 10, 10) as point_a
	) T
),
grid_b as (
	select T.point_b as point_b, row_number() OVER (order by T.point_b) as id
	from (
		SELECT generate_series(0 + 10, 1000 + 10, 10) as point_b
	) T
)
select
	(
		case when T.id % 10 = 1
		then 'analyze common_maint_tbl'
		end
	) as maint,						-- "maint" is system field with index 0
	T.a,							-- GEN_OBJ_FLD_1
	T.b,							-- GEN_OBJ_FLD_2
	'test value from gen_obj'		-- GEN_OBJ_FLD_3
from (
	SELECT A.point_a as a, B.point_b as b, A.id from grid_a A
	join grid_b B on A.id = B.id
) T
order by 2
