# Port of reference packets/test_read_only/01_step.sql: the plpgsql DO block
# becomes a py-step twin (SURVEY §2.10 mapping), the query runs unchanged.
ctx.raise_notice("NOTICE", "Pre-select notice 1...")
ctx.execute("select 1 as a, 2 as b, 3 as c union select 4, 5, 6 order by a")
