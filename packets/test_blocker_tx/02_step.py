# Port of reference 02_step.sql: DO block that reads the table then holds
# its transaction open in pg_sleep(10). Spark readers hold no locks - the
# shape is kept (read + bounded sleep) so the sweep exercises the same path.
ctx.execute("select * from test_blocker_tx_tbl")
ctx.execute("select pg_sleep(3)")
