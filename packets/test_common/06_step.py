# Port of reference 06_step.sql: DO block performing pg_sleep(1).
ctx.execute("select pg_sleep(1)")
