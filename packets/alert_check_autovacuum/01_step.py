# Port of reference packets/alert_check_autovacuum/01_step.sql:1-16. The
# plpgsql DO wrapper becomes this py-step twin (SURVEY §2.10); the catalog
# query inside runs UNMODIFIED through the PG dialect rewriter ('{...}'::
# text[] literal, @> containment, quote_ident) against the pg_class /
# pg_namespace emulation views. Tables opt out of autovacuum via the PG
# statement `ALTER TABLE t SET (autovacuum_enabled = false)`, which the
# dialect maps onto TBLPROPERTIES — exactly the surface this alert reads.
rows = ctx.execute(
    "select quote_ident(n.nspname) || '.' || quote_ident(c.relname) as tbl"
    " from pg_class c"
    " join pg_namespace n on n.oid = c.relnamespace"
    " where '{autovacuum_enabled=false}'::text[] @> reloptions and relkind = 'r'"
    " order by tbl"
)
flagged = [r[0] for r in rows[1:]]
if flagged:
    raise Exception("autovacuum_enabled=false on some tables! %s" % flagged)
ctx.raise_notice("LOG", "autovacuum check passed: no tables with autovacuum disabled")
