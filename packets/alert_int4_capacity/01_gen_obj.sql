-- Port of reference packets/alert_int4_capacity/01_gen_obj.sql: enumerate
-- int2/int4 columns via the catalog emulation. Adaptations: parquet has no
-- pg_index/indisprimary (every narrow int column is checked, a superset of
-- the reference's PK-only scan) and no sequences (FLD_5 dropped; the step
-- always takes the max(column) path).
select
  '' as maint,
  nspname as schema_name,
  relname as table_name,
  t.typname,
  attname
from pg_class c
join pg_namespace n on n.oid = c.relnamespace
join pg_attribute a on a.attrelid = c.oid
join pg_type t on t.oid = a.atttypid
where t.typname in ('int2', 'int4')
  and c.relkind = 'r'
order by schema_name, table_name, attname
