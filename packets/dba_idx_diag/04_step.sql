-- Issue: the btree index is created on field of text type
-- (attnum = any(i.indkey) -> array_contains on the emulated indkey_arr)
select 'Checking btree indexes created on text fields...' as "Check name";
select
	n.nspname as nspname,
	cr.relname as tbl_name,
	ci.relname as idx_name,
	attname as fld_name,
	pg_get_indexdef(i.indexrelid)
from pg_index i
join pg_class ci on ci.oid = i.indexrelid and ci.relkind = 'i'
join pg_class cr on cr.oid = i.indrelid and cr.relkind = 'r'
join pg_namespace n on n.oid = ci.relnamespace
join pg_attribute a on
	  a.attrelid = i.indrelid and array_contains(i.indkey_arr, a.attnum)
join pg_type t on t.oid = a.atttypid
join pg_am am ON ci.relam = am.oid
where
	t.typname in ('varchar', 'text') and
	am.amname = 'btree'
order by nspname, tbl_name, idx_name, fld_name
limit 100
