-- Issue: the index has more than 3 fields
select 'Checking indexes with more than 3 fields...' as "Check name";
select
	n.nspname as nspname,
	cr.relname as tbl_name,
	ci.relname as idx_name,
	indnatts as flds_in_idx
from pg_index i
join pg_class ci on ci.oid = i.indexrelid and ci.relkind = 'i'
join pg_class cr on cr.oid = i.indrelid and cr.relkind = 'r'
join pg_namespace n on n.oid = ci.relnamespace
where
	indnatts > 3
order by nspname, tbl_name, idx_name
limit 100
