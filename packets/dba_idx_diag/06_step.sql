-- Issue: there is no index on the fields declared as FK
-- (pg_constraint is a typed empty view - parquet declares no FKs; the
-- join machinery runs and reports none)
select 'Checking fields declared as FK without indexes...' as "Check name";
select
	n_target.nspname as target_nspname,
	c_target.relname as target_relname,
	af.attname as target_fld,
	con.conname,
	n_source.nspname as source_nspname,
	c_source.relname as source_relname,
	ar.attname as source_fld,
	pg_get_constraintdef(con.oid) as constraint_def,
	format(
		'CREATE INDEX ON %I.%I USING btree (%I)',
		n_source.nspname,
		c_source.relname,
		ar.attname
	) as idx_def
from pg_constraint con
join pg_class c_target ON con.confrelid = c_target.oid
join pg_class c_source ON con.conrelid = c_source.oid
join pg_namespace n_target ON n_target.oid = c_target.relnamespace
join pg_namespace n_source ON n_source.oid = c_source.relnamespace
join pg_attribute af on
	  af.attrelid = con.confrelid and array_contains(con.confkey, af.attnum)
join pg_attribute ar on
	  ar.attrelid = con.conrelid and array_contains(con.conkey, ar.attnum)
limit 100
