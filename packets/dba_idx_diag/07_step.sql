-- Issue: there are duplicate indexes (indkey[n] -> indkey_arr[n], both 0-based)
select 'Checking duplicated indexes...' as "Check name";
select * from (
select
	max(n.nspname) as nspname,
	max(cr.relname) as tbl_name,
	array_agg(distinct ci.relname) as idxs
from pg_index i
join pg_class ci on ci.oid = i.indexrelid and ci.relkind = 'i'
join pg_class cr on cr.oid = i.indrelid and cr.relkind = 'r'
join pg_namespace n on n.oid = ci.relnamespace
join pg_attribute a on
	  a.attrelid = i.indrelid and get(i.indkey_arr, 1) is not null
	  and (a.attnum = get(i.indkey_arr, 0) or a.attnum = get(i.indkey_arr, 1))
group by cr.oid, get(i.indkey_arr, 0), get(i.indkey_arr, 1)
having count(*) > 2
union all
select
	max(n.nspname) as nspname,
	max(cr.relname) as tbl_name,
	array_agg(distinct ci.relname) as idxs
from pg_index i
join pg_class ci on ci.oid = i.indexrelid and ci.relkind = 'i'
join pg_class cr on cr.oid = i.indrelid and cr.relkind = 'r'
join pg_namespace n on n.oid = ci.relnamespace
join pg_attribute a on
	  a.attrelid = i.indrelid
	  and a.attnum = get(i.indkey_arr, 0) and get(i.indkey_arr, 1) is null
group by cr.oid, get(i.indkey_arr, 0)
having count(*) > 1
) order by nspname, tbl_name, idxs
limit 100
