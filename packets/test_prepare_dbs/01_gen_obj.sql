select null as maint, case when (select count(1) from pg_database where datname = 'test_dbc_01') = 0
	then 'CREATE DATABASE test_dbc_01'
	else '' end
union
select null, case when (select count(1) from pg_database where datname = 'test_dbc_02') = 0
	then 'CREATE DATABASE test_dbc_02'
	else '' end
order by 2
