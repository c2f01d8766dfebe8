-- tx start
select pg_sleep(5);
-- tx end
