-- tx start
select pg_sleep(45);
-- tx end
