-- tx start
select pg_sleeep(3);
-- tx end
