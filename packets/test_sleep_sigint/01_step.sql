-- tx start
select 1;
-- tx end
