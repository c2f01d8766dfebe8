-- tx start
select 3;
-- tx end
