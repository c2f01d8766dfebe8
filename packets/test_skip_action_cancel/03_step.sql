-- tx start
select 3 as three;
-- tx end
