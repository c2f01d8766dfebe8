-- tx start
select 1 as one;
-- tx end
