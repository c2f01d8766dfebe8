select
    datname,
    state,
    substring(query from 0 for 32) as query,
    pid,
    backend_xid,
    case when state_change is not null
        then cast(now() - state_change as string)
        else '00:00:00'
    end as state_change_age,
    case when xact_start is not null
        then cast(now() - xact_start as string)
        else '00:00:00'
    end as xact_start_age,
    greatest(backend_xmin, backend_xid) as query_age_in_tx,
    application_name as app_name,
    wait_event_type,
    wait_event
from pg_stat_activity
where state in ('active', 'idle in transaction') and pid <> pg_backend_pid()
order by xact_start_age desc
limit 20;
