SELECT
    pid, client_addr,
    sent_lsn as pending_wal,
    write_lsn as write,
    flush_lsn as flush,
    replay_lsn as replay,
    sent_lsn as total_lag
FROM pg_stat_replication;
