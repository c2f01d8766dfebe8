-- Index-bloat estimate (reference alert_bloat/01_step.sql). Adaptations:
-- regexp_split_to_table(indkey) -> explode(indkey_arr); the fillfactor
-- SIMILAR TO pattern -> regexp_extract; constraint ext-info dropped
-- (pg_constraint is structurally empty on parquet).
WITH btree_index_atts AS (
    SELECT n.nspname,
        ci.relname as index_name,
        ci.reltuples,
        ci.relpages,
        i.indrelid, i.indexrelid,
        ci.relam,
        ct.relname as tablename,
        explode(i.indkey_arr) AS attnum,
        coalesce(try_cast(regexp_extract(array_join(coalesce(ci.reloptions, array()), ' '), 'fillfactor=([0-9]+)', 1) as int), 100) as fillfactor,
        i.indexrelid as index_oid,
        pg_get_indexdef(i.indexrelid) as def,
        cast(i.indisunique as int) as indisunique,
        cast(i.indisprimary as int) as indisprimary
    FROM pg_index i
    JOIN pg_class ci ON i.indexrelid = ci.oid and ci.relkind = 'i'
    JOIN pg_class ct ON i.indrelid = ct.oid and ct.relkind in ('r', 'm', 't')
    JOIN pg_namespace n ON n.oid = ci.relnamespace
    JOIN pg_am a ON ci.relam = a.oid
    WHERE a.amname = 'btree' and ci.relpages > 3000
         AND ct.reltuples > 5000
),
index_item_sizes AS (
    SELECT
        ind_atts.nspname, ind_atts.index_name,
        ind_atts.reltuples, ind_atts.relpages, ind_atts.relam,
        ind_atts.indrelid AS table_oid, ind_atts.index_oid,
        current_setting('block_size')::numeric AS bs, ind_atts.fillfactor,
        8 AS maxalign,
        24 AS pagehdr,
        CASE WHEN max(coalesce(s.null_frac, 0)) = 0
            THEN 2
            ELSE 6
        END AS index_tuple_hdr,
        sum((1 - coalesce(s.null_frac, 0)) * coalesce(s.avg_width, 1024)) AS nulldatawidth,
        max(ind_atts.def) as def, max(ind_atts.indisunique) as indisunique, max(ind_atts.indisprimary) as indisprimary
    FROM pg_attribute att
    JOIN btree_index_atts ind_atts ON att.attrelid = ind_atts.indrelid AND att.attnum = ind_atts.attnum
    JOIN pg_stats s ON s.schemaname = ind_atts.nspname
          AND s.tablename = ind_atts.tablename AND s.attname = att.attname
    WHERE att.attnum > 0
    GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11
),
index_aligned_est AS (
    SELECT maxalign, bs, nspname, index_name, reltuples,
        relpages, relam, table_oid, index_oid,
        coalesce (
            ceil (
                reltuples * ( 6
                    + maxalign
                    - CASE
                        WHEN index_tuple_hdr%maxalign = 0 THEN maxalign
                        ELSE index_tuple_hdr%maxalign
                      END
                    + nulldatawidth
                    + maxalign
                    - CASE /* Add padding to the data to align on MAXALIGN */
                        WHEN nulldatawidth::integer%maxalign = 0 THEN maxalign
                        ELSE nulldatawidth::integer%maxalign
                      END
                )::numeric
              / ( bs - pagehdr::numeric )
              +1 )
         , 0 )
      as expected,
    def, indisunique, indisprimary, fillfactor
    FROM index_item_sizes
),
raw_bloat AS (
    SELECT current_database() as dbname, nspname, pg_class.relname AS table_name, index_name,
        bs*(index_aligned_est.relpages)::bigint AS totalbytes, expected,
        CASE
            WHEN index_aligned_est.relpages <= expected
                THEN 0
                ELSE bs*(index_aligned_est.relpages-expected)::bigint
            END AS wastedbytes,
        CASE
            WHEN index_aligned_est.relpages <= expected
                THEN 0
                ELSE bs*(index_aligned_est.relpages-expected)::bigint * 100 / (bs*(index_aligned_est.relpages)::bigint)
            END AS realbloat,
        pg_relation_size(index_aligned_est.table_oid) as table_bytes,
        stat.idx_scan as index_scans,
        def, indisunique, indisprimary, fillfactor
    FROM index_aligned_est
    JOIN pg_class ON pg_class.oid = index_aligned_est.table_oid
    JOIN pg_stat_user_indexes stat ON index_aligned_est.index_oid = stat.indexrelid
)
SELECT
    nspname as schema_name, table_name, index_name,
    round(realbloat::numeric, 2) as bloat_pct,
    pg_size_pretty(wastedbytes::numeric) as bloat_size,
    pg_size_pretty(totalbytes::numeric) as index_size,
    pg_size_pretty(table_bytes::numeric) as table_size,
    fillfactor
FROM raw_bloat
WHERE (round(realbloat::numeric, 2) >= 80 and wastedbytes/(1024*1024)::numeric > 5)
ORDER BY wastedbytes DESC nulls last
LIMIT 10;
