select datname from pg_database where datname ilike '%some_db%'
