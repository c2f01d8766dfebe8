-- Port of reference 00_step.sql (DROP USER IF EXISTS DBC_PL_USER_NAME)
DELETE FROM pl_users WHERE usename = 'DBC_PL_USER_NAME'
