-- reference: 01_gen_obj.sql - md5 credential derived from two placeholders
SELECT '' as maint, 'md5' || md5('DBC_PL_PASSW' || 'DBC_PL_USER_NAME');
