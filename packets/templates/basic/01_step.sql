select 'edit me' as step_1
