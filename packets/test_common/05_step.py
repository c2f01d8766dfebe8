# Port of reference 05_step.sql: the post-check DO block whose raise is
# commented out - an intentional no-op.
pass
