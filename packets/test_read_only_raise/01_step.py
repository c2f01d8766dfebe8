# Port of reference 01_step.sql: DO block raising 'some exception'.
# PLRaiseError routes to the error hook and the packet continues - the
# reference's PLPGSQLRaiseError alerting semantics, not a failure.
raise PLRaiseError("some exception")
