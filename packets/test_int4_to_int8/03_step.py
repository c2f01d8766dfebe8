# Port of reference 03_step.sql (`select pg_sleep(3)`): a deliberate pause
# between backfill and validation, scaled down.
import time
time.sleep(0.3)
ctx.raise_notice("LOG", "pause complete")
