# driver-side python step: dynamic SQL over the engine context (the plpgsql
# replacement, SURVEY 2.10) — compute row counts for a set of inline tables
for name, hi in [("ten", 10), ("hundred", 100)]:
    res = ctx.execute(f"select '{name}' as grid, count(*) as n from range(1, {hi + 1})")
    ctx.raise_notice("NOTICE", f"{name}: {res[1][1]} rows")
