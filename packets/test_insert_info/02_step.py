# Port of the reference's in-step DO block: raise notice 'some notice'
ctx.raise_notice("NOTICE", "some notice")
