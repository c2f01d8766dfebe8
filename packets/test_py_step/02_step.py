# Port of reference packets/test_py_step/02_step.py: read the packet's data/
# files and insert (dir, fname, content) rows. The reference uses a prepared
# INSERT per file over the wire; here one small createDataFrame + append —
# same resultset, one write job.
import os

data_dir = os.path.join(str(ctx.packet.path), "data")
rows = []
for fname in sorted(os.listdir(data_dir)):
    with open(os.path.join(data_dir, fname), "r", encoding="utf8") as fh:
        rows.append((data_dir, fname, fh.read()))
spark.createDataFrame(rows, "dir string, fname string, content string") \
    .write.insertInto("test_tbl_import")
ctx.raise_notice("LOG", f"imported {len(rows)} files")
