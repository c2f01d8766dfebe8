"""CSV export — the reference's ``export_data`` path rebuilt on Spark
(reference: dbccore/dbccore.py:724-829).

Semantics kept from the reference:

- every statement must be a plain SELECT-like query (reference validates via
  sqlparse token scan, dbccore/dbccore.py:728-738) — anything else raises;
- all statements of one step share one snapshot: on Spark each parquet/Delta
  read is snapshot-consistent per query; for stronger multi-statement
  consistency the caller can pin table versions (SURVEY §3.3);
- rows stream to the driver in chunks (reference: 10 000-row cursor reads,
  dbccore/dbccore.py:744,765-768 → ``df.toLocalIterator()``, which pulls one
  partition at a time — bounded driver memory at any scale);
- tab-delimited, QUOTE_ALL, values stringified with Python ``str()``
  (reference: dbccore/dbccore.py:759-768);
- file naming ``export_<md5(stm)[:6]>_<ts>_<db>.csv`` (reference:
  dbccore/dbccore.py:752-756);
- optional LZMA zip of all CSVs, with AES password when pyzipper is present
  (reference: dbccore/dbccore.py:781-826); plaintext CSVs are deleted after
  zipping (reference: dbccore/dbccore.py:818-819).

Scale note: the reference's export is inherently single-writer (one CSV per
statement). ``export_statements_distributed`` offers the Spark-native path —
``df.write.option("sep", "\t").csv`` writes one part-file per partition in
parallel with no driver bottleneck — for when byte-identical single-file
output is not required.
"""

from __future__ import annotations

import csv
import hashlib
import lzma
import secrets
import string
import time
import zipfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from db_converter_spark.plans.formatter import ANON_COLUMN
from db_converter_spark.plans.sqlsplit import statement_kind

try:  # optional AES-encrypted zip (reference uses pyzipper AES)
    import pyzipper  # type: ignore

    _HAS_PYZIPPER = True
except ImportError:  # pragma: no cover - environment-dependent
    pyzipper = None
    _HAS_PYZIPPER = False


class ExportValidationError(Exception):
    """Non-SELECT statement inside an export packet (reference:
    dbccore/dbccore.py:728-738)."""


def generate_password(length: int = 12) -> str:
    """Random zip password (reference: generate_password,
    dbccore/dbccore.py:708-715)."""
    alphabet = string.ascii_letters + string.digits
    return "".join(secrets.choice(alphabet) for _ in range(length))


def _export_name(stmt: str, db: str, ts: str | None = None) -> str:
    h = hashlib.md5(stmt.encode()).hexdigest()[:6]
    ts = ts or time.strftime("%Y%m%d_%H%M%S")
    return f"export_{h}_{ts}_{db}.csv"


def write_csv(df: DataFrame, out_path: Path) -> int:
    """Stream a DataFrame to one tab-delimited QUOTE_ALL CSV via
    ``toLocalIterator`` (partition-at-a-time; bounded driver memory).
    Returns the row count."""
    out_path.parent.mkdir(parents=True, exist_ok=True)
    cols = [c if c else ANON_COLUMN for c in df.columns]
    n = 0
    with out_path.open("w", newline="") as fh:
        w = csv.writer(fh, delimiter="\t", quoting=csv.QUOTE_ALL)
        w.writerow(cols)
        for row in df.toLocalIterator():
            w.writerow(["" if v is None else str(v) for v in row])
            n += 1
    return n


def export_statements(
    session: SparkSession,
    db: str,
    statements: list[str],
    out_dir: str | Path,
    zip_output: bool = False,
    zip_password: str | None = None,
    export_options: dict | None = None,
) -> list[str]:
    """Run each SELECT statement and write one CSV per statement; optionally
    zip them all (one archive per step, as the reference does per packet).

    ``export_options`` is the packet's ``meta_data.json`` block (reference
    format): ``{"use_zip": "yes", "password": "random" | "<literal>"}``.
    A random password is embedded in the zip file name
    (``export_<password>_<ts>_<db>.zip``) exactly as the reference does
    (dbccore/dbccore.py:787-794), so operators can recover it.

    Returns the list of produced file paths (the zip replaces the CSVs when
    zipping, matching the reference's delete-after-zip)."""
    out_dir = Path(out_dir)
    pw_in_name = False
    unencrypted_fallback = False
    if export_options:
        if str(export_options.get("use_zip", "")).lower() in ("yes", "true", "1"):
            zip_output = True
        pw = export_options.get("password")
        if pw == "random":
            zip_password = generate_password()
            pw_in_name = True
        elif pw:
            zip_password = str(pw)
        # AES is always available: pyzipper when installed (interop-
        # preferred), else the pure-stdlib AE-2 writer (functions/wzaes.py,
        # FIPS-197 AES-256 + WinZip AE-2 container). The old LOUD
        # unencrypted fallback is gone — passwords now always encrypt.
    for stmt in statements:
        if statement_kind(stmt) != "query":
            raise ExportValidationError(
                f"export packets accept only SELECT statements, got: {stmt[:80]}"
            )
    files: list[Path] = []
    ts = time.strftime("%Y%m%d_%H%M%S")
    for stmt in statements:
        df = session.sql(stmt)
        path = out_dir / _export_name(stmt, db, ts)
        write_csv(df, path)
        files.append(path)
    if not zip_output:
        return [str(f) for f in files]
    if pw_in_name:
        zip_name = f"export_{zip_password}_{ts}_{db}.zip"
    elif unencrypted_fallback:
        zip_name = f"export_UNENCRYPTED_{ts}_{db}.zip"
    else:
        zip_name = f"export_{ts}_{db}.zip"
    zip_path = out_dir / zip_name
    _zip_files(files, zip_path, zip_password)
    for f in files:
        f.unlink()
    return [str(zip_path)]


def _zip_files(files: list[Path], zip_path: Path, password: str | None) -> None:
    """Zip the exports (reference: dbccore/dbccore.py:781-826). With a
    password: pyzipper WZ_AES+LZMA when installed (byte-interop with the
    reference's output), else the pure-stdlib WinZip AE-2 writer
    (functions/wzaes.py — AES-256/CTR/HMAC-SHA1 per the public spec,
    DEFLATE inside). Without a password: plain LZMA zip."""
    if password is not None:
        if _HAS_PYZIPPER:
            with pyzipper.AESZipFile(
                zip_path, "w", compression=pyzipper.ZIP_LZMA,
                encryption=pyzipper.WZ_AES,
            ) as zf:
                zf.setpassword(password.encode())
                for f in files:
                    zf.write(f, f.name)
            return
        from db_converter_spark.functions.wzaes import write_aes_zip

        write_aes_zip(
            zip_path, [(f.name, f.read_bytes()) for f in files], password
        )
        return
    with zipfile.ZipFile(zip_path, "w", compression=zipfile.ZIP_LZMA) as zf:
        for f in files:
            zf.write(f, f.name)


def export_statements_distributed(
    session: SparkSession,
    statements: list[str],
    out_dir: str | Path,
) -> list[str]:
    """Spark-native export: parallel part-file CSV write per statement — the
    100 TB path (no driver funnel; every executor writes its partitions).
    Directory naming mirrors the single-file scheme."""
    out_dir = Path(out_dir)
    ts = time.strftime("%Y%m%d_%H%M%S")
    out: list[str] = []
    for stmt in statements:
        if statement_kind(stmt) != "query":
            raise ExportValidationError(
                f"export packets accept only SELECT statements, got: {stmt[:80]}"
            )
        h = hashlib.md5(stmt.encode()).hexdigest()[:6]
        target = str(out_dir / f"export_{h}_{ts}")
        (
            session.sql(stmt)
            .write.mode("overwrite")
            .option("sep", "\t")
            .option("header", True)
            .option("quoteAll", True)
            .option("emptyValue", "")
            .csv(target)
        )
        out.append(target)
    return out


# lzma import is part of the public surface: stdlib zipfile's ZIP_LZMA needs
# the module present; importing it here fails fast on exotic builds.
_ = lzma
