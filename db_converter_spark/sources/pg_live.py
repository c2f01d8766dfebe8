"""Live-PostgreSQL adapter: a managed local server + the COPY pipeline.

The reference's entire runtime is a live PostgreSQL connection (reference:
psc/postgresql/driver/pq3.py; every packet executes server-side through
dbccore/dbccore.py:905-1181). This environment gained the server binaries
(PostgreSQL 15, ``initdb``/``pg_ctl``/``postgres`` + the ``psql`` client)
but ships NO Python wire driver and NO PG JDBC jar — so the one channel a
Spark engine can legitimately drive is the one the binaries themselves
provide: ``psql`` over a unix socket, and PostgreSQL's COPY bulk pipeline.

Two things live here:

1. :class:`PgServer` — initdb/start/stop a throwaway cluster on a unix
   socket (no TCP), plus ``sql()`` statement execution with CSV capture.
   The server process must run unprivileged (PostgreSQL refuses root), so
   when invoked as root the server runs via ``runuser -u postgres`` while
   clients stay root over the trust-auth socket.

2. The COPY source/sink (reference component E36, SURVEY §2.1 — previously
   environment-gated): ``read_pg_query`` bulk-extracts an arbitrary query
   via ``COPY (…) TO`` CSV and loads it as a Spark DataFrame with the
   schema taken from live-PG introspection (types mapped through the same
   PG→Spark table the dialect rewriter uses); ``write_pg_table`` streams a
   DataFrame back through ``COPY … FROM`` in bounded per-part batches —
   the bulk path the reference used COPY for, and the shape a cluster
   deployment keeps (each executor COPYs its own partition; here the
   part files COPY sequentially through one client).
"""

from __future__ import annotations

import csv
import io
import os
import shutil
import subprocess
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from db_converter_spark.plans.pgdialect import _map_type

PG_BIN_CANDIDATES = ("/usr/local/bin", "/usr/bin")


def find_pg_binaries() -> "dict[str, str] | None":
    """Locate initdb/pg_ctl/psql, or None when the environment gate is
    closed (reprobed every round, COVERAGE.md)."""
    out = {}
    for name in ("initdb", "pg_ctl", "psql"):
        for d in PG_BIN_CANDIDATES:
            p = Path(d) / name
            if p.is_file():
                out[name] = str(p)
                break
        else:
            found = shutil.which(name)
            if not found:
                return None
            out[name] = found
    return out


class PgServerError(RuntimeError):
    pass


class PgServer:
    """A throwaway local PostgreSQL cluster on a unix socket.

    Lifecycle: ``PgServer(base_dir).start()`` → ``sql()`` / COPY helpers →
    ``stop()``. ``base_dir`` must be creatable; it is chmod'd 777 so the
    unprivileged server user can own the socket while root clients
    connect (trust auth on a private socket dir — test posture, not a
    production one)."""

    def __init__(self, base_dir: "str | Path", user: str = "postgres"):
        self.base = Path(base_dir)
        self.user = user
        self.bins = find_pg_binaries()
        if self.bins is None:
            raise PgServerError("no PostgreSQL binaries on this host")
        self.data = self.base / "data"
        self._as_pg = ["runuser", "-u", user, "--"] if os.geteuid() == 0 else []

    def start(self) -> "PgServer":
        self.base.mkdir(parents=True, exist_ok=True)
        os.chmod(self.base, 0o777)
        env = dict(os.environ, LC_ALL="C")
        r = subprocess.run(
            self._as_pg
            + [self.bins["initdb"], "-D", str(self.data), "-A", "trust", "-U", "postgres"],
            capture_output=True, text=True, env=env, cwd="/tmp",
        )
        if r.returncode != 0:
            raise PgServerError(f"initdb failed: {r.stderr[-800:]}")
        r = subprocess.run(
            self._as_pg
            + [
                self.bins["pg_ctl"], "-D", str(self.data),
                "-l", str(self.base / "log"),
                "-o", f"-k {self.base} -c listen_addresses=''",
                "-w", "start",
            ],
            capture_output=True, text=True, env=env, cwd="/tmp",
        )
        if r.returncode != 0:
            log = ""
            try:
                log = (self.base / "log").read_text()[-800:]
            except OSError:
                pass
            raise PgServerError(f"pg_ctl start failed: {r.stderr[-400:]} {log}")
        return self

    def stop(self) -> None:
        subprocess.run(
            self._as_pg + [self.bins["pg_ctl"], "-D", str(self.data), "-m", "fast", "stop"],
            capture_output=True, text=True, cwd="/tmp",
        )

    # -- statement execution over psql (client runs as the CURRENT user;
    # -- the trust socket accepts it as role postgres) ---------------------

    def _psql(self, args: "list[str]", sql: "str | None" = None) -> str:
        cmd = [
            self.bins["psql"], "-h", str(self.base), "-U", "postgres",
            "-v", "ON_ERROR_STOP=1", "-X", "-q",
        ] + args
        r = subprocess.run(cmd, input=sql, capture_output=True, text=True)
        if r.returncode != 0:
            raise PgServerError(f"psql failed: {r.stderr[-800:]}")
        return r.stdout

    def sql(self, statement: str, db: str = "postgres") -> "list[list[str]]":
        """Run ONE statement; SELECT output comes back as [header, *rows]
        (all strings, PG text rendering — booleans t/f, NULL as empty);
        non-queries return [] (the command tag goes to stderr/quiet)."""
        out = self._psql(["-d", db, "--csv", "-c", statement])
        if not out.strip():
            return []
        return [row for row in csv.reader(io.StringIO(out))]

    def run_script(self, statements: "list[str]", db: str = "postgres") -> "list[list[list[str]]]":
        """Execute statements in order (one autocommitted session each —
        the same per-statement execute-and-capture cadence the packet
        runner uses), returning each statement's capture in order: the
        live twin of the runner's per-step results."""
        return [self.sql(s, db=db) for s in statements]

    def columns(self, table: str, db: str = "postgres") -> "list[tuple[str, str]]":
        rows = self.sql(
            "SELECT column_name, data_type FROM information_schema.columns"
            f" WHERE table_name = '{table}' ORDER BY ordinal_position",
            db=db,
        )
        return [(r[0], r[1]) for r in rows[1:]]


# ---------------------------------------------------------------------------
# COPY pipeline (reference E36): PG → Spark and Spark → PG in bulk
# ---------------------------------------------------------------------------

_PG_TO_SPARK_EXTRA = {
    "character varying": "string", "character": "string",
    "double precision": "double", "timestamp without time zone": "timestamp",
    "timestamp with time zone": "timestamp", "integer": "int",
    "numeric": "decimal(38,6)",
}


def _spark_type(pg_type: str) -> str:
    t = pg_type.strip().lower()
    return _PG_TO_SPARK_EXTRA.get(t) or _map_type(t)


def read_pg_query(
    spark: SparkSession,
    server: PgServer,
    query: str,
    scratch_dir: "str | Path",
    db: str = "postgres",
) -> DataFrame:
    """Bulk-extract ``query`` from live PG via ``COPY (…) TO`` CSV and
    load it as a DataFrame with an EXPLICIT schema introspected from the
    server (one extra LIMIT-0 round trip — never schema inference, which
    re-reads the data). The COPY runs client-side (``\\copy``) so the file
    lands under the caller's scratch dir, not the server's."""
    scratch = Path(scratch_dir)
    scratch.mkdir(parents=True, exist_ok=True)
    out = scratch / f"pg_copy_{uuid.uuid4().hex}.csv"
    # schema probe: LIMIT 0 through a temp view of the query
    probe = f"CREATE TEMP VIEW _pgread_probe AS {query}"
    cols_sql = (
        "SELECT column_name, data_type FROM information_schema.columns"
        " WHERE table_name = '_pgread_probe' ORDER BY ordinal_position"
    )
    probe_out = server._psql(
        ["-d", db, "--csv"],
        sql=f"{probe};\n{cols_sql};",
    )
    rows = [r for r in csv.reader(io.StringIO(probe_out)) if r]
    cols = [(r[0], r[1]) for r in rows[1:]]
    if not cols:
        raise PgServerError(f"schema probe returned nothing: {probe_out[:200]}")
    server._psql(
        ["-d", db],
        sql=f"\\copy ({query}) to '{out}' with (format csv)",
    )
    schema = ", ".join(f"`{c}` {_spark_type(t)}" for c, t in cols)
    return spark.read.csv(str(out), schema=schema, header=False, nullValue="")


def write_pg_table(
    spark: SparkSession,
    server: PgServer,
    df: DataFrame,
    table: str,
    scratch_dir: "str | Path",
    db: str = "postgres",
) -> int:
    """Stream a DataFrame into an EXISTING PG table through ``COPY … FROM``
    — one bounded COPY transaction per written part file (the Spark-side
    analog of the reference's 10k-row bounded INSERT transactions; on a
    real cluster each executor runs its part's COPY in parallel). Returns
    the number of part files shipped."""
    scratch = Path(scratch_dir)
    out_dir = scratch / f"pg_write_{uuid.uuid4().hex}"
    df.write.csv(str(out_dir), header=False, nullValue="\\N", emptyValue="")
    n = 0
    for part in sorted(out_dir.glob("part-*.csv")):
        server._psql(
            ["-d", db],
            sql=f"\\copy {table} from '{part}' with (format csv, null '\\N')",
        )
        n += 1
    return n


# ---------------------------------------------------------------------------
# Native packet execution — the live twin of reference test layer 5
# ---------------------------------------------------------------------------


def run_packet_native(
    server: PgServer,
    packet_dir: "str | Path",
    db: str = "postgres",
    placeholders: "dict[str, str] | None" = None,
) -> "dict[str, list]":
    """Execute a packet NATIVELY on live PostgreSQL — the live twin of the
    reference's test layer 5 (reference tests/test_packets.py:547-583 runs
    every alert_*/dba_* packet against a live DB and requires SUCCESS).
    Reuses the engine's own packet parser and placeholder engine
    (plans/packet.py — reference dbccore/dbccore.py:280-345, fan-out
    :921-1087) but every statement executes server-side through psql, the
    way the reference's wire driver did.

    Semantics mirrored from plans/runner.py:

    - ``run_once.sql`` executes first; generators evaluate strictly AFTER
      it (they may read tables it creates);
    - per-step ``NN_gen_obj.sql`` / ``NN_gen_nsp.sql`` generators evaluate
      server-side; the step text executes once per binding (cartesian
      nsp × obj when both exist), with ``GEN_NSP_FLD_i`` applied before
      ``GEN_OBJ_FLD_i``;
    - a generator row's field 0 is the maintenance side channel: when
      non-empty it executes natively before the bound action (the
      reference ran it on a dedicated maintenance connection);
    - multi-statement steps split dollar-quote-aware (plans/sqlsplit.py).

    Python steps have no native channel without a wire driver — they are
    recorded under the ``"skipped_py"`` key, not silently dropped.

    Channel note: psql's CSV rendering collapses SQL NULL to the empty
    string; the reference's driver yielded Python ``None`` which the
    placeholder engine rendered as the literal ``'None'`` (packets test
    for it — alert_int4_capacity's ``'GEN_OBJ_FLD_5' = 'None'``). Gen row
    fields 1+ map '' -> 'None' for that parity; field 0 (maint) stays raw
    so empty means no-op.

    Returns ``{step_file_name: [capture, ...]}`` — one psql capture
    (header + string rows, [] for non-queries) per executed statement.
    Raises :class:`PgServerError` on the first failing statement, i.e. a
    clean return IS the layer-5 SUCCESS criterion.
    """
    from db_converter_spark.plans.packet import apply_gen_placeholders, parse_packet
    from db_converter_spark.plans.sqlsplit import split_statements

    pkt = parse_packet(packet_dir, placeholders)
    captures: "dict[str, list]" = {}

    def _exec(text: str) -> "list[list[list[str]]]":
        return [server.sql(s, db=db) for s in split_statements(text) if s.strip()]

    if pkt.run_once is not None:
        captures[pkt.run_once.name] = _exec(pkt.run_once.text)

    gen_cache: "dict[str, list[tuple]]" = {}

    def _gen_rows(sql: str) -> "list[tuple]":
        rows = server.sql(sql, db=db)[1:]
        # field 0 (maint) raw; fields 1+ NULL-as-'None' for reference parity
        return [
            tuple([r[0]] + [("None" if c == "" else c) for c in r[1:]]) for r in rows
        ]

    def _bindings(step) -> "list[tuple[str, list[str]]]":
        if (pkt.gen_obj or pkt.gen_nsp) and not gen_cache:
            for idx, sql in pkt.gen_obj.items():
                gen_cache[f"obj:{idx}"] = _gen_rows(sql)
            for idx, sql in pkt.gen_nsp.items():
                gen_cache[f"nsp:{idx}"] = _gen_rows(sql)
        obj_rows = gen_cache.get(f"obj:{step.index}")
        nsp_rows = gen_cache.get(f"nsp:{step.index}")
        out: "list[tuple[str, list[str]]]" = []
        if obj_rows is not None and nsp_rows is not None:
            for nrow in nsp_rows:
                for orow in obj_rows:
                    sql = apply_gen_placeholders(step.text, nrow, "GEN_NSP")
                    sql = apply_gen_placeholders(sql, orow, "GEN_OBJ")
                    maints = []
                    if nrow and nrow[0]:
                        maints.append(str(nrow[0]))
                    if orow and orow[0]:
                        maints.append(apply_gen_placeholders(str(orow[0]), nrow, "GEN_NSP"))
                    out.append((sql, maints))
        elif obj_rows is not None:
            for orow in obj_rows:
                out.append((
                    apply_gen_placeholders(step.text, orow, "GEN_OBJ"),
                    [str(orow[0])] if orow and orow[0] else [],
                ))
        elif nsp_rows is not None:
            for nrow in nsp_rows:
                out.append((
                    apply_gen_placeholders(step.text, nrow, "GEN_NSP"),
                    [str(nrow[0])] if nrow and nrow[0] else [],
                ))
        else:
            out.append((step.text, []))
        return out

    for step in pkt.steps:
        if step.kind == "py":
            captures.setdefault("skipped_py", []).append(step.name)
            continue
        caps: list = []
        for action_sql, maints in _bindings(step):
            for mc in maints:
                _exec(mc)
            caps.extend(_exec(action_sql))
        captures[step.name] = caps
    return captures
