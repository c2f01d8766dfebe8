"""Idempotency ledger — the ActionTracker rebuilt over SQLite.

The reference keeps four relational tables in each target PostgreSQL
(``dbc_packets``/``dbc_steps``/``dbc_actions``/``dbc_locks``; reference:
actiontracker/actiontracker.py:38-95) providing: exactly-once actions (md5
dedup), packet status, per-packet locks, wipe and status commands.

Here the ledger is driver-side orchestration state (small, transactional,
per-target) — a local SQLite file per target keeps the same schema and
semantics. On a shared cluster deployment the same class can point at any
DB-API target; the engine only needs single-row upserts and lookups.
(A Delta-table ledger would force a full Spark job per action lookup —
wrong tool for metadata of this shape.)
"""

from __future__ import annotations

import json
import sqlite3
import threading
from datetime import datetime, timezone
from pathlib import Path

_SCHEMA = """
CREATE TABLE IF NOT EXISTS dbc_packets (
  id INTEGER PRIMARY KEY AUTOINCREMENT,
  name TEXT NOT NULL UNIQUE,
  status TEXT NOT NULL DEFAULT 'started'
    CHECK (status IN ('done', 'started', 'exception')),
  dt TEXT,
  packet_hash TEXT NOT NULL,
  meta_data TEXT NOT NULL DEFAULT '{}'
);
CREATE TABLE IF NOT EXISTS dbc_steps (
  id INTEGER PRIMARY KEY AUTOINCREMENT,
  name TEXT NOT NULL,
  packet_id INTEGER NOT NULL REFERENCES dbc_packets(id),
  status TEXT CHECK (status IN ('done', 'started', 'exception')),
  dt TEXT,
  exception_descr TEXT
);
CREATE TABLE IF NOT EXISTS dbc_actions (
  dt TEXT,
  packet_id INTEGER NOT NULL REFERENCES dbc_packets(id),
  step_id INTEGER NOT NULL REFERENCES dbc_steps(id),
  step_hash TEXT NOT NULL,
  UNIQUE (packet_id, step_id, step_hash)
);
CREATE INDEX IF NOT EXISTS dbc_actions_hash ON dbc_actions(step_hash);
CREATE TABLE IF NOT EXISTS dbc_locks (
  id INTEGER PRIMARY KEY AUTOINCREMENT,
  name TEXT NOT NULL UNIQUE,
  locked INTEGER NOT NULL DEFAULT 1,
  dt TEXT
);
CREATE TABLE IF NOT EXISTS dbc_sequences (
  name TEXT PRIMARY KEY,
  last_value INTEGER,               -- NULL until first nextval (PG semantics)
  start_value INTEGER NOT NULL DEFAULT 1,
  increment INTEGER NOT NULL DEFAULT 1,
  owned_by TEXT                     -- 'schema.table.column' or NULL
);
"""


def _now() -> str:
    return datetime.now(timezone.utc).isoformat()


class ActionTracker:
    """Per-target ledger (reference: actiontracker/actiontracker.py)."""

    def __init__(self, ledger_path: str | Path):
        self.path = str(ledger_path)
        Path(self.path).parent.mkdir(parents=True, exist_ok=True)
        self._lock = threading.Lock()
        self._conn = sqlite3.connect(self.path, check_same_thread=False)
        with self._lock, self._conn:
            self._conn.executescript(_SCHEMA)

    def close(self) -> None:
        self._conn.close()

    # -- packets ----------------------------------------------------------

    def upsert_packet(self, name: str, packet_hash: str, meta: dict | None = None) -> int:
        with self._lock, self._conn:
            cur = self._conn.execute("SELECT id FROM dbc_packets WHERE name = ?", (name,))
            row = cur.fetchone()
            if row:
                self._conn.execute(
                    "UPDATE dbc_packets SET status='started', dt=?, packet_hash=? WHERE id=?",
                    (_now(), packet_hash, row[0]),
                )
                return row[0]
            cur = self._conn.execute(
                "INSERT INTO dbc_packets(name, status, dt, packet_hash, meta_data)"
                " VALUES (?, 'started', ?, ?, ?)",
                (name, _now(), packet_hash, json.dumps(meta or {})),
            )
            return cur.lastrowid

    def dump_packets(self) -> list[tuple]:
        """Ledger rows for the ``dbc_packets`` introspection view — the
        reference's packets SELECT from their own ledger table
        (reference: packets/test_insert_delete_select/01_step.sql:4); here
        the ledger is SQLite, so the runner snapshots it into a temp view."""
        with self._lock:
            cur = self._conn.execute(
                "SELECT id, name, status, dt, packet_hash, meta_data FROM dbc_packets"
            )
            return [tuple(r) for r in cur.fetchall()]

    def packet_hash(self, name: str) -> str | None:
        """For the hash-change guard (reference: dbccore/dbccore.py:449-463)."""
        cur = self._conn.execute("SELECT packet_hash FROM dbc_packets WHERE name = ?", (name,))
        row = cur.fetchone()
        return row[0] if row else None

    def set_packet_status(self, name: str, status: str) -> None:
        with self._lock, self._conn:
            self._conn.execute(
                "UPDATE dbc_packets SET status=?, dt=? WHERE name=?", (status, _now(), name)
            )

    # -- steps / actions --------------------------------------------------

    def upsert_step(self, packet_id: int, step_name: str) -> int:
        with self._lock, self._conn:
            cur = self._conn.execute(
                "SELECT id FROM dbc_steps WHERE packet_id=? AND name=?",
                (packet_id, step_name),
            )
            row = cur.fetchone()
            if row:
                self._conn.execute(
                    "UPDATE dbc_steps SET status='started', dt=? WHERE id=?", (_now(), row[0])
                )
                return row[0]
            cur = self._conn.execute(
                "INSERT INTO dbc_steps(name, packet_id, status, dt) VALUES (?, ?, 'started', ?)",
                (step_name, packet_id, _now()),
            )
            return cur.lastrowid

    def set_step_status(self, step_id: int, status: str, exception_descr: str | None = None) -> None:
        with self._lock, self._conn:
            self._conn.execute(
                "UPDATE dbc_steps SET status=?, dt=?, exception_descr=? WHERE id=?",
                (status, _now(), exception_descr, step_id),
            )

    def is_action_done(self, packet_id: int, step_id: int, step_hash: str) -> bool:
        """Exactly-once dedup (reference: actiontracker:101-116, dbccore:941-951)."""
        cur = self._conn.execute(
            "SELECT 1 FROM dbc_actions WHERE packet_id=? AND step_id=? AND step_hash=?",
            (packet_id, step_id, step_hash),
        )
        return cur.fetchone() is not None

    def apply_action(self, packet_id: int, step_id: int, step_hash: str) -> None:
        """Record a completed action (reference: actiontracker:200-223)."""
        with self._lock, self._conn:
            self._conn.execute(
                "INSERT OR IGNORE INTO dbc_actions(dt, packet_id, step_id, step_hash)"
                " VALUES (?, ?, ?, ?)",
                (_now(), packet_id, step_id, step_hash),
            )

    # -- locks ------------------------------------------------------------

    def try_lock(self, name: str) -> bool:
        """Per-(target, packet) mutex (reference: actiontracker:118-164)."""
        with self._lock, self._conn:
            cur = self._conn.execute("SELECT locked FROM dbc_locks WHERE name=?", (name,))
            row = cur.fetchone()
            if row and row[0]:
                return False
            self._conn.execute(
                "INSERT INTO dbc_locks(name, locked, dt) VALUES (?, 1, ?)"
                " ON CONFLICT(name) DO UPDATE SET locked=1, dt=excluded.dt",
                (name, _now()),
            )
            return True

    def unlock(self, name: str) -> None:
        with self._lock, self._conn:
            self._conn.execute(
                "UPDATE dbc_locks SET locked=0, dt=? WHERE name=?", (_now(), name)
            )

    # -- sequences --------------------------------------------------------
    # PG sequences re-homed in the ledger (SURVEY §7.4.6): the counter is
    # driver-side orchestration state exactly like action dedup — small,
    # transactional, serialized by design (PG serializes nextval too).
    # Executors never touch it: statements reserve a contiguous BLOCK up
    # front and distribute base+row_number, so 100 TB inserts cost ONE
    # counter update, not one per row.

    def seq_create(
        self,
        name: str,
        start: int = 1,
        increment: int = 1,
        if_not_exists: bool = False,
    ) -> None:
        with self._lock, self._conn:
            if if_not_exists:
                self._conn.execute(
                    "INSERT OR IGNORE INTO dbc_sequences(name, start_value, increment)"
                    " VALUES (?, ?, ?)",
                    (name, start, increment),
                )
            else:
                self._conn.execute(
                    "INSERT INTO dbc_sequences(name, start_value, increment)"
                    " VALUES (?, ?, ?)",
                    (name, start, increment),
                )

    def seq_drop(self, name: str, if_exists: bool = False) -> None:
        with self._lock, self._conn:
            cur = self._conn.execute("DELETE FROM dbc_sequences WHERE name=?", (name,))
            if cur.rowcount == 0 and not if_exists:
                raise KeyError(f'sequence "{name}" does not exist')

    def seq_alter(
        self,
        name: str,
        restart: int | None = None,
        restart_default: bool = False,
        increment: int | None = None,
        owned_by: str | None = None,
    ) -> None:
        with self._lock, self._conn:
            cur = self._conn.execute(
                "SELECT start_value, increment FROM dbc_sequences WHERE name=?",
                (name,),
            )
            row = cur.fetchone()
            if row is None:
                raise KeyError(f'sequence "{name}" does not exist')
            if restart_default:
                # bare RESTART: PG restarts from the stored START WITH value;
                # last_value→NULL makes the next nextval return start_value
                # without touching start_value itself
                self._conn.execute(
                    "UPDATE dbc_sequences SET last_value=NULL WHERE name=?",
                    (name,),
                )
            elif restart is not None:
                # RESTART WITH n: next nextval returns n. PG does NOT change
                # the sequence's START value here (that's the START clause),
                # so store last_value=n-increment instead of rewriting start
                self._conn.execute(
                    "UPDATE dbc_sequences SET last_value=? WHERE name=?",
                    (restart - row[1], name),
                )
            if increment is not None:
                self._conn.execute(
                    "UPDATE dbc_sequences SET increment=? WHERE name=?",
                    (increment, name),
                )
            if owned_by is not None:
                self._conn.execute(
                    "UPDATE dbc_sequences SET owned_by=? WHERE name=?",
                    (owned_by if owned_by.upper() != "NONE" else None, name),
                )

    def seq_nextval(self, name: str, block: int = 1) -> int:
        """Reserve ``block`` consecutive values; return the FIRST. One
        transactional counter bump regardless of block size."""
        if block < 1:
            raise ValueError("block must be >= 1")
        with self._lock, self._conn:
            cur = self._conn.execute(
                "SELECT last_value, start_value, increment FROM dbc_sequences"
                " WHERE name=?",
                (name,),
            )
            row = cur.fetchone()
            if row is None:
                raise KeyError(f'sequence "{name}" does not exist')
            last, start, inc = row
            first = start if last is None else last + inc
            new_last = first + (block - 1) * inc
            self._conn.execute(
                "UPDATE dbc_sequences SET last_value=? WHERE name=?",
                (new_last, name),
            )
            return first

    def seq_info(self, name: str) -> tuple[int | None, int, int]:
        """(last_value, start_value, increment) — raises on unknown name."""
        cur = self._conn.execute(
            "SELECT last_value, start_value, increment FROM dbc_sequences"
            " WHERE name=?",
            (name,),
        )
        row = cur.fetchone()
        if row is None:
            raise KeyError(f'sequence "{name}" does not exist')
        return row

    def seq_currval(self, name: str) -> int:
        cur = self._conn.execute(
            "SELECT last_value FROM dbc_sequences WHERE name=?", (name,)
        )
        row = cur.fetchone()
        if row is None:
            raise KeyError(f'sequence "{name}" does not exist')
        if row[0] is None:
            raise ValueError(f'currval of sequence "{name}" is not yet defined')
        return row[0]

    def seq_setval(self, name: str, value: int, is_called: bool = True) -> int:
        """PG ``setval(seq, n[, is_called])``: with ``is_called`` true
        (default) the next nextval returns n+increment; with false it
        returns n (stored as last_value=n-increment). Returns n."""
        with self._lock, self._conn:
            if not is_called:
                cur = self._conn.execute(
                    "SELECT increment FROM dbc_sequences WHERE name=?", (name,)
                )
                row = cur.fetchone()
                if row is None:
                    raise KeyError(f'sequence "{name}" does not exist')
                stored = value - row[0]
            else:
                stored = value
            cur = self._conn.execute(
                "UPDATE dbc_sequences SET last_value=? WHERE name=?", (stored, name)
            )
            if cur.rowcount == 0:
                raise KeyError(f'sequence "{name}" does not exist')
            return value

    def seq_owned_map(self) -> dict[str, str]:
        """All recorded ownerships: {'table.column' → sequence name}."""
        return {
            r[0]: r[1]
            for r in self._conn.execute(
                "SELECT owned_by, name FROM dbc_sequences WHERE owned_by IS NOT NULL"
            )
        }

    def seq_owned_by(self, qualified_column: str) -> str | None:
        """pg_get_serial_sequence lookup: 'schema.table.column' → name."""
        cur = self._conn.execute(
            "SELECT name FROM dbc_sequences WHERE owned_by=?", (qualified_column,)
        )
        row = cur.fetchone()
        return row[0] if row else None

    # -- commands ---------------------------------------------------------

    def status(self, packet_name: str | None = None) -> list[tuple]:
        """--status output (reference: db_converter.py:526-539)."""
        q = (
            "SELECT p.name, p.status, p.dt, s.name, s.status, s.exception_descr"
            " FROM dbc_packets p LEFT JOIN dbc_steps s ON s.packet_id = p.id"
        )
        args: tuple = ()
        if packet_name:
            q += " WHERE p.name = ?"
            args = (packet_name,)
        return list(self._conn.execute(q + " ORDER BY p.name, s.id", args))

    def wipe(self, packet_name: str) -> int:
        """--wipe: cascade-delete packet history (reference: actiontracker:
        257-294). Returns number of packets wiped."""
        with self._lock, self._conn:
            cur = self._conn.execute("SELECT id FROM dbc_packets WHERE name=?", (packet_name,))
            row = cur.fetchone()
            if not row:
                return 0
            pid = row[0]
            self._conn.execute("DELETE FROM dbc_actions WHERE packet_id=?", (pid,))
            self._conn.execute("DELETE FROM dbc_steps WHERE packet_id=?", (pid,))
            self._conn.execute("DELETE FROM dbc_packets WHERE id=?", (pid,))
            return 1
