"""Result model — the engine's public contract, mirroring the reference's
enums and ``DBCResult`` (reference: db_converter.py:339-369) so tests and
callers port over unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


class CommandType(Enum):
    RUN = "run"
    LIST = "list"
    STATUS = "status"
    WIPE = "wipe"
    UNLOCK = "unlock"
    STOP = "stop"


class PacketType(Enum):
    DEFAULT = "default"
    READ_ONLY = "read_only"
    NO_COMMIT = "no_commit"
    MAINTENANCE = "maintenance"
    EXPORT_DATA = "export_data"


class ResultCode(Enum):
    SUCCESS = "success"
    FAIL = "fail"
    LOCKED = "locked"
    TERMINATE = "terminate"
    NOTHING_TODO = "nothing_todo"


class PacketStatus(Enum):
    NEW = "new"
    STARTED = "started"
    DONE = "done"
    EXCEPTION = "exception"


class StepStatus(Enum):
    STARTED = "started"
    DONE = "done"
    EXCEPTION = "exception"


class PLRaiseError(Exception):
    """A deliberate plpgsql ``RAISE EXCEPTION`` — the reference's alerting
    channel, NOT a failure: the engine routes it to the error hook and the
    packet continues to completion (reference: dbccore/dbccore.py:1126-1128
    catches PLPGSQLRaiseError → raise_error_logic, run continues; that is
    why tests/test_packets.py expects packets/test_raise to end SUCCESS).
    DO-block py twins raise this to alert."""


@dataclass
class DBCResult:
    """What ``PacketRunner.run`` returns (reference: db_converter.py:364-369).

    ``result_data[db_name][step_name]`` holds the captured per-statement
    results: SELECT → (column_names, rows); DML → command-status tuple;
    RAISE/notice → (severity, message).
    """

    command_type: CommandType
    packet_type: PacketType
    result_code: dict[str, ResultCode] = field(default_factory=dict)
    packet_status: dict[str, PacketStatus] = field(default_factory=dict)
    result_data: dict[str, dict[str, list]] = field(default_factory=dict)
