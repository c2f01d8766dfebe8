"""Result formatting: fixed-width ASCII tables and the golden-output JSON.

Fills the same role as the reference's formatters (print_table at
dbccore/dbccore.py:39-48; to_json at psc/psccommon/psc_common.py:84-93; the
``?column?`` anonymous-column rule at dbccore/dbccore.py:746-749, 872-875)
but is NOT a byte-level port: the reference emits pipe-delimited rows with
full-width rules; this emits two-space-joined columns with per-column
underlines. Output is byte-STABLE against this repo's own golden `_out`
files, which is what the golden tests diff.
"""

from __future__ import annotations

import datetime
import decimal
import json


ANON_COLUMN = "?column?"


def normalize_columns(names: list[str | None], width: int) -> list[str]:
    """Pad/replace missing column names with PG's ``?column?`` placeholder."""
    out = [n if n else ANON_COLUMN for n in names]
    out += [ANON_COLUMN] * (width - len(out))
    return out[:width] if width else out


def print_table_reference(table: list[list]) -> str:
    """BYTE-compatible twin of the reference's table format (behavior of
    dbccore/dbccore.py:39-48, reimplemented): pipe-delimited cells
    (``| a | b |``), per-column width = max stringified length, numbers
    right-aligned / strings left-aligned (Python width-format semantics the
    reference relies on), and a full-width dashed rule printed above the
    header row AND between header and first data row. Values the width
    format can't take directly (None, nested types) fall back to ``str``;
    the reference would crash there, so its callers always pre-stringify.
    The repo's own goldens use :func:`print_table`; this twin exists for
    diffing against output captured from the reference itself."""
    if not table:
        return ""
    widths = [max(len(str(x)) for x in col) for col in zip(*table)]
    out: list[str] = []
    for rn, row in enumerate(table):
        cells = []
        for i, x in enumerate(row):
            try:
                cells.append("{:{}}".format(x, widths[i]))
            except (TypeError, ValueError):
                cells.append("{:{}}".format(str(x), widths[i]))
        line = "| " + " | ".join(cells) + " |"
        if rn <= 1:
            out.append("-" * len(line))
        out.append(line)
    return "\n".join(out) + "\n"


def print_table(table: list[list]) -> str:
    """Fixed-width ASCII table with a dashed underline under the header row
    (same role as dbccore/dbccore.py:39-48 but a different format — see the
    module docstring; :func:`print_table_reference` is the byte-compatible
    twin). ``table[0]`` is the header."""
    if not table:
        return "\n"
    cells = [[_to_str(v) for v in row] for row in table]
    widths = [max(len(r[i]) for r in cells) for i in range(len(cells[0]))]
    out = []
    for ri, row in enumerate(cells):
        out.append("  ".join(v.ljust(w) for v, w in zip(row, widths)).rstrip())
        if ri == 0:
            out.append("  ".join("-" * w for w in widths))
    return "\n".join(out) + "\n"


def _to_str(v) -> str:
    """Python str() semantics, matching the reference's row stringification
    (reference: dbccore/dbccore.py:760-768 uses str(v) for CSV too)."""
    if v is None:
        return ""
    return str(v)


def _jsonable(v):
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return str(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    return v


def to_json(obj) -> str:
    """Golden-output serialization: pretty JSON, indent 4, sorted keys
    (reference: psc/psccommon/psc_common.py:84-93)."""
    return json.dumps(_jsonable(obj), indent=4, sort_keys=True, default=str)


def diff_golden(actual: str, expected: str, skip_marker: str = "<SKIP>") -> list[str]:
    """Line diff that masks volatile lines containing ``<SKIP>`` in the
    golden file (reference: tests/test_packets.py:922-928)."""
    a_lines = actual.splitlines()
    e_lines = expected.splitlines()
    out = []
    for i in range(max(len(a_lines), len(e_lines))):
        a = a_lines[i] if i < len(a_lines) else "<missing>"
        e = e_lines[i] if i < len(e_lines) else "<missing>"
        if skip_marker in e:
            continue
        if a != e:
            out.append(f"line {i + 1}: expected {e!r}, got {a!r}")
    return out
