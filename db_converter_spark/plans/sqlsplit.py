"""Statement splitting and classification.

The reference leans on sqlparse for splitting (reference:
dbccore/dbccore.py:852) and on token sniffing for DML/DDL detection
(reference: dbccore/dbccore.py:728-738). sqlparse isn't available here, so
this is a small from-scratch splitter that understands:

- single quotes (with '' escapes), double-quoted identifiers
- line comments ``--`` and block comments ``/* ... */`` (nested OK)
- PG dollar-quoting ``$$ .. $$`` / ``$tag$ .. $tag$`` (packet SQL uses it
  for DO blocks; we split around them correctly even though DO blocks are
  handled by py-steps per SURVEY §2.10)
"""

from __future__ import annotations

import re

_STMT_KIND_RE = re.compile(r"^\s*([a-zA-Z]+)")

# Statements that must run outside any transactional batch (reference:
# db_converter.py:22-31 non_tx_ops) — retained as a routing classifier.
NON_TX_PREFIXES = (
    "vacuum",
    "create database",
    "drop database",
    "create tablespace",
    "drop tablespace",
    "alter system",
    "reindex",
    "create index concurrently",
    "drop index concurrently",
)


def split_statements(sql: str) -> list[str]:
    """Split a script into individual statements on top-level semicolons."""
    stmts: list[str] = []
    buf: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        nxt = sql[i + 1] if i + 1 < n else ""
        if ch == "-" and nxt == "-":  # line comment
            j = sql.find("\n", i)
            j = n if j < 0 else j
            buf.append(sql[i:j])
            i = j
            continue
        if ch == "/" and nxt == "*":  # block comment (nesting per PG)
            depth, j = 1, i + 2
            while j < n and depth:
                if sql.startswith("/*", j):
                    depth, j = depth + 1, j + 2
                elif sql.startswith("*/", j):
                    depth, j = depth - 1, j + 2
                else:
                    j += 1
            buf.append(sql[i:j])
            i = j
            continue
        if ch == "'":  # string literal, '' escapes
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    j += 1
                    break
                j += 1
            buf.append(sql[i:j])
            i = j
            continue
        if ch == '"':  # quoted identifier
            j = sql.find('"', i + 1)
            j = n if j < 0 else j + 1
            buf.append(sql[i:j])
            i = j
            continue
        if ch == "$":  # dollar quoting
            m = re.match(r"\$[A-Za-z_]*\$", sql[i:])
            if m:
                tag = m.group(0)
                j = sql.find(tag, i + len(tag))
                j = n if j < 0 else j + len(tag)
                buf.append(sql[i:j])
                i = j
                continue
        if ch == ";":
            stmt = "".join(buf).strip()
            if stmt and _strip_leading_comments(stmt):
                stmts.append(stmt)
            buf = []
            i += 1
            continue
        buf.append(ch)
        i += 1
    tail = "".join(buf).strip()
    # comment-only fragments (e.g. a trailing '-- tx end' marker) are not
    # statements — the reference's sqlparse splitter drops them too
    if tail and _strip_leading_comments(tail):
        stmts.append(tail)
    return stmts


def mask_strings(sql: str) -> str:
    """Same-length copy with string literals, quoted identifiers, comments,
    and dollar-quoted bodies blanked to spaces. Keyword/operator scanning
    over the mask maps indices 1:1 onto the original text, so a WHERE or
    comma INSIDE a literal can never be mistaken for syntax (quote rules
    identical to :func:`split_statements`)."""
    out = list(sql)
    i, n = 0, len(sql)

    def blank(a: int, b: int) -> None:
        for k in range(a, min(b, n)):
            if out[k] != "\n":
                out[k] = " "

    while i < n:
        ch = sql[i]
        nxt = sql[i + 1] if i + 1 < n else ""
        if ch == "-" and nxt == "-":
            j = sql.find("\n", i)
            j = n if j < 0 else j
            blank(i, j)
            i = j
            continue
        if ch == "/" and nxt == "*":
            depth, j = 1, i + 2
            while j < n and depth:
                if sql.startswith("/*", j):
                    depth, j = depth + 1, j + 2
                elif sql.startswith("*/", j):
                    depth, j = depth - 1, j + 2
                else:
                    j += 1
            blank(i, j)
            i = j
            continue
        if ch == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    j += 1
                    break
                j += 1
            blank(i + 1, j - 1)
            i = j
            continue
        if ch == '"':
            j = sql.find('"', i + 1)
            j = n if j < 0 else j + 1
            blank(i + 1, j - 1)
            i = j
            continue
        if ch == "$":
            m = re.match(r"\$[A-Za-z_]*\$", sql[i:])
            if m:
                tag = m.group(0)
                j = sql.find(tag, i + len(tag))
                j = n if j < 0 else j + len(tag)
                blank(i + len(tag), j - len(tag))
                i = j
                continue
        i += 1
    return "".join(out)


def _strip_leading_comments(stmt: str) -> str:
    prev = None
    while prev != stmt:
        prev = stmt
        stmt = re.sub(r"^\s*--[^\n]*(\n|$)", "", stmt)
        stmt = re.sub(r"^\s*/\*.*?\*/", "", stmt, flags=re.S)
        stmt = stmt.lstrip()
    return stmt


def statement_kind(stmt: str) -> str:
    """Classify: 'query' (produces rows), 'dml', 'ddl', 'utility'."""
    s = _strip_leading_comments(stmt).lower()
    head = _STMT_KIND_RE.match(s)
    kw = head.group(1) if head else ""
    if kw in ("select", "with", "values", "table", "show", "describe", "desc", "explain"):
        return "query"
    if kw in ("insert", "update", "delete", "merge", "copy", "truncate"):
        return "dml"
    if kw in ("create", "drop", "alter", "comment", "rename", "msck"):
        return "ddl"
    return "utility"


def is_non_tx(stmt: str) -> bool:
    s = _strip_leading_comments(stmt).lower()
    return any(s.startswith(p) for p in NON_TX_PREFIXES)


# Non-query statements a READ ONLY packet may run. ALLOWLIST, not a
# default-permit: the reference's READ ONLY transaction rejects every write,
# so an unrecognized leading keyword (LOAD, CALL, future syntax) must be
# rejected too — the 'utility' kind bucket is exactly the unknown remainder.
_RO_UTILITY_KEYWORDS = frozenset(
    {"set", "reset", "show", "describe", "desc", "refresh", "analyze", "use", "explain"}
)


def is_read_only_ok(stmt: str) -> bool:
    """Would PostgreSQL's READ ONLY transaction accept this? (reference:
    execute_ro_step rejects writes → ReadOnlyTransactionError,
    dbccore/dbccore.py:1221-1402)."""
    s = _strip_leading_comments(stmt).lower()
    head = _STMT_KIND_RE.match(s)
    kw = head.group(1) if head else ""
    if statement_kind(stmt) == "query":
        return not is_non_tx(stmt)
    return kw in _RO_UTILITY_KEYWORDS and not is_non_tx(stmt)
