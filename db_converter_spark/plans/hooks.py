"""Chat notification hooks — Mattermost/Slack-style incoming webhooks
(reference: resultset_hook at dbccore/dbccore.py:629-706, raise_error_logic
at :1183-1219, matterhook/incoming.py:46-57).

The reference renders captured resultsets as fixed-width tables inside
markdown code fences and POSTs them to an incoming-webhook URL, filtered by
a per-packet ``verbosity`` setting. Same here; the HTTP transport is a
plain stdlib ``urllib`` POST and is injectable so tests (and air-gapped
runs) can capture payloads instead of sending them.

Verbosity levels (reference: dbccore/dbccore.py:648-668):
- ``all``        — parameters + raises + every resultset
- ``resultset``  — resultsets only
- ``raise``      — RAISE/NOTICE messages only
- ``stm_result`` — per-statement command tags only
"""

from __future__ import annotations

import json
import urllib.request
from collections.abc import Callable

from db_converter_spark.plans.formatter import print_table

Transport = Callable[[str, bytes, dict], int]


def _http_transport(url: str, body: bytes, headers: dict) -> int:
    req = urllib.request.Request(url, data=body, headers=headers, method="POST")
    with urllib.request.urlopen(req, timeout=30) as resp:  # noqa: S310 — webhook URL is operator config
        return resp.status


def render_hook_message(
    packet_name: str,
    db_name: str,
    step_results: dict[str, list],
    messages: list[tuple[str, str]] | None = None,
    parameters: list | None = None,
    verbosity: str = "all",
) -> str:
    """Markdown payload: header, optional parameters, raises, resultsets as
    code-fenced fixed-width tables (reference: dbccore/dbccore.py:669-688)."""
    out = [f"##### packet `{packet_name}` @ `{db_name}`"]
    if parameters and verbosity == "all":
        out.append("**Parameters:** " + ", ".join(str(p) for p in parameters))
    if messages and verbosity in ("all", "raise"):
        for sev, text in messages:
            out.append(f"**{sev}**: {text}")
    if verbosity in ("all", "resultset", "stm_result"):
        for step, results in step_results.items():
            for res in results:
                if not isinstance(res, list) or not res:
                    continue
                is_table = isinstance(res[0], list) and len(res) > 1
                if verbosity == "stm_result" and is_table:
                    continue
                if is_table:
                    out.append(f"`{step}`\n```\n{print_table(res)}```")
                else:
                    out.append(f"`{step}`: {res[0] if res else ''}")
    return "\n".join(out)


class ChatHook:
    """Incoming-webhook client (reference: matterhook/incoming.py).

    ``transport`` defaults to a real HTTP POST; inject a callable to capture
    payloads in tests."""

    def __init__(
        self,
        url: str,
        channel: str | None = None,
        username: str | None = None,
        transport: Transport | None = None,
    ):
        self.url = url
        self.channel = channel
        self.username = username
        self.transport = transport or _http_transport

    def push(self, text: str) -> int:
        payload: dict = {"text": text}
        if self.channel:
            payload["channel"] = self.channel
        if self.username:
            payload["username"] = self.username
        body = json.dumps(payload).encode()
        return self.transport(self.url, body, {"Content-Type": "application/json"})


def notify_results(
    hook: ChatHook | None,
    packet_name: str,
    db_name: str,
    step_results: dict[str, list],
    messages: list[tuple[str, str]] | None = None,
    verbosity: str = "all",
) -> str | None:
    """Render + push in one call; returns the rendered text (None if no
    hook configured). Errors in the transport are swallowed — notification
    failure must never fail a packet (reference behavior)."""
    if hook is None:
        return None
    text = render_hook_message(
        packet_name, db_name, step_results, messages, verbosity=verbosity
    )
    try:
        hook.push(text)
    except Exception:  # noqa: BLE001 — advisory channel
        pass
    return text


def notify_error(hook: ChatHook | None, packet_name: str, db_name: str, error: str) -> None:
    """Exception push (reference: raise_error_logic, dbccore:1183-1219)."""
    if hook is None:
        return
    try:
        hook.push(f"##### :x: packet `{packet_name}` @ `{db_name}` failed\n```\n{error}\n```")
    except Exception:  # noqa: BLE001
        pass
