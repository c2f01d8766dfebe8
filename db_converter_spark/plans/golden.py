"""Golden-output testing — the reference's ``DBCPacketUnitTest`` harness
(reference: tests/test_packets.py:844-939): run a packet, JSON-serialize
each step's captured resultsets, diff against ``<step>_out`` golden files
stored in the packet directory. Volatile lines are masked with ``<SKIP>``
(reference: :922-928); missing goldens are auto-created on first run
(reference: :906-911).
"""

from __future__ import annotations

from pathlib import Path

from db_converter_spark.plans.formatter import diff_golden, to_json
from db_converter_spark.plans.model import DBCResult


def check_golden_outputs(
    packet_dir: str | Path,
    result: DBCResult,
    db: str,
    update: bool = False,
) -> dict[str, list[str]]:
    """Compare ``result.result_data[db]`` against the packet's ``*_out``
    goldens. Returns {step_name: [diff lines]}; empty dict = all match.
    Missing goldens are created (and reported as created, not failed) —
    the reference's auto-create-on-first-run behavior."""
    packet_dir = Path(packet_dir)
    diffs: dict[str, list[str]] = {}
    for step_name, results in result.result_data.get(db, {}).items():
        golden_path = packet_dir / f"{step_name}_out"
        actual = to_json(results)
        if not golden_path.exists() or update:
            golden_path.write_text(actual)
            continue
        d = diff_golden(actual, golden_path.read_text())
        if d:
            diffs[step_name] = d
    return diffs
