"""Job watchdog — the Spark reinterpretation of the reference's lock
observer (reference: lock_observer at dbccore/dbccore.py:155-273).

PostgreSQL needed a sidecar thread that cancels our backend when it blocks
other transactions or waits on a heavyweight lock too long. Spark has no
lock manager, so the parity feature is a **per-step timeout watchdog**: a
timer that cancels the step's job group when it exceeds its budget — the
analog of ``statement_timeout`` + ``cancel_wait_tx_timeout`` (reference:
db_converter.py:64-65,78). The runner maps the packet's
``statement_timeout`` meta key onto this.

Cancelled steps surface as ordinary step exceptions, so the ledger keeps
them un-applied and a later re-run resumes exactly there (E22 semantics).
"""

from __future__ import annotations

import threading

from pyspark.sql import SparkSession


class StepWatchdog:
    """Context manager: cancel ``job_group`` if the body runs too long.

    >>> with StepWatchdog(spark, "dbc_db1_pkt", timeout_s=3600) as wd:
    ...     spark.sql(...).collect()
    >>> wd.fired
    False
    """

    def __init__(self, spark: SparkSession, job_group: str, timeout_s: float | None):
        self.spark = spark
        self.job_group = job_group
        self.timeout_s = timeout_s
        self.fired = False
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def _run(self) -> None:
        if self._stop.wait(self.timeout_s):
            return  # body finished inside the budget
        self.fired = True
        # cancel REPEATEDLY until the step exits: cancelJobGroup only hits
        # jobs active at call time, so a one-shot cancel no-ops when the
        # step's job is still in scheduler queue (observed under load) and
        # the late-starting job would run to completion
        while not self._stop.is_set():
            self.spark.sparkContext.cancelJobGroup(self.job_group)
            self._stop.wait(0.5)

    def __enter__(self) -> StepWatchdog:
        if self.timeout_s is not None and self.timeout_s > 0:
            self._thread = threading.Thread(target=self._run, daemon=True)
            self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)


def install_sigint_cancel(spark: SparkSession):
    """SIGINT/SIGTERM → cancel all Spark jobs (reference: SignalHandler →
    wire-level CancelRequest, psc/psccommon/psc_common.py:49-81,
    dbccore/dbccore.py:148-153). Returns the previous handlers so a CLI can
    restore them."""
    import signal

    prev = {}

    def handler(signum, frame):  # noqa: ARG001
        spark.sparkContext.cancelAllJobs()
        raise KeyboardInterrupt

    for sig in (signal.SIGINT, signal.SIGTERM):
        prev[sig] = signal.signal(sig, handler)
    return prev
