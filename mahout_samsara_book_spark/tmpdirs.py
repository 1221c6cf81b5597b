"""Process-exit cleanup registry for fixture temp directories
(VERDICT r11 item 7).

Several graded fixtures stage state under ``tempfile.gettempdir()`` —
persisted dedup indexes, lifecycle working copies, streaming batch
layouts, format-roundtrip tables.  Each is keyed per (pid, sequence)
so concurrent processes never collide, but that also means every
process (bench, the oracle gate, pytest) used to leave its own copies
behind at exit — bounded and small at sf0.1, GBs per process at sf10.
``register_tmpdir`` records every such path; one ``atexit`` hook
removes them all when the process ends.  Removal is best-effort
(``ignore_errors``): at atexit time the paths are pure disk state —
any Spark plan that read them has either executed or never will.
"""

from __future__ import annotations

import atexit
import os
import shutil
import signal
import threading

_DIRS: set[str] = set()


def register_tmpdir(path: str) -> str:
    """Mark ``path`` for recursive removal at process exit; returns it
    unchanged so creation sites can wrap in place."""
    _DIRS.add(path)
    return path


def _purge() -> None:
    for p in sorted(_DIRS):
        shutil.rmtree(p, ignore_errors=True)
    _DIRS.clear()


atexit.register(_purge)


def _sigterm_purge(signum, frame):  # pragma: no cover — signal path
    _purge()
    signal.signal(signum, signal.SIG_DFL)
    os.kill(os.getpid(), signum)


# Python's default SIGTERM disposition kills the process WITHOUT
# running atexit hooks — a `timeout`-terminated bench/oracle run would
# leave every staged fixture behind (observed: a TERM-killed run left
# its asof/ingest stagings in /tmp while normal exits cleaned up).
# Install a purge-then-reraise handler, but only when nothing else has
# claimed SIGTERM and we're on the main thread (signal.signal throws
# elsewhere); hosts with their own handlers keep them.
try:
    if (
        threading.current_thread() is threading.main_thread()
        and signal.getsignal(signal.SIGTERM) == signal.SIG_DFL
    ):
        signal.signal(signal.SIGTERM, _sigterm_purge)
except Exception:  # noqa: BLE001 — cleanup must never break import
    pass
