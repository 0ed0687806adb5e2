"""Hard-exit watchdogs for device-tunnel hangs — the one shared copy.

When the axon relay is down, PJRT backend init (and sometimes a remote
compile) blocks forever inside a C call: no Python-level timeout fires
and SIGTERM's handler never runs because the main thread never returns
to the bytecode loop. The only reliable escape is a daemon thread that
os._exit()s. Exit-code taxonomy (docs/PERF.md "availability note"):
rc 3 = init/step didn't complete in time, rc 4 = whole-run deadline.

Lives at the repo root next to _cpu_pin.py for the same reason: it must
be importable before any jax API runs (bench.py, __graft_entry__.py).
"""

from __future__ import annotations

import os
import sys
import threading


def arm(timeout_s: float, message: str, rc: int = 3):
    """Start a daemon watchdog; returns a threading.Event.

    If the event is not set within timeout_s, prints `message` to stderr
    and hard-exits with `rc` (os._exit — works even when the main thread
    is stuck in C). Call .set() on success to disarm; for a whole-run
    deadline, simply never set it (normal process exit wins the race).
    A timeout_s <= 0 disables the watchdog (the returned Event is inert).
    """
    done = threading.Event()
    if timeout_s <= 0:
        return done

    def watchdog():
        if not done.wait(timeout_s):
            print(message, file=sys.stderr)
            sys.stderr.flush()
            os._exit(rc)

    threading.Thread(target=watchdog, daemon=True).start()
    return done
