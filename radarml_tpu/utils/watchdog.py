"""One-JSON-line watchdog for benchmark entry points.

Device discovery over the dev TPU tunnel can hang INDEFINITELY during
outage episodes (CLAUDE.md) — in the worst ones even ``jax.devices()``
never returns, which no in-process timeout can interrupt. The driver
contract is that ``bench.py`` (and its ``--serving`` alias) prints
exactly one JSON line; this watchdog keeps that contract by printing
an error line and hard-exiting if the caller hasn't signalled device
readiness in time.
"""

from __future__ import annotations

import json
import os
import threading


def start_json_watchdog(metric: str, timeout_s: float = 900.0):
    """Arm a device-discovery watchdog; returns the 'ready' Event.

    Call ``.set()`` on the returned event after the first successful
    device round-trip (e.g. ``warm_transfers()``). If it isn't set
    within `timeout_s`, the watchdog prints a one-line error JSON
    (value 0, ``error`` explaining the outage) and ``os._exit(2)``s —
    compiles after readiness may take arbitrarily long, so only the
    discovery window is policed.
    """
    ready = threading.Event()

    def _watch():
        if not ready.wait(timeout=timeout_s):
            print(
                json.dumps(
                    {
                        "metric": metric,
                        "value": 0.0,
                        "unit": "scans/s",
                        "vs_baseline": 0.0,
                        "error": (
                            "device discovery timed out "
                            "(TPU tunnel outage)"
                        ),
                    }
                ),
                flush=True,
            )
            os._exit(2)

    threading.Thread(target=_watch, daemon=True).start()
    return ready
