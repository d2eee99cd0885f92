#!/usr/bin/env python
"""Run a python script with the channel-preflight watchdog.

The axon tunnel's per-process channel setup can wedge for 25+ min with
zero socket traffic (PERF.md "BLOCKED twice by channel-setup stalls").
This wrapper forces a device readback in a daemon thread immediately;
if it has not completed within ANNEMBED_CHANNEL_DEADLINE_S (default
300 s) the process exits 17 so the chain's retry loop relaunches
cheaply.  Usage:

    python tools/with_preflight.py <script.py> [script args...]
"""

import os
import runpy
import sys
import threading
import time

import numpy as np


def main():
    deadline = float(os.environ.get("ANNEMBED_CHANNEL_DEADLINE_S",
                                    "300") or 300)
    target = sys.argv[1]
    sys.argv = sys.argv[1:]

    ok = threading.Event()

    def probe():
        import jax
        t = time.perf_counter()
        try:
            v = jax.device_put(np.float32(1.0))
            np.asarray(v)
            ok.set()
            print(f"channel preflight ok ({time.perf_counter() - t:.1f}"
                  " s)", file=sys.stderr, flush=True)
        except Exception as exc:  # pragma: no cover - remote only
            print(f"channel preflight error: {exc}", file=sys.stderr,
                  flush=True)

    def watch():
        if not ok.wait(deadline):
            print(f"channel preflight DEADLINE ({deadline:.0f} s): "
                  "wedged channel, exit 17", file=sys.stderr, flush=True)
            os._exit(17)

    if deadline > 0:
        threading.Thread(target=probe, daemon=True).start()
        threading.Thread(target=watch, daemon=True).start()
    runpy.run_path(target, run_name="__main__")


if __name__ == "__main__":
    main()
