"""Process-wide device-access gate.

Single-tenant remote accelerator backends (the axon TPU relay) wedge when two
threads issue device work concurrently — most reliably when one of them is a
COMPILE (observed: warmup-thread compile vs predict-stage compile).  Every
subsystem that can run device work off the main thread serializes through
this one lock:

- ``postprocessing`` holds it across its jitted stats/IoU calls (which may
  compile on first use for a new bucket shape);
- ``prediction`` holds it across batch dispatch and fetch whenever the
  overlapped predict/postprocess pipeline is active (``detection.
  process_files`` overlap mode), so a postprocess stats compile can never
  interleave with an in-flight predict RPC.

An RLock: postprocess phases nest gate-holding helpers.
"""

from __future__ import annotations

import threading

DEVICE_GATE = threading.RLock()
