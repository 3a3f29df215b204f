"""Host memory-health probe: prints the first-touch MB/s of a 512 MiB
fresh-process allocation.

The sandbox VM backs guest memory lazily and (in sick windows) serves
first-touch page faults at ~5-20 MB/s while re-touch of resident pages
runs at GB/s -- see BASELINE.md.  Official scaling attempts are gated on
this number: run the probe, and only trust / record a `bench.py
--scaling` pair taken when the probe reports a healthy rate (hundreds of
MB/s), with the probe value logged next to the attempt.

Usage: python tools/host_probe.py  ->  prints one integer (MB/s).
"""
import time

import numpy as np

t0 = time.time()
a = np.ones(((512 << 20) // 8,), dtype=np.float64)
dt = time.time() - t0
print(f"{512 / dt:.0f}")
