"""Tunnel round-trip probe: quantify TODAY'S host<->device latency.

The recorded chip numbers (BASELINE.md rounds 4-5) assume ~38 ms per
fetch / ~34 ms per upload through the axon tunnel.  The tunnel is a
shared service: on a slow day every event-rate measurement scales with
the real RTT, so long-run comparisons across sessions must normalise by
this probe's output (one JSON line) — not assume the constant.

Run bare:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/rtt_probe.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    dev = str(jax.devices()[0])
    x = jnp.ones((8, 128), jnp.float32)
    s = float(jnp.sum(x))                    # warm the path
    fetch, upload, dispatch = [], [], []
    f = jax.jit(lambda a: a * 2.0 + s)
    y = f(x)
    float(jnp.sum(y))                        # compile + settle
    for _ in range(20):
        t0 = time.perf_counter()
        float(jnp.sum(y))                    # one scalar fetch
        fetch.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        z = jnp.asarray(np.ones((8, 128), np.float32))
        upload.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        y = f(z)                             # async dispatch cost
        dispatch.append(time.perf_counter() - t0)
    med = lambda v: round(1e3 * float(np.median(v)), 1)
    print(json.dumps({
        "device": dev,
        "fetch_ms_median": med(fetch), "fetch_ms_min": round(1e3 * min(fetch), 1),
        "upload_ms_median": med(upload),
        "dispatch_ms_median": med(dispatch),
    }), flush=True)


if __name__ == "__main__":
    main()
