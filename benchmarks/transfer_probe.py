"""Host->device transfer throughput probe (stdio relay).

The axon transport relays host<->device traffic over stdio; CLAUDE.md
records MB-scale transfers as "minutes" and wedge-prone, but that figure
was anecdotal (device->host fetches). Large one-time uploads — e.g. the
61 MB compact supernodal schedule at n=35937 — need a measured number to
decide whether an on-chip run is safe. This probe times `jax.device_put`
of numpy arrays at doubling sizes with a scalar fetch fence after each,
and stops early if the projected next step exceeds ``--budget-s``.

Usage (real chip):
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/transfer_probe.py
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes-mb", type=str, default="0.25,1,4,16")
    ap.add_argument("--budget-s", type=float, default=120.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # Warm the transport + compile the fence program once.
    fence = jax.jit(lambda x: x.ravel()[::65536].sum())
    x = jax.device_put(np.ones(1024, np.float32))
    float(fence(x))

    results = []
    rate = None
    for mb in (float(s) for s in args.sizes_mb.split(",")):
        n = int(mb * (1 << 20) / 4)
        if rate is not None and mb / rate > args.budget_s:
            results.append({"mb": mb, "skipped": "projected over budget"})
            break
        host = np.random.default_rng(0).standard_normal(n).astype(np.float32)
        t0 = time.time()
        dev = jax.device_put(host)
        float(fence(dev))  # scalar fetch: proves the upload landed
        dt = time.time() - t0
        rate = mb / dt
        results.append({"mb": mb, "s": round(dt, 3),
                        "mb_per_s": round(rate, 3)})
        print(json.dumps(results[-1]), flush=True)
        del dev

    print(json.dumps({"metric": "host_to_device_transfer",
                      "backend": jax.default_backend(),
                      "results": results}))


if __name__ == "__main__":
    main()
