"""Probe the ENVIRONMENT's host->device transfer path for RSS retention.

Why this exists (round-5 soak diagnosis): a 240 s serving soak showed the
daemon's RSS growing at almost exactly the request-byte rate (4,745 MB over
12,383 x 375 KB requests). Bisection cleared every avsync layer:

  * stub-service HTTP hammer (no jax): 15,168 requests, RSS flat
    (0 KB/request) — handler/threading/np.load are clean;
  * DynamicBatcher + reader with a DEVICE-resident argument: flat —
    no Python-side retention (pinned by
    tests/test_serving.py::test_no_per_request_retention);
  * bare `jax.device_put(numpy)` + del + gc.collect(): leaked the full
    buffer per transfer (752 KB/iter for a 750 KB array) on THIS box's
    jax — with the axon tunnel shim on PYTHONPATH, even on the CPU
    backend; 0 KB/iter with the shim removed.

So the retention lives in the environment's transfer interposition layer,
not in avsync. This script reproduces the discriminating probe on whatever
jax/backend it is launched under, so a deployment can check its own
transfer path in ~seconds before suspecting the daemon:

    python scripts/diagnose_rss.py            # current backend
    JAX_PLATFORMS=cpu python scripts/diagnose_rss.py

Interpretation: kb_per_transfer ~ 0 -> environment clean; steady-state
daemon RSS is bounded. kb_per_transfer ~ buffer size -> every byte shipped
to the device is retained in host RSS; long-lived serving/streamed-training
processes on that environment need a restart policy sized to host RAM
(throughput and correctness are unaffected — the copies are dead weight).
"""
import gc
import json
import os
import sys


def rss_mb() -> float:
    # statm counts PAGES — use the kernel's page size (16K/64K on some
    # aarch64 configs; hardcoding 4096 would under-report retention there)
    with open("/proc/self/statm") as f:
        return int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE") / 1e6


def main() -> int:
    import jax
    import numpy as np

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    dev = jax.devices()[0]
    buf = np.zeros((2, 75, 50, 100), np.uint8)  # 750 KB, the soak's row x2
    # warm: first transfer pays one-time client/session setup
    jax.device_put(buf, dev).block_until_ready()
    gc.collect()
    r0 = rss_mb()
    for _ in range(iters):
        d = jax.device_put(buf, dev)
        d.block_until_ready()
        del d
    gc.collect()
    r1 = rss_mb()
    kb = (r1 - r0) / iters * 1e3
    out = {
        "backend": jax.default_backend(),
        "jax": jax.__version__,
        "iters": iters,
        "buffer_kb": round(buf.nbytes / 1e3, 1),
        "rss_mb_before": round(r0, 1),
        "rss_mb_after": round(r1, 1),
        "kb_per_transfer": round(kb, 1),
        "verdict": (
            "clean: transfers do not retain host RSS" if kb < 0.1 * buf.nbytes / 1e3
            else "LEAK: the environment's transfer path retains host copies "
                 "(~per transferred byte); see module docstring"
        ),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
