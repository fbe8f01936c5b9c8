"""Serving endurance soak (VERDICT r4 Next #6).

`bench_serving.py` measures burst throughput; this script answers the
sustained-load questions it leaves open: does the daemon's memory stay
bounded over minutes of saturating traffic, does tail latency stay stable
(first half vs second half), and does a SIGTERM with requests in flight
drain gracefully (every in-flight response arrives, no new accepts, clean
exit)?

Protocol
  1. spawn the REAL daemon (`python -m avsync.cli serve --warmup`) at the
     production frame geometry with a randomly initialized LipNet .pth
     (weights don't change serving cost);
  2. N client threads POST application/x-npy clips back-to-back for S
     seconds (saturating: N > max_batch keeps every bucket full);
  3. sample the daemon's RSS from /proc/<pid>/statm every 2 s;
  4. drain check: launch a final burst, SIGTERM the daemon mid-flight,
     require every burst response to arrive 200, the port to refuse new
     connections, and the daemon to exit 0.

Prints one JSON record (also appended to /tmp/avsync_soak/soak.json);
PERF.md carries the measured numbers.

Usage: python scripts/soak_serving.py [--seconds 300] [--clients 8]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import signal
import socket
import subprocess
import sys
import threading
import time
import urllib.error
import urllib.request

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORK = "/tmp/avsync_soak"
CKPT = os.path.join(WORK, "lipnet_soak.pth")


def ensure_ckpt() -> str:
    if os.path.exists(CKPT):
        return CKPT
    import jax
    import jax.numpy as jnp

    from avsync.compat import save_lipnet_pth
    from avsync.config import ModelConfig
    from avsync.models import LipNet

    cfg = ModelConfig()
    model = LipNet(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 75, 50, 100, 1))
    )["params"]
    os.makedirs(WORK, exist_ok=True)
    save_lipnet_pth(jax.device_get(params), CKPT)
    return CKPT


def rss_mb(pid: int) -> float:
    with open(f"/proc/{pid}/statm") as f:
        return int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE") / 2**20


def wait_healthy(url: str, proc, timeout: float = 600.0) -> None:
    deadline = time.time() + timeout
    while time.time() < deadline:
        if proc.poll() is not None:
            raise RuntimeError(f"daemon exited rc={proc.returncode} during "
                               f"startup; see {WORK}/daemon.log")
        try:
            with urllib.request.urlopen(url + "/healthz", timeout=2):
                return
        except (urllib.error.URLError, socket.timeout):
            time.sleep(0.5)
    raise RuntimeError("daemon never became healthy")


def npy_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def post(url: str, data: bytes, timeout: float = 120.0) -> dict:
    req = urllib.request.Request(
        url + "/v1/transcribe", data=data, method="POST",
        headers={"Content-Type": "application/x-npy"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def pct(sorted_vals, p):
    if not sorted_vals:
        return None
    return round(
        sorted_vals[min(len(sorted_vals) - 1,
                        int(p * (len(sorted_vals) - 1)))] * 1e3, 1)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=300.0)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--port", type=int, default=8791)
    ap.add_argument("--max_batch", type=int, default=8)
    args = ap.parse_args()

    ensure_ckpt()
    os.makedirs(WORK, exist_ok=True)
    log = open(os.path.join(WORK, "daemon.log"), "w")
    proc = subprocess.Popen(
        [sys.executable, "-m", "avsync.cli", "serve",
         "--checkpoint", CKPT, "--port", str(args.port),
         "--max_batch", str(args.max_batch), "--warmup"],
        cwd=REPO, stdout=log, stderr=subprocess.STDOUT,
    )
    url = f"http://127.0.0.1:{args.port}"
    result = {"seconds": args.seconds, "clients": args.clients,
              "max_batch": args.max_batch}
    try:
        t_up = time.time()
        wait_healthy(url, proc)
        result["startup_s"] = round(time.time() - t_up, 1)
        rng = np.random.default_rng(0)
        clip = rng.integers(0, 255, (75, 50, 100), np.uint8)
        payload = npy_bytes(clip)

        lat_lock = threading.Lock()
        lats: list = []  # (t_done, latency_s)
        errors: list = []
        stop = threading.Event()

        def client():
            while not stop.is_set():
                t0 = time.time()
                try:
                    post(url, payload)
                    with lat_lock:
                        lats.append((time.time(), time.time() - t0))
                except Exception as e:  # noqa: BLE001
                    with lat_lock:
                        errors.append(repr(e)[:120])

        threads = [threading.Thread(target=client, daemon=True)
                   for _ in range(args.clients)]
        rss0 = rss_mb(proc.pid)
        t_start = time.time()
        for t in threads:
            t.start()
        rss_samples = [rss0]
        while time.time() - t_start < args.seconds:
            time.sleep(2.0)
            rss_samples.append(rss_mb(proc.pid))
        stop.set()
        for t in threads:
            t.join(timeout=120.0)
        wall = time.time() - t_start

        mid = t_start + wall / 2
        first = sorted(l for td, l in lats if td <= mid)
        second = sorted(l for td, l in lats if td > mid)
        both = sorted(l for _, l in lats)
        result.update({
            "requests": len(lats),
            "errors": len(errors),
            "error_examples": errors[:3],
            "throughput_clips_per_s": round(len(lats) / wall, 2),
            "latency_ms": {"p50": pct(both, 0.5), "p95": pct(both, 0.95),
                           "p99": pct(both, 0.99), "max": pct(both, 1.0)},
            "p99_first_half_ms": pct(first, 0.99),
            "p99_second_half_ms": pct(second, 0.99),
            "rss_mb": {"start": round(rss0, 1),
                       "end": round(rss_samples[-1], 1),
                       "max": round(max(rss_samples), 1)},
            # the full timeline (downsampled), plus growth per request:
            # a value near the mean request payload size means the
            # ENVIRONMENT's transfer path retains host copies (run
            # scripts/diagnose_rss.py to confirm); avsync's own stack is
            # retention-free (test_no_per_request_retention)
            "rss_timeline_mb": [
                round(v, 1) for v in
                rss_samples[::max(1, len(rss_samples) // 60)]
            ],
            "rss_kb_per_request": round(
                (rss_samples[-1] - rss0) / max(1, len(lats)) * 1e3, 1
            ),
        })
        with urllib.request.urlopen(url + "/v1/stats", timeout=10) as r:
            result["server_stats"] = json.loads(r.read())

        # ---- graceful-drain check: SIGTERM with requests in flight ------
        burst_results, burst_errors = [], []

        def burst_client():
            try:
                burst_results.append(post(url, payload))
            except Exception as e:  # noqa: BLE001
                burst_errors.append(repr(e)[:200])

        burst = [threading.Thread(target=burst_client)
                 for _ in range(args.max_batch)]
        for t in burst:
            t.start()
        time.sleep(0.05)  # requests on the wire / in handler threads
        proc.send_signal(signal.SIGTERM)
        for t in burst:
            t.join(timeout=120.0)
        rc = proc.wait(timeout=120.0)
        refused = False
        try:
            post(url, payload, timeout=5.0)
        except Exception:  # noqa: BLE001 — refused/reset/timeout all count
            refused = True
        result["drain"] = {
            "burst_inflight": args.max_batch,
            "completed_200": len(burst_results),
            "failed": burst_errors,
            "daemon_exit_code": rc,
            "port_refuses_after": refused,
            # a request that raced the drain flag gets a clean 503 — an
            # acceptable (counted) outcome, unlike a reset/timeout — but
            # the drain property being pinned is that in-flight work
            # COMPLETES: every burst request must resolve (200 or 503)
            # and at least one must have gotten its 200 through, else a
            # regression that 503s everything would still pass
            "ok": (rc == 0 and refused
                   and len(burst_results) + len(burst_errors)
                   == args.max_batch
                   and len(burst_results) > 0
                   and all("503" in e for e in burst_errors)),
        }
    finally:
        if proc.poll() is None:
            proc.kill()
        log.close()

    print(json.dumps(result))
    with open(os.path.join(WORK, "soak.json"), "w") as f:
        json.dump(result, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
