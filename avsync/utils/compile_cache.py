"""JAX persistent compilation cache wiring.

The misalignment pipeline's wall-clock at small corpus scale is dominated by
one-time XLA compilation, not math: profiling `misalign-eval` on the 24-clip
baseline corpus showed 66 s compiling the LipNet conv-feature extractor and
40 s warming the eager MFCC op chain, against 0.1 s of steady-state scoring
per shift magnitude. The reference has no analogous cost (torch CPU eager,
`misalignment_detection_train.py` runs ops interpretively), so every CLI
invocation paying full compile is what made the TPU stack lose wall-clock
head-to-heads it wins on throughput.

Fix: persist compiled executables across processes via JAX's compilation
cache. Every avsync entry point calls `enable_persistent_cache()` before its
first compile; repeat invocations with unchanged geometry then deserialize
executables in ~100 ms instead of recompiling for minutes.
"""

from __future__ import annotations

import os

_DISABLED = ("", "0", "off", "none", "disable", "disabled")


def _host_fingerprint() -> str:
    """Short ISA fingerprint of this host.

    XLA:CPU cache entries are AOT machine code keyed by the COMPILING
    host's detected CPU features; loading them on a host with a different
    feature set logs cpu_aot_loader feature-mismatch errors and can SIGILL.
    The default cache dir is namespaced by this fingerprint so only
    same-ISA hosts share entries (an explicit AVSYNC_COMPILE_CACHE is
    honored verbatim — the caller owns that tradeoff). A new host pays one
    cold compile per program, exactly what it would have paid uncached.

    Scope: the fingerprint reads the Linux /proc/cpuinfo 'flags'/'Features'
    line (x86/ARM Linux — every deployment target here). Where that line is
    absent (macOS, s390x/ppc Linux) it degrades to machine +
    platform.processor() — a weaker signal that can still under-distinguish
    same-model hosts with different ISA extensions; on such hosts set
    AVSYNC_COMPILE_CACHE to a per-host path instead of relying on the
    fingerprint. (The secondary signal is mixed in ONLY on the fallback
    path so existing Linux cache dirs stay stable.)
    """
    import hashlib
    import platform

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    if not flags:
        flags = f"proc:{platform.processor()}"
    raw = f"{platform.machine()}|{flags}"
    return hashlib.sha256(raw.encode()).hexdigest()[:12]


def default_cache_dir() -> str:
    return os.path.join(
        os.path.expanduser("~"), ".cache", "avsync",
        f"jax_compile-{_host_fingerprint()}"
    )


def enable_persistent_cache() -> str | None:
    """Point JAX's persistent compilation cache at a stable directory.

    Override the location with AVSYNC_COMPILE_CACHE=<dir>; disable with
    AVSYNC_COMPILE_CACHE=off. Idempotent; returns the cache dir (or None
    when disabled or when this JAX build lacks the config knobs).
    """
    path = os.environ.get("AVSYNC_COMPILE_CACHE", default_cache_dir())
    if path.strip().lower() in _DISABLED:
        return None
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # default min compile time is 1 s; the MFCC/scoring programs sit
        # right around it, so lower the floor — a cache entry is worth
        # writing whenever compilation beats the ~100 ms deserialize cost
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.4)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except (OSError, AttributeError):  # unwritable dir / older jax
        return None
    return path
