"""Host-keyed persistent-compile-cache paths.

XLA's persistent compilation cache stores AOT compilation results that can
embed host-CPU-feature-specific code. Loading an entry produced on a host
with different CPU features is unsound — XLA warns it "could lead to
execution errors such as SIGILL" (observed in MULTICHIP_r04 when the sandbox
migrated hosts between rounds). Keying the cache directory by a fingerprint
of the host's CPU feature set makes a cross-host hit impossible: a new host
simply starts a fresh subdirectory.

This module must stay importable before any JAX backend initialization
(parallel/dryrun.py calls it while forcing the CPU platform), so it imports
nothing heavier than hashlib/platform.
"""

from __future__ import annotations

import hashlib
import os
import platform


def _cpu_fingerprint() -> str:
    """Short stable fingerprint of the host CPU's feature set.

    On Linux, hash the first `flags`/`Features` line of /proc/cpuinfo (the
    instruction-set extensions are exactly what decides whether an AOT blob
    is executable here) plus the machine architecture. Elsewhere, fall back
    to (machine, processor) — coarser, but still separates architectures.
    """
    feature_text = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip().lower()
                if key in ("flags", "features"):
                    feature_text = line.split(":", 1)[1].strip()
                    break
    except OSError:
        feature_text = platform.processor()
    raw = f"{platform.machine()}|{feature_text}".encode()
    return hashlib.sha1(raw).hexdigest()[:12]


def host_keyed_cache_dir(base: str) -> str:
    """Return `base/cpu-<fingerprint>` (created), keyed to this host's CPU."""
    path = os.path.join(os.path.abspath(base), f"cpu-{_cpu_fingerprint()}")
    os.makedirs(path, exist_ok=True)
    return path
