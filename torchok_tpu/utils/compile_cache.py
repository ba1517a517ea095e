"""Host-partitioned persistent XLA compile cache path.

The cache is shared across processes to amortize the minutes-long first
compile through the TPU tunnel. But XLA:CPU entries embed AOT machine code
specialized to the *compiling* host's CPU features; loading them on a host
with different features spews `cpu_aot_loader.cc` errors for every cached
executable (hundreds of lines per CLI run) and risks SIGILL. The store is
therefore partitioned by a CPU-feature fingerprint — conservatively for
ALL entries: TPU executables are host-independent and could in principle
share one sub-store across host types, but a per-host sub-store is the
simple invariant (a JAX process has one cache dir for every backend it
touches), and processes on the same host — CLI, bench, probes — all share
it. CPU *runs* additionally disable persistence outright (CLI/bench: CPU
compiles take seconds), so the fingerprint mainly guards interpret-mode
tools and any future CPU-persisting caller.

Must be importable before jax initializes (stdlib only).
"""
from __future__ import annotations

import hashlib
import os
import platform


def _cpu_fingerprint() -> str:
    bits = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):
                    bits.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break
    except OSError:
        bits.append(platform.processor())
    return hashlib.sha1("|".join(bits).encode()).hexdigest()[:12]


def cache_dir(root: str = "~/.cache/torchok_tpu/jax") -> str:
    return os.path.join(os.path.expanduser(root), _cpu_fingerprint())
