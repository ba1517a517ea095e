"""Host-partitioned persistent XLA compile cache path.

The cache is shared across processes to amortize the minutes-long first
compile through the TPU tunnel. But XLA:CPU entries embed AOT machine code
specialized to the *compiling* host's CPU features; loading them on a host
with different features spews `cpu_aot_loader.cc` errors for every cached
executable (hundreds of lines per CLI run) and risks SIGILL. Partitioning
the store by a CPU-feature fingerprint keeps TPU runs sharing one
sub-store while each distinct host type gets its own CPU sub-store.

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
