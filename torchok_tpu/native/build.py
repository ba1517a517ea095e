"""Build driver for the native IO library.

Compiles ``io_kernels.cpp`` into a shared library cached by source hash under
``~/.cache/torchok_tpu/native`` (or ``$TORCHOK_NATIVE_CACHE``). No build is
attempted when a cached artifact exists; failures degrade gracefully — the
python pipeline falls back to cv2/PIL.
"""
from __future__ import annotations

import hashlib
import logging
import os
import subprocess
from pathlib import Path
from typing import Optional

logger = logging.getLogger(__name__)

_SRC = Path(__file__).with_name("io_kernels.cpp")


def _cache_dir() -> Path:
    d = os.environ.get("TORCHOK_NATIVE_CACHE")
    if d:
        return Path(d)
    return Path.home() / ".cache" / "torchok_tpu" / "native"


def build_io_library() -> Optional[Path]:
    """Return the path to the compiled library, building it if needed."""
    if os.environ.get("TORCHOK_DISABLE_NATIVE") == "1":
        return None
    try:
        src = _SRC.read_bytes()
    except OSError:
        return None
    tag = hashlib.sha256(src).hexdigest()[:16]
    out = _cache_dir() / f"libtorchok_io_{tag}.so"
    if out.exists():
        return out
    out.parent.mkdir(parents=True, exist_ok=True)
    tmp = out.with_suffix(".so.tmp")
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
           str(_SRC), "-ljpeg", "-lpng", "-o", str(tmp)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, out)
        logger.info("built native IO library at %s", out)
        return out
    except (subprocess.SubprocessError, OSError) as e:
        stderr = getattr(e, "stderr", b"")
        logger.warning("native IO build failed (%s); falling back to cv2/PIL",
                       stderr.decode()[:500] if stderr else e)
        return None
