"""Small generic helpers.

TPU-native re-implementation of the capabilities of the reference
``utils/generic.py`` (see /root/reference/utils/generic.py:10-48): power-of-two
helper, run-id codes, digit widths, and h:m:s <-> seconds formatting used in
run manifests.
"""
from __future__ import annotations

import math
import string
import secrets


_cache_enabled = False


def enable_compile_cache(path: str = "/root/.cache/jax_compilation_cache") -> None:
    """Turn on JAX's persistent compilation cache (idempotent).

    Compiles of the scanned solver step are expensive (minutes for large 3D
    graphs); the cache amortises them across processes and bench runs.
    """
    global _cache_enabled
    if _cache_enabled:
        return
    import jax

    try:
        if jax.default_backend() == "cpu":
            # CPU AOT cache entries are machine-feature-sensitive and reload
            # with SIGILL-risk warnings; the cache only pays off for the
            # minutes-long TPU compiles anyway
            _cache_enabled = True
            return
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _cache_enabled = True
    except Exception:
        pass  # older jax without these flags: cache is an optimisation only


def nextpow2(x: float) -> int:
    """Smallest integer p such that 2**p >= x (parity: utils/generic.py:10)."""
    if x <= 1:
        return 0
    return int(math.ceil(math.log2(x)))


def random_code(n: int = 6) -> str:
    """A short alphanumeric run id (parity: utils/generic.py random_code)."""
    alphabet = string.ascii_lowercase + string.digits
    return "".join(secrets.choice(alphabet) for _ in range(n))


def ten_digit(number: float) -> int:
    """Number of decimal digits needed to print indices up to ``number``."""
    if number <= 1:
        return 1
    return int(math.floor(math.log10(number)) + 1)


def sec2time(seconds: float) -> str:
    """Format seconds as ``h:mm:ss`` (parity: utils/generic.py:23-28)."""
    s = int(round(seconds))
    h, rem = divmod(s, 3600)
    m, sec = divmod(rem, 60)
    return f"{h:d}:{m:02d}:{sec:02d}"


def time2sec(time_str: str) -> int:
    """Inverse of :func:`sec2time`."""
    parts = [int(p) for p in str(time_str).split(":")]
    while len(parts) < 3:
        parts.insert(0, 0)
    h, m, s = parts[-3:]
    return h * 3600 + m * 60 + s
