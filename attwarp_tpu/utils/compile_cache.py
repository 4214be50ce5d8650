"""Persistent XLA compilation cache for the CLI drivers and benches.

The 7B programs this framework jits are expensive to compile through the
axon relay — the flash-prefill B=16 program alone can take 10-25 minutes
(CLAUDE.md) — and the product loop spans several *processes* (the
``process_dataset`` driver, then ``evaluate``, then ``serve``), each of
which would otherwise recompile identical executables. JAX's persistent
compilation cache is verified to work through the relay (a second process
re-loads a cached 7B executable in ~40 ms), so every CLI entry point calls
:func:`enable_compile_cache` before touching the device.

Resolution order for the cache directory:

1. explicit ``path`` argument;
2. ``$ATTWARP_COMPILE_CACHE_DIR`` (set to the empty string or ``0`` to
   disable caching entirely);
3. whatever is already configured (``$JAX_COMPILATION_CACHE_DIR`` or a
   prior ``jax.config`` call) — left untouched;
4. ``~/.cache/attwarp_tpu/jax_cache``.

The reference has no analogue (eager torch recompiles nothing); this is
TPU-runtime plumbing that XLA's compilation model makes necessary.
"""

from __future__ import annotations

import os
from typing import Optional

_MIN_COMPILE_SECS = 1.0  # don't cache trivia; 7B programs are >> this


def enable_compile_cache(path: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at a durable directory.

    Returns the directory in effect, or ``None`` when caching is disabled
    (``ATTWARP_COMPILE_CACHE_DIR`` set but falsy). Safe to call more than
    once; later calls with a different explicit ``path`` re-point the cache.
    """
    import jax

    if path is None:
        env = os.environ.get("ATTWARP_COMPILE_CACHE_DIR")
        if env is not None:
            if env in ("", "0"):
                return None
            path = env
        elif jax.config.jax_compilation_cache_dir:
            # Respect $JAX_COMPILATION_CACHE_DIR / an earlier caller.
            return jax.config.jax_compilation_cache_dir
        else:
            path = os.path.join(
                os.path.expanduser("~"), ".cache", "attwarp_tpu", "jax_cache"
            )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", _MIN_COMPILE_SECS
    )
    return path
