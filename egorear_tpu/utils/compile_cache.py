"""Persistent XLA compilation cache, shared by every entry point.

Full-model compiles take minutes on this class of host (remote-compile TPU
helper or a single CPU core); a repo-local persistent cache makes repeat
runs fast. Best-effort: failures are swallowed so a read-only checkout never
breaks a run.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_compile_cache(cache_dir: str | None = None) -> None:
    """Point jax at the repo-local persistent cache.

    ``EGOREAR_COMPILE_CACHE`` overrides the directory; "0"/""/"off"
    disables caching entirely.
    """
    cache_dir = os.environ.get("EGOREAR_COMPILE_CACHE", cache_dir or _DEFAULT_DIR)
    if cache_dir in ("0", "", "off"):
        return
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # noqa: BLE001 -- cache is an optimization, never fatal
        pass
