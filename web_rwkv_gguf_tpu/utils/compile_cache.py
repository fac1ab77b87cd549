"""Persistent XLA compilation cache for sub-second warm restarts.

The reference loads its whole (pre-compiled WGSL) pipeline set in ~776 ms
(ref: plan.md:107-108); here the fused decode programs cost 5-7 s of XLA
compilation per (format, batch) config on every process start. JAX's
persistent compilation cache removes that on the second and later starts:
compiled executables are keyed by (HLO, compile options, backend) and
reloaded from disk.

Enabled automatically by :class:`runtime.engine.Engine` and the CLI apps;
set ``WEB_RWKV_TPU_CACHE=0`` to disable, or point ``WEB_RWKV_TPU_CACHE``
at a directory to relocate it (default ``~/.cache/web_rwkv_gguf_tpu``).
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger(__name__)

_DONE = False


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Idempotently enable JAX's persistent compilation cache.

    Returns the cache directory, or None when disabled/unavailable.
    """
    global _DONE
    env = os.environ.get("WEB_RWKV_TPU_CACHE", "")
    if env == "0":
        return None
    if _DONE:
        import jax

        return jax.config.jax_compilation_cache_dir
    path = path or (env if env else None) or os.path.join(
        os.path.expanduser("~"), ".cache", "web_rwkv_gguf_tpu"
    )
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_enable_compilation_cache", True)
        # decode programs are small but expensive to build — cache
        # everything that takes noticeable compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _DONE = True
        return path
    except Exception as e:  # pragma: no cover - defensive
        log.warning("persistent compilation cache unavailable: %s", e)
        return None
