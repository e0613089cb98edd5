"""Persistent XLA compilation cache (the full-code decoder takes minutes
to compile on TPU; cache hits bring reruns down to seconds)."""

from __future__ import annotations

from pathlib import Path

_DEFAULT = Path(__file__).resolve().parent.parent.parent / ".jax_cache"


def enable_compilation_cache(path: str | Path | None = None) -> None:
    import jax

    cache = Path(path) if path else _DEFAULT
    cache.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
