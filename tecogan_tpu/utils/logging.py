"""Console logging helpers.

- :class:`Tee`: duplicate stdout into a logfile (reference main.py:126-136,
  metrics.py:94-105, dataPrepare.py:72-85).
- :func:`param_summary`: per-scope variable/shape/param-count dump
  (reference ``printVariable``, main.py:138-146).
"""

from __future__ import annotations

import sys
from typing import Any

import jax
import numpy as np


class Tee:
    """Duplicate writes to stdout and a logfile."""

    def __init__(self, path: str, mode: str = "a"):
        self.terminal = sys.stdout
        self.log = open(path, mode)

    def write(self, message):
        self.terminal.write(message)
        self.log.write(message)

    def flush(self):
        self.terminal.flush()
        self.log.flush()

    def install(self):
        sys.stdout = self
        return self

    def uninstall(self):
        sys.stdout = self.terminal
        self.log.close()


def param_summary(name: str, params: Any, print_fn=print) -> int:
    """Print every leaf's path/shape/size under ``name``; return total params
    (reference main.py:138-146 printVariable)."""
    total = 0
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    print_fn(f"Scope {name}:")
    for keypath, leaf in leaves:
        path = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in keypath)
        size = int(np.prod(leaf.shape)) if hasattr(leaf, "shape") else 1
        total += size
        shape = tuple(leaf.shape) if hasattr(leaf, "shape") else ()
        print_fn(f"   Variable: {name}/{path}, Shape: {shape}, Size: {size}")
    print_fn(f"total size: {total}")
    return total
