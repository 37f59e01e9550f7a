"""AOT export of the serving frame step (StableHLO via jax.export).

The reference deploys by shipping a TF1 checkpoint plus the Python graph-
builder that reconstructs the session (reference main.py:187-245) — the
serving host must run the full framework. The TPU-native deployment
artifact is instead a serialized, already-lowered StableHLO program: the
single-frame serving step (serve/engine.py:build_frame_fn) with the
parameters baked in as constants, exported with :mod:`jax.export`. A
serving host deserializes and calls it with zero model code — no flax, no
param loading, no retracing — and the artifact is versioned/portable under
jax.export's compatibility guarantees.

Round-trip:

    exp = export_frame_step(cfg, gen_params, fnet_params, batch=4,
                            height=144, width=180)
    save_frame_step(exp, "step.bin")
    ...
    step = load_frame_step("step.bin")        # -> callable
    state, hr = step(state, lr_batch)         # pure function of (state, lr)

State layout matches recurrent/step.py:RecurrentState (prev_lr in [0, 1],
prev_hr deprocessed in [0, 1]); a fresh stream starts from zeros
(reference main.py:197-199). ``init_state`` here builds it host-side.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tecogan_tpu.config import TecoConfig
from tecogan_tpu.models import FNet, Generator
from tecogan_tpu.recurrent.step import RecurrentState, init_state
from tecogan_tpu.serve.engine import build_frame_fn

# The exported program's input/output trees contain RecurrentState; give it
# a stable serialized name (idempotent across re-imports).
try:
    jax.export.register_namedtuple_serialization(
        RecurrentState, serialized_name="tecogan_tpu.RecurrentState")
except ValueError:
    pass


def export_frame_step(
    config: TecoConfig,
    gen_params,
    fnet_params,
    batch: int,
    height: int,
    width: int,
    output: str = "uint8",
    input_dtype=jnp.uint8,
    platforms: Optional[Sequence[str]] = None,
):
    """Lower the serving frame step to a self-contained Exported program.

    Args:
      batch/height/width: static serving geometry (one program per shape —
        the XLA model; export several for a shape menu).
      output: "uint8" (device-quantized HR) or "float32".
      input_dtype: LR frame dtype the program accepts (uint8 uploads are
        4x cheaper; float32 for pre-normalized pipelines).
      platforms: lowering platforms (e.g. ("tpu",) or ("tpu", "cpu"));
        default = the current backend.

    Returns:
      jax.export.Exported — ``.call(state, lr)`` -> (state, hr);
      ``.serialize()`` -> bytes.
    """
    dtype = jnp.dtype(config.compute_dtype)
    generator = Generator(num_resblock=config.num_resblock,
                          channels=config.gen_channels, dtype=dtype)
    fnet = FNet(channels=config.fnet_channels,
                up_channels=config.fnet_up_channels,
                max_velocity=config.flow_max_velocity, dtype=dtype)
    frame_fn = build_frame_fn(config, generator.apply, fnet.apply,
                              output=output)
    # Params close over the trace -> baked into the artifact as constants.
    gen_params = jax.tree.map(jnp.asarray, gen_params)
    fnet_params = jax.tree.map(jnp.asarray, fnet_params)

    def step(state, lr):
        return frame_fn(gen_params, fnet_params, state, lr)

    state_spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
        init_state(batch, height, width, dtype))
    lr_spec = jax.ShapeDtypeStruct((batch, height, width, 3),
                                   jnp.dtype(input_dtype))
    kwargs = {} if platforms is None else {"platforms": tuple(platforms)}
    return jax.export.export(jax.jit(step), **kwargs)(state_spec, lr_spec)


def save_frame_step(exported, path: str) -> None:
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_frame_step(path_or_bytes):
    """Deserialize an exported step into a jitted callable
    ``(state, lr) -> (state, hr)`` — the whole deployment API surface."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    exported = jax.export.deserialize(data)
    return jax.jit(exported.call)
