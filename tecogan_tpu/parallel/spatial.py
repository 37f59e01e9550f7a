"""Spatial sharding for huge-frame streaming inference.

For 540p -> 2160p long-sequence streaming (BASELINE.md config 5) a single
chip's HBM holds the frames easily, but throughput scales by splitting each
frame's height across the mesh: every conv then runs on an H-shard with
GSPMD-inserted halo exchanges over ICI, and the dense warp's gathers resolve
through collective-permute. This is the spatial analog of context/sequence
parallelism for this workload (SURVEY.md §2.3).

Implementation: pure sharding annotations — the per-frame step function is
jitted with the LR frames and the recurrent state sharded on H. XLA's
spatial partitioner handles the rest; no hand-written collectives.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tecogan_tpu.ops.warp import warp_space_to_depth_halo
from tecogan_tpu.recurrent.step import frame_step


def spatial_streaming_fn(
    gen_apply, fnet_apply, mesh: Mesh, axis: str = "space",
    max_displacement: float = 96.0,
):
    """Build a jitted scan-over-frames fn with H sharded over ``axis``.

    Returns ``run(gen_params, fnet_params, state, lr_chunk)`` where
    ``lr_chunk`` is (T, B, h, w, 3); state and frames are sharded on their
    height dimension, parameters replicated.

    The warp uses the explicit shard_map halo exchange whenever shard
    geometry allows (GSPMD otherwise all-gathers the full packed operand —
    see ops/warp.py:warp_space_to_depth_halo and tools/audit_spatial_hlo.py);
    convs keep their GSPMD-inserted halos, which XLA handles well.
    """
    repl = NamedSharding(mesh, P())
    # RecurrentState(prev_lr (B,h,w,3), prev_hr (B,4h,4w,3)): shard dim 1.
    state_sh = NamedSharding(mesh, P(None, axis))
    chunk_sh = NamedSharding(mesh, P(None, None, axis))  # (T, B, h, w, 3)
    n = mesh.shape[axis]

    def run(gen_params, fnet_params, state, lr_chunk):
        hs = state.prev_hr.shape[1] // n
        if hs > int(max_displacement) + 1 and state.prev_hr.shape[1] % (4 * n) == 0:
            def warp_fn(prev_hr, flow_hr):
                return warp_space_to_depth_halo(
                    prev_hr, flow_hr, mesh, axis, 4,
                    max_displacement=max_displacement)
        else:
            warp_fn = None  # tiny shards: frame_step's default fused warp

        def body(st, lr):
            return frame_step(
                gen_apply, fnet_apply, gen_params, fnet_params, st, lr,
                warp_fn=warp_fn)

        state, hr = jax.lax.scan(body, state, lr_chunk)
        return state, hr

    return jax.jit(
        run,
        in_shardings=(repl, repl, state_sh, chunk_sh),
        out_shardings=(state_sh, chunk_sh),
    )
