"""Pallas TPU kernel: fixed-stencil 4x upsampling (bilinear / Catmull-Rom).

Two hot per-frame ops share this stencil structure (SURVEY.md §2.2):

- the LR->HR flow upsample ``upscale_four`` (reference lib/ops.py:126-163),
  run once per frame on the (h, w, 2) flow field;
- the generator's bicubic residual skip ``bicubic_four``
  (reference lib/ops.py:166-212), run once per frame on the (h, w, 3) LR frame.

Formulation: a separable 4-phase constant-weight filter with edge replication
is a pair of banded constant matmuls,

    out = Sh @ x @ Sw,   Sh: (4H, H),  Sw: (W, 4W),

where row 4i+p of Sh carries the phase-p height weights at taps i(+/-) and
column 4j+q of Sw the phase-q width weights (edge clamping folded into the
band ends). On TPU both matmuls ride the MXU, the phase interleave falls out
of the matrix layout (no lane shuffles — Mosaic rejects those), and the whole
op is one VMEM-resident kernel per channel plane: ~70 MFLOP against a single
HBM read + write. The XLA path (ops/resize.py) stays the parity oracle and
the non-TPU fallback.

Layout: images are processed as (B*C, H, W) — channel becomes the grid axis
so W rides the 128-wide lanes (C=2/3 on lanes would waste 97% of the VPU).

Gradients: the op is linear, so the VJP is the transposed matmul pair
(a 4x *downsample* by the same stencil), wired up via ``jax.custom_vjp`` —
needed because the flow upsample sits on fnet's gradient path
(reference Teco.py:113,446-447) and the bicubic skip on the generator's.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tecogan_tpu.ops.resize import (
    _bilinear_phase_weights,
    _catmull_rom_weights,
    bicubic_four,
    upscale_bilinear,
)


@functools.lru_cache(maxsize=None)
def _stencil_matrix(n: int, filter_: str) -> np.ndarray:
    """(4n, n) float32: row 4i+p = phase-p weights at clamped taps around i."""
    if filter_ == "bilinear":
        weights = _bilinear_phase_weights(4)  # (4 phases, 2 taps), taps at i, i+1
        offsets = (0, 1)
    else:
        weights = _catmull_rom_weights()      # (4 phases, 4 taps), taps at i-1..i+2
        offsets = (-1, 0, 1, 2)
    s = np.zeros((4 * n, n), np.float32)
    for i in range(n):
        for p in range(4):
            for t, off in enumerate(offsets):
                j = min(max(i + off, 0), n - 1)  # edge replication
                s[4 * i + p, j] += weights[p, t]
    return s


def _matmul_kernel(sh_ref, sw_ref, x_ref, o_ref):
    """One (plane, H-band): o_band = Sh_band @ x @ Sw, f32 accum on the MXU."""
    x = x_ref[0]
    hi = jnp.dot(sh_ref[:], x, preferred_element_type=jnp.float32)
    o_ref[0] = jnp.dot(
        hi.astype(sw_ref.dtype), sw_ref[:], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


_VMEM_BUDGET = 12 * 1024 * 1024  # headroom under the 16 MB scoped default


def _band_h(h: int, w: int, itemsize: int):
    """Largest H-band ``hb`` (a divisor of ``h``, 4*hb sublane-aligned) whose
    working set fits VMEM — big frames (540p->2160p: a 16.6 MB output plane
    alone) are banded over output rows, each Sh row-band used exactly once
    (no redundant compute; x and Sw stay resident across bands). Returns
    None when even the thinnest aligned band exceeds the budget."""
    def fits(hb: int) -> bool:
        bytes_ = itemsize * (h * w          # x plane
                             + w * 4 * w    # Sw
                             + 4 * hb * h   # Sh band
                             + 4 * hb * 4 * w)  # out band
        return bytes_ + 4 * (4 * hb * w) <= _VMEM_BUDGET  # + f32 hi band

    if fits(h):
        return h  # single block: no banding, no alignment constraint
    for hb in sorted((d for d in range(1, h) if h % d == 0), reverse=True):
        # Multi-band blocks start at dynamic sublane offsets, which Mosaic
        # requires 8-aligned: 4*hb % 8 == 0.
        if (4 * hb) % 8 == 0 and fits(hb):
            return hb
    return None


def _plane_call(planes: jnp.ndarray, sh, sw) -> jnp.ndarray:
    n, h, w = planes.shape
    hb = _band_h(h, w, planes.dtype.itemsize)
    if hb is None:  # no aligned band fits: XLA handles the tiling
        raise _NoBand()
    return pl.pallas_call(
        _matmul_kernel,
        grid=(n, h // hb),
        in_specs=[
            pl.BlockSpec((4 * hb, h), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, 4 * w), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4 * hb, 4 * w), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 4 * h, 4 * w), planes.dtype),
    )(sh, sw, planes)


class _NoBand(Exception):
    """No VMEM-fitting band exists; callers fall back to the XLA path."""


def _down_kernel(sh_ref, sw_ref, g_ref, o_ref):
    """VJP plane: o = Sh^T @ g @ Sw^T (the stencil's transpose)."""
    g = g_ref[0]
    hi = jnp.dot(sh_ref[:].T, g, preferred_element_type=jnp.float32)
    o_ref[0] = jnp.dot(
        hi.astype(sw_ref.dtype), sw_ref[:].T, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _plane_call_down(grads: jnp.ndarray, sh, sw) -> jnp.ndarray:
    n, h4, w4 = grads.shape
    h, w = h4 // 4, w4 // 4
    # Single-block working set: g plane + Sw + Sh + dx (+ f32 hi).
    bytes_ = grads.dtype.itemsize * (4 * h * 4 * w + w * 4 * w + 4 * h * h
                                     + h * w) + 4 * (h * 4 * w)
    if bytes_ > _VMEM_BUDGET:
        # Big-frame backward (the VJP only runs in training, whose crops are
        # tiny; this path exists for completeness): XLA tiles the transposed
        # stencil matmuls itself.
        hi = jnp.einsum("hk,nkv->nhv", sh.T.astype(jnp.float32),
                        grads.astype(jnp.float32))
        return jnp.einsum("nhv,vw->nhw", hi,
                          sw.T.astype(jnp.float32)).astype(grads.dtype)
    return pl.pallas_call(
        _down_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((4 * h, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, 4 * w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * h, 4 * w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w), grads.dtype),
    )(sh, sw, grads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _upsample4_pallas(x: jnp.ndarray, filter_: str) -> jnp.ndarray:
    """(B, H, W, C) -> (B, 4H, 4W, C); filter_ in {"bilinear", "bicubic"}."""
    return _upsample4_fwd(x, filter_)[0]


def _mats(h, w, filter_, dtype):
    sh = jnp.asarray(_stencil_matrix(h, filter_), dtype)
    sw = jnp.asarray(_stencil_matrix(w, filter_).T, dtype)
    return sh, sw


def _upsample4_fwd(x, filter_):
    b, h, w, c = x.shape
    try:
        sh, sw = _mats(h, w, filter_, x.dtype)
        planes = x.transpose(0, 3, 1, 2).reshape(b * c, h, w)
        out = _plane_call(planes, sh, sw)
        out = out.reshape(b, c, 4 * h, 4 * w).transpose(0, 2, 3, 1)
    except _NoBand:  # pathological geometry: XLA parity path
        out = upscale_bilinear(x, 4) if filter_ == "bilinear" \
            else bicubic_four(x)
    return out, None  # shapes/dtype recoverable from the cotangent


def _upsample4_bwd(filter_, res, g):
    del res
    b, h4, w4, c = g.shape
    h, w, dtype = h4 // 4, w4 // 4, g.dtype
    sh, sw = _mats(h, w, filter_, dtype)
    g_planes = g.transpose(0, 3, 1, 2).reshape(b * c, 4 * h, 4 * w)
    dx = _plane_call_down(g_planes, sh, sw)
    return (dx.reshape(b, c, h, w).transpose(0, 2, 3, 1),)


_upsample4_pallas.defvjp(_upsample4_fwd, _upsample4_bwd)


def upscale_bilinear_pallas(x: jnp.ndarray) -> jnp.ndarray:
    """Pallas 4x legacy-TF bilinear upscale (== ops.resize.upscale_four)."""
    return _upsample4_pallas(x, "bilinear")


def bicubic_four_pallas(x: jnp.ndarray) -> jnp.ndarray:
    """Pallas 4x Catmull-Rom upscale (== ops.resize.bicubic_four)."""
    return _upsample4_pallas(x, "bicubic")


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def upsample4_auto(x: jnp.ndarray, filter_: str = "bilinear") -> jnp.ndarray:
    """Pallas on TPU, XLA elsewhere — numerically equivalent either way."""
    if _on_tpu():
        return _upsample4_pallas(x, filter_)
    return upscale_bilinear(x, 4) if filter_ == "bilinear" else bicubic_four(x)
