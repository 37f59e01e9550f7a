"""Retune the blocked-gather warp tile at 2160p (VERDICT r1 #7).

Sweeps row_block x col_block of ops/warp.py:dense_image_warp's blocked path
on the real chip at 2160x3840 bf16, including the fused s2d epilogue, and
compares the Pallas-free alternatives (unblocked gather, f32 coords).

Usage: python tools/warp_sweep_2160p.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (run as a script)
from tecogan_tpu.ops.warp import _corner_coords, _lerp, _tap_pack, warp_space_to_depth
from tecogan_tpu.utils.profiling import device_time


def rowband_warp_s2d(image, flow, row_block=240, halo=97):
    """Flat row-band variant: slabs are CONTIGUOUS (rows x full W) slices of
    the flat (H*W, 4C) packed operand — no 2D strided slab extraction, no
    layout copies between slice and gather."""
    b, h, w, c = image.shape
    assert b == 1
    dtype = image.dtype
    iy, ix, ay, ax = _corner_coords(image.shape, flow, dtype)
    packed = _tap_pack(image).reshape(h * w, 4 * c)
    nr = h // row_block
    sr = row_block + 2 * halo

    def do_band(k):
        r0 = k * row_block
        s0 = jnp.clip(r0 - halo, 0, h - sr)
        slab = jax.lax.dynamic_slice(packed, (s0 * w, 0), (sr * w, 4 * c))
        iy_b = jax.lax.dynamic_slice(iy, (0, r0, 0), (1, row_block, w)) - s0
        ix_b = jax.lax.dynamic_slice(ix, (0, r0, 0), (1, row_block, w))
        ay_b = jax.lax.dynamic_slice(ay, (0, r0, 0, 0), (1, row_block, w, 1))
        ax_b = jax.lax.dynamic_slice(ax, (0, r0, 0, 0), (1, row_block, w, 1))
        base = (iy_b * w + ix_b).reshape(row_block * w, 1)
        g = jnp.take_along_axis(slab, base, axis=0)
        return _lerp(g.reshape(1, row_block, w, 4, c), ay_b, ax_b)

    outs = jax.lax.map(do_band, jnp.arange(nr))
    out = outs.transpose(1, 0, 2, 3, 4).reshape(1, h, w, c)
    hl, wl = h // 4, w // 4
    out = out.reshape(1, hl, 4, wl, 4, c).transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(1, hl, wl, 16 * c)


def cw_blocked_warp_s2d(image, flow, row_block=240, col_block=512, halo=97):
    """Channel-minor variant: packed operand stored as (H, W*4C) so slab
    slices reshape to (px, 4C) row-major with NO layout copies."""
    b, h, w, c = image.shape
    assert b == 1
    dtype = image.dtype
    iy, ix, ay, ax = _corner_coords(image.shape, flow, dtype)
    pcw = _tap_pack(image).reshape(h, w * 4 * c)  # one relayout, up front
    sr, sc = row_block + 2 * halo, col_block + 2 * halo
    nr, nc = h // row_block, w // col_block

    def do_block(k):
        r0 = (k // nc) * row_block
        c0 = (k % nc) * col_block
        s0 = jnp.clip(r0 - halo, 0, h - sr)
        q0 = jnp.clip(c0 - halo, 0, w - sc)
        slab = jax.lax.dynamic_slice(pcw, (s0, q0 * 4 * c), (sr, sc * 4 * c))
        flat = slab.reshape(sr * sc, 4 * c)
        iy_b = jnp.clip(jax.lax.dynamic_slice(
            iy, (0, r0, c0), (1, row_block, col_block)) - s0, 0, sr - 1)
        ix_b = jnp.clip(jax.lax.dynamic_slice(
            ix, (0, r0, c0), (1, row_block, col_block)) - q0, 0, sc - 1)
        ay_b = jax.lax.dynamic_slice(ay, (0, r0, c0, 0), (1, row_block, col_block, 1))
        ax_b = jax.lax.dynamic_slice(ax, (0, r0, c0, 0), (1, row_block, col_block, 1))
        base = (iy_b * sc + ix_b).reshape(row_block * col_block, 1)
        g = jnp.take_along_axis(flat, base, axis=0)
        return _lerp(g.reshape(1, row_block, col_block, 4, c), ay_b, ax_b)

    outs = jax.lax.map(do_block, jnp.arange(nr * nc))
    outs = outs.reshape(nr, nc, 1, row_block, col_block, c)
    out = outs.transpose(2, 0, 3, 1, 4, 5).reshape(1, h, w, c)
    hl, wl = h // 4, w // 4
    out = out.reshape(1, hl, 4, wl, 4, c).transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(1, hl, wl, 16 * c)


def quad_slice_warp_s2d(image, flow, row_block=0, col_block=0, halo=97):
    """One (2,2,C)-slice gather per output pixel straight from the raw image
    (no tap-pack): 4x smaller operand working set, 1 index per pixel."""
    b, h, w, c = image.shape
    assert b == 1
    dtype = image.dtype
    iy, ix, ay, ax = _corner_coords(image.shape, flow, dtype)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    img3 = image[0]  # (h, w, c)

    def gather_from(op, yy, xx):
        idx = jnp.stack([yy.reshape(-1), xx.reshape(-1)], axis=-1)
        g = jax.lax.gather(op, idx, dnums, slice_sizes=(2, 2, c),
                           mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        return g  # (px, 2, 2, c)

    if not row_block:
        g = gather_from(img3, iy, ix).reshape(1, h, w, 2, 2, c)
        tl, tr = g[..., 0, 0, :], g[..., 0, 1, :]
        bl, br = g[..., 1, 0, :], g[..., 1, 1, :]
    else:
        sr, sc = row_block + 2 * halo, col_block + 2 * halo
        nr, nc = h // row_block, w // col_block

        def do_block(k):
            r0 = (k // nc) * row_block
            c0 = (k % nc) * col_block
            s0 = jnp.clip(r0 - halo, 0, h - sr)
            q0 = jnp.clip(c0 - halo, 0, w - sc)
            slab = jax.lax.dynamic_slice(img3, (s0, q0, 0), (sr, sc, c))
            iy_b = jnp.clip(jax.lax.dynamic_slice(
                iy, (0, r0, c0), (1, row_block, col_block)) - s0, 0, sr - 2)
            ix_b = jnp.clip(jax.lax.dynamic_slice(
                ix, (0, r0, c0), (1, row_block, col_block)) - q0, 0, sc - 2)
            return gather_from(slab, iy_b, ix_b).reshape(
                row_block, col_block, 2, 2, c)

        g = jax.lax.map(do_block, jnp.arange(nr * nc))
        g = g.reshape(nr, nc, row_block, col_block, 2, 2, c)
        g = g.transpose(0, 2, 1, 3, 4, 5, 6).reshape(1, h, w, 2, 2, c)
        # recompute weights blocked? weights are global; sliced same order
        tl, tr = g[..., 0, 0, :], g[..., 0, 1, :]
        bl, br = g[..., 1, 0, :], g[..., 1, 1, :]
    top = tl + (tr - tl) * ax
    bot = bl + (br - bl) * ax
    out = top + (bot - top) * ay
    hl, wl = h // 4, w // 4
    out = out.reshape(1, hl, 4, wl, 4, c).transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(1, hl, wl, 16 * c)


def blockpack_warp_s2d(image, flow, row_block=240, col_block=512, halo=97):
    """Tap-pack PER BLOCK from the raw image slab: skips materializing the
    global (H, W, 4C) packed tensor and the per-block layout copies that
    XLA inserts around it."""
    b, h, w, c = image.shape
    assert b == 1
    dtype = image.dtype
    iy, ix, ay, ax = _corner_coords(image.shape, flow, dtype)
    img3 = image[0]
    sr, sc = row_block + 2 * halo, col_block + 2 * halo
    nr, nc = h // row_block, w // col_block

    def do_block(k):
        r0 = (k // nc) * row_block
        c0 = (k % nc) * col_block
        s0 = jnp.clip(r0 - halo, 0, h - sr - 1)
        q0 = jnp.clip(c0 - halo, 0, w - sc - 1)
        slab = jax.lax.dynamic_slice(img3, (s0, q0, 0), (sr + 1, sc + 1, c))
        packed = jnp.concatenate([
            slab[:sr, :sc], slab[:sr, 1:], slab[1:, :sc], slab[1:, 1:],
        ], axis=-1).reshape(sr * sc, 4 * c)
        iy_b = jnp.clip(
            jax.lax.dynamic_slice(iy, (0, r0, c0), (1, row_block, col_block)) - s0,
            0, sr - 1)
        ix_b = jnp.clip(
            jax.lax.dynamic_slice(ix, (0, r0, c0), (1, row_block, col_block)) - q0,
            0, sc - 1)
        ay_b = jax.lax.dynamic_slice(ay, (0, r0, c0, 0), (1, row_block, col_block, 1))
        ax_b = jax.lax.dynamic_slice(ax, (0, r0, c0, 0), (1, row_block, col_block, 1))
        base = (iy_b * sc + ix_b).reshape(row_block * col_block, 1)
        g = jnp.take_along_axis(packed, base, axis=0)
        return _lerp(g.reshape(1, row_block, col_block, 4, c), ay_b, ax_b)

    outs = jax.lax.map(do_block, jnp.arange(nr * nc))
    outs = outs.reshape(nr, nc, 1, row_block, col_block, c)
    out = outs.transpose(2, 0, 3, 1, 4, 5).reshape(1, h, w, c)
    hl, wl = h // 4, w // 4
    out = out.reshape(1, hl, 4, wl, 4, c).transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(1, hl, wl, 16 * c)


def pairgather_warp_s2d(image, flow, row_block=240, col_block=512, halo=97):
    """Two 6-wide 1D gathers from the raw flat slab (top pair / bottom pair
    per output pixel): 2x the indices of tap-packing, but a 4x smaller
    operand working set and no packing pass at all."""
    b, h, w, c = image.shape
    assert b == 1 and c == 3
    dtype = image.dtype
    iy, ix, ay, ax = _corner_coords(image.shape, flow, dtype)
    img3 = image[0]
    sr, sc = row_block + 2 * halo, col_block + 2 * halo
    nr, nc = h // row_block, w // col_block
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,))

    def do_block(k):
        r0 = (k // nc) * row_block
        c0 = (k % nc) * col_block
        s0 = jnp.clip(r0 - halo, 0, h - sr - 1)
        q0 = jnp.clip(c0 - halo, 0, w - sc - 1)
        slab = jax.lax.dynamic_slice(img3, (s0, q0, 0), (sr + 1, sc + 1, c))
        flat = slab.reshape((sr + 1) * (sc + 1) * c)
        iy_b = jnp.clip(
            jax.lax.dynamic_slice(iy, (0, r0, c0), (1, row_block, col_block)) - s0,
            0, sr - 1)
        ix_b = jnp.clip(
            jax.lax.dynamic_slice(ix, (0, r0, c0), (1, row_block, col_block)) - q0,
            0, sc - 1)
        ay_b = jax.lax.dynamic_slice(ay, (0, r0, c0, 0), (1, row_block, col_block, 1))
        ax_b = jax.lax.dynamic_slice(ax, (0, r0, c0, 0), (1, row_block, col_block, 1))
        base = ((iy_b * (sc + 1) + ix_b) * c).reshape(-1, 1)
        top = jax.lax.gather(flat, base, dn, slice_sizes=(2 * c,),
                             mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        bot = jax.lax.gather(flat, base + (sc + 1) * c, dn, slice_sizes=(2 * c,),
                             mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        g = jnp.concatenate([top, bot], axis=-1)
        return _lerp(g.reshape(1, row_block, col_block, 4, c), ay_b, ax_b)

    outs = jax.lax.map(do_block, jnp.arange(nr * nc))
    outs = outs.reshape(nr, nc, 1, row_block, col_block, c)
    out = outs.transpose(2, 0, 3, 1, 4, 5).reshape(1, h, w, c)
    hl, wl = h // 4, w // 4
    out = out.reshape(1, hl, 4, wl, 4, c).transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(1, hl, wl, 16 * c)


def main() -> None:
    h, w = 2160, 3840
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, h, w, 3), dtype)
    flow = jnp.asarray(rng.rand(1, h, w, 2) * 190 - 95, dtype)

    want = np.asarray(warp_space_to_depth(img, flow, 4), np.float32)
    best = (None, 1e9)

    for name, fn in [("baseline 240x512",
                      lambda im, fl: warp_space_to_depth(im, fl, 4)),
                     ("blockpack 240x512", blockpack_warp_s2d),
                     ("blockpack 216x480",
                      lambda im, fl: blockpack_warp_s2d(im, fl, 216, 480)),
                     ("pairgather 240x512", pairgather_warp_s2d),
                     ("pairgather 216x480",
                      lambda im, fl: pairgather_warp_s2d(im, fl, 216, 480))]:
        try:
            got = np.asarray(fn(img, flow), np.float32)
            diff = np.abs(want - got).max()
            sec = device_time(jax.jit(fn), img, flow, iters=5, warmup=1)
        except Exception as e:  # noqa: BLE001
            print(f"{name:18s}: FAILED {type(e).__name__}: {str(e)[:120]}")
            continue
        if sec < best[1]:
            best = (name, sec)
        print(f"{name:18s}: {sec*1e3:7.2f} ms   maxdiff {diff}")

    import os
    if not os.environ.get("SWEEP_GRID"):
        print(f"best: {best[0]}  {best[1]*1e3:.2f} ms")
        return
    for rb in (216, 240, 270, 432, 540):
        for cb in (480, 512, 768, 960, 1920, 3840):
            f = jax.jit(lambda im, fl, rb=rb, cb=cb: warp_space_to_depth(
                im, fl, 4, row_block=rb, col_block=cb))
            try:
                sec = device_time(f, img, flow, iters=5, warmup=1)
            except Exception as e:  # noqa: BLE001
                print(f"rb={rb:4d} cb={cb:4d}: FAILED {type(e).__name__}")
                continue
            tag = ""
            if sec < best[1]:
                best = ((rb, cb), sec)
                tag = "  <-- best"
            print(f"rb={rb:4d} cb={cb:4d}: {sec*1e3:7.2f} ms{tag}")
    print(f"best: {best[0]}  {best[1]*1e3:.2f} ms")


if __name__ == "__main__":
    main()
