"""Dense backward image warping by a flow field (TF-exact semantics).

The single most important kernel of the framework (SURVEY.md §2.2): the
recurrent step warps the previous HR output toward the current frame once per
frame, and training additionally warps LR frames (fnet warp loss) and the
discriminator input triplets. Replaces ``tf.contrib.image.dense_image_warp``
(used at reference main.py:215, Teco.py:120-122,140-141,224,254).

Semantics (bit-matching TF's `_interpolate_bilinear`):
  output[b, y, x, c] = bilinear_sample(image[b], y - flow[b,y,x,0],
                                                 x - flow[b,y,x,1], c)
with, per axis: floor coordinates clamped into [0, size-2] *before* the
fractional weight is computed, and the fraction clamped into [0, 1]. This
gives edge-clamp behaviour for out-of-range queries.

TPU implementation ("tap-packed gather"): XLA's TPU gather costs are per
*index*, so the naive 4-corner realization (four gathers of (H*W, C) slices)
pays 4x. Instead the four bilinear taps are pre-packed into one contiguous
4C-channel image via two rolls + concat (vectorized, HBM-bandwidth cheap),
after which a SINGLE flattened-index gather fetches all four corners of every
output pixel in one contiguous slice. Measured 2.6x faster than the 4-gather
form at 576x720 on TPU. Rolled wrap-around values are never addressed because
corner indices are clamped to [0, size-2] per axis. Gradients flow through
gather's scatter-add transpose and the rolls' inverse rolls.

:func:`dense_image_warp_reference` keeps the direct 4-gather form as the
parity oracle for tests.

Batched warps (multi-stream serving, round 2 measurements at B=4, 576x720
bf16 on v5e): the per-image ``lax.map`` below is the measured optimum — one
batched gather over the (B, H*W, 4C) operand takes 14.9 ms vs 6.5 ms for the
map (the 40 MB batched working set falls off the gather cache cliff), a
flattened single gather 14.0 ms, and every batched 2D-blocked variant
(288x360 / 144x360 / 144x180 / 96x720 / 192x720 tiles, halo 97) 14.2-21.7 ms.
Gather flags are also a wash: ``PROMISE_IN_BOUNDS`` and
``indices_are_sorted=True`` were within noise of ``take_along_axis``. TPU
gather is index-rate-bound at ~4-6 ns/index regardless, so batched warp cost
scales ~linearly with B — the serial map loses nothing.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _corner_coords(
    shape: Tuple[int, ...], flow: jnp.ndarray, dtype
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Shared index/weight math: clamped top-left corner + fractions.

    Coordinates are always computed in float32: in bf16 the pixel grid is
    only exact up to 256, so half-precision coordinates would quantize
    sample positions by whole pixels on large frames (e.g. 2160p). Only the
    final fractional weights are cast to the compute ``dtype``.
    """
    _, h, w, _ = shape
    coord_dtype = jnp.promote_types(flow.dtype, jnp.float32)
    flow = flow.astype(coord_dtype)
    grid_y = jnp.arange(h, dtype=coord_dtype)[None, :, None]
    grid_x = jnp.arange(w, dtype=coord_dtype)[None, None, :]
    qy = grid_y - flow[..., 0]  # (B, H, W)
    qx = grid_x - flow[..., 1]
    fy = jnp.clip(jnp.floor(qy), 0.0, h - 2)
    fx = jnp.clip(jnp.floor(qx), 0.0, w - 2)
    ay = jnp.clip(qy - fy, 0.0, 1.0)[..., None].astype(dtype)
    ax = jnp.clip(qx - fx, 0.0, 1.0)[..., None].astype(dtype)
    return fy.astype(jnp.int32), fx.astype(jnp.int32), ay, ax


def _tap_pack(image: jnp.ndarray) -> jnp.ndarray:
    """packed[y, x] = (img[y,x], img[y,x+1], img[y+1,x], img[y+1,x+1]) as
    4C contiguous channels (rolled wrap values are never addressed since
    corner indices are clamped to [0, size-2])."""
    right = jnp.roll(image, -1, axis=2)
    down = jnp.roll(image, -1, axis=1)
    diag = jnp.roll(down, -1, axis=2)
    return jnp.concatenate([image, right, down, diag], axis=-1)


def _lerp(g, ay, ax):
    tl, tr, bl, br = g[..., 0, :], g[..., 1, :], g[..., 2, :], g[..., 3, :]
    top = tl + (tr - tl) * ax
    bot = bl + (br - bl) * ax
    return top + (bot - top) * ay


# Gather throughput collapses when the operand's working set outgrows the
# on-chip caches (measured 2.1 ns/index at 576x720 -> 27 ns/index at
# 2160x3840 on v5e). Above this pixel count the warp gathers within
# row-blocked slabs instead (requires a flow bound).
_BLOCK_THRESHOLD_PIXELS = 2_000_000
# Per-image pixel count above which batched warps are mapped per image
# (keeps each gather's working set to a single frame).
_MAP_THRESHOLD_PIXELS = 250_000
_DEFAULT_MAX_DISPLACEMENT = 96.0  # 4 * flow_max_velocity (frvsr.py:39-40)
# Many-small-frame batched warps are chunked so each gather/scatter works on
# roughly this many pixels (the geometry where the scatter backward was
# measured fastest — see the chunked-map branch in dense_image_warp; 65k
# swept optimal: 131k-pixel chunks cost 121 vs 113 ms/TecoGAN-step).
_CHUNKED_MAP_MIN_INDICES = 500_000
_CHUNK_TARGET_PIXELS = 65_536


# NOT on any default path (measured NEGATIVE): a sort-based adjoint for the
# batched gather — argsort cotangent rows by destination index, then
# ``segment_sum(indices_are_sorted=True)``. Tried against the 72-frame f32
# Dst-warp scatter backward (76 ms of a 169 ms TecoGAN step): the TecoGAN
# step REGRESSED 173 -> 193 ms — the 1.18M-key sort + reorder gathers cost
# more than the random scatter they replace. The actual fix was dtype: the
# scatter was f32 only because of a generator dtype leak (models/generator.py).
_SORTED_BWD_MIN_INDICES = None  # disabled; kept for study with tests


@jax.custom_vjp
def _gather_rows(packed_flat: jnp.ndarray, base: jnp.ndarray) -> jnp.ndarray:
    """``take_along_axis(packed_flat, base, axis=1)`` with the sort-based
    adjoint described above (off the default path)."""
    return jnp.take_along_axis(packed_flat, base, axis=1)


def _gather_rows_fwd(packed_flat, base):
    return _gather_rows(packed_flat, base), (base, packed_flat.shape[1])


def _gather_rows_bwd(res, ct):
    base, n_rows = res
    idx = base[..., 0]                                     # (B, M)
    order = jnp.argsort(idx, axis=1)
    ids = jnp.take_along_axis(idx, order, axis=1)
    cts = jnp.take_along_axis(ct, order[..., None], axis=1)
    seg = jax.vmap(
        lambda i, c: jax.ops.segment_sum(
            c, i, num_segments=n_rows, indices_are_sorted=True)
    )(ids, cts)
    return seg, None


_gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


def _snap_block(size: int, target: int) -> int:
    """Largest-near-target divisor of ``size`` (for uniform blocking)."""
    n_target = max(1, round(size / target))
    for dn in sorted(range(-n_target + 1, n_target + 8), key=abs):
        n = n_target + dn
        if n >= 1 and size % n == 0:
            return size // n
    return size


def _s2d_tile(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/s, W/s, s*s*C) space-to-depth (TF channel order)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // s, s, w // s, s, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // s, w // s, s * s * c)


def dense_image_warp(
    image: jnp.ndarray,
    flow: jnp.ndarray,
    max_displacement: float = _DEFAULT_MAX_DISPLACEMENT,
    row_block: int = 240,
    col_block: int = 512,
    s2d_block: int = 0,
    scale: float = 1.0,
    shift: float = 0.0,
) -> jnp.ndarray:
    """Backward-warp ``image`` by ``flow`` ((dy, dx) channel order).

    Args:
      image: (B, H, W, C).
      flow: (B, H, W, 2); the sampled location is ``grid - flow``.
      max_displacement: bound on |flow| used to size the blocked gather
        slabs on large frames. The recurrent pipeline's flows are tanh-
        bounded to 24 LR px = 96 HR px (reference frvsr.py:39-40); flows
        beyond the bound are clamped by the blocked path, so pass a larger
        bound (or ``None`` to disable blocking) for unconstrained flows.
      row_block / col_block: target 2D gather tile on the blocked path
        (snapped to divisors of H/W; measured sweet spot ~240x384-768 on
        v5e, 7.5x over the unblocked gather at 2160p).
      s2d_block: if nonzero, emit ``space_to_depth(scale * warp + shift,
        s2d_block)`` instead of the raw warp. On the blocked path the s2d
        transpose runs per gather tile and fuses with the lerp epilogue —
        one full-frame lane-interleave transpose fewer than warping then
        packing (~4.7 ms/frame at 2160p, tools/trace_2160p.py).

    Returns:
      (B, H, W, C) warped image (or its s2d packing), dtype of ``image``.
    """
    b, h, w, c = image.shape
    dtype = image.dtype

    def epilogue(x: jnp.ndarray) -> jnp.ndarray:
        if scale != 1.0 or shift != 0.0:
            x = x * jnp.asarray(scale, dtype) + jnp.asarray(shift, dtype)
        return _s2d_tile(x, s2d_block) if s2d_block else x

    # Batched large frames: gather throughput collapses when the operand
    # spans all batch elements (working set b*H*W*4C); map per image so each
    # gather sees one frame's operand (measured 2.3x at B=4, 576x720).
    if b > 1 and h * w > _MAP_THRESHOLD_PIXELS:
        def one(args):
            im, fl = args
            return dense_image_warp(
                im[None], fl[None], max_displacement=max_displacement,
                row_block=row_block, col_block=col_block,
                s2d_block=s2d_block, scale=scale, shift=shift,
            )[0]
        return jax.lax.map(one, (image, flow))

    # Many small frames (the training Dst-input warp: 72 frames of 128x128):
    # one giant batched gather is fine forward, but its scatter-add BACKWARD
    # over a channel-major (4C, B*H*W) operand ran at ~44 ns/index (52 ms of
    # a 146 ms TecoGAN step) while the same op on 4-image chunks inside the
    # training scan runs at ~11 ns/index. Chunk through lax.map so each
    # scatter sees a cache-sized operand.
    if (b >= 8 and h * w <= _MAP_THRESHOLD_PIXELS
            and b * h * w >= _CHUNKED_MAP_MIN_INDICES):
        chunk = max(1, _CHUNK_TARGET_PIXELS // (h * w))
        if chunk > 1 and b % chunk == 0:
            def few(args):
                im, fl = args
                return dense_image_warp(
                    im, fl, max_displacement=max_displacement,
                    row_block=row_block, col_block=col_block,
                    s2d_block=s2d_block, scale=scale, shift=shift)
            imgs = image.reshape(b // chunk, chunk, h, w, c)
            fls = flow.reshape(b // chunk, chunk, h, w, 2)
            out = jax.lax.map(few, (imgs, fls))
            return out.reshape((b,) + out.shape[2:])

    iy, ix, ay, ax = _corner_coords(image.shape, flow, dtype)

    halo = int(max_displacement) + 1 if max_displacement is not None else 0
    if max_displacement is not None and h * w > _BLOCK_THRESHOLD_PIXELS:
        row_block = _snap_block(h, row_block)
        col_block = _snap_block(w, col_block)
    use_blocks = (
        max_displacement is not None
        and h * w > _BLOCK_THRESHOLD_PIXELS
        and h > 2 * halo + row_block
        and w > 2 * halo + col_block
    )
    if not use_blocks:
        # Flat-layout form: tap-pack, gather, and lerp all operate on the
        # row-major (B, H*W, C) view so XLA never relays anything out —
        # the 2D pack/reshape form cost 0.37 ms/frame of pure layout
        # copies around the gather at 576x720 (trace_step.py stream).
        # Rolls along the flat axis wrap across row/frame edges; those
        # positions are never addressed (corner indices clamp to size-2).
        flat_img = image.reshape(b, h * w, c)
        flat = jnp.concatenate(
            [flat_img,
             jnp.roll(flat_img, -1, axis=1),
             jnp.roll(flat_img, -w, axis=1),
             jnp.roll(flat_img, -(w + 1), axis=1)], axis=-1)
        base = (iy * w + ix).reshape(b, h * w, 1)
        if (_SORTED_BWD_MIN_INDICES is not None
                and b * h * w >= _SORTED_BWD_MIN_INDICES):
            g = _gather_rows(flat, base)  # sort-based adjoint (study only)
        else:
            g = jnp.take_along_axis(flat, base, axis=1)
        # Identical arithmetic to _lerp (same ops/order/dtypes), sliced on
        # the minor axis of the gather result instead of a 5D reshape.
        tl, tr = g[..., :c], g[..., c:2 * c]
        bl, br = g[..., 2 * c:3 * c], g[..., 3 * c:]
        axf = ax.reshape(b, h * w, 1)
        ayf = ay.reshape(b, h * w, 1)
        top = tl + (tr - tl) * axf
        bot = bl + (br - bl) * axf
        out = (top + (bot - top) * ayf).reshape(b, h, w, c)
        return epilogue(out)
    packed = _tap_pack(image)

    sr, sc = row_block + 2 * halo, col_block + 2 * halo
    nr, nc = h // row_block, w // col_block
    # Per-tile s2d requires tile sides divisible by the s2d block.
    tile_s2d = s2d_block if (
        s2d_block and row_block % s2d_block == 0 and col_block % s2d_block == 0
    ) else 0

    def do_block(k):
        r0 = (k // nc) * row_block
        c0 = (k % nc) * col_block
        s0 = jnp.clip(r0 - halo, 0, h - sr)
        q0 = jnp.clip(c0 - halo, 0, w - sc)
        slab = jax.lax.dynamic_slice(packed, (0, s0, q0, 0), (b, sr, sc, 4 * c))
        iy_b = jnp.clip(
            jax.lax.dynamic_slice(iy, (0, r0, c0), (b, row_block, col_block)) - s0,
            0, sr - 1,
        )
        ix_b = jnp.clip(
            jax.lax.dynamic_slice(ix, (0, r0, c0), (b, row_block, col_block)) - q0,
            0, sc - 1,
        )
        ay_b = jax.lax.dynamic_slice(ay, (0, r0, c0, 0), (b, row_block, col_block, 1))
        ax_b = jax.lax.dynamic_slice(ax, (0, r0, c0, 0), (b, row_block, col_block, 1))
        base = (iy_b * sc + ix_b).reshape(b, row_block * col_block, 1)
        g = jnp.take_along_axis(slab.reshape(b, sr * sc, 4 * c), base, axis=1)
        out = _lerp(g.reshape(b, row_block, col_block, 4, c), ay_b, ax_b)
        if tile_s2d:
            if scale != 1.0 or shift != 0.0:
                out = out * jnp.asarray(scale, dtype) + jnp.asarray(shift, dtype)
            out = _s2d_tile(out, tile_s2d)
        return out

    outs = jax.lax.map(do_block, jnp.arange(nr * nc))
    if tile_s2d:
        s = tile_s2d
        outs = outs.reshape(nr, nc, b, row_block // s, col_block // s, s * s * c)
        outs = outs.transpose(2, 0, 3, 1, 4, 5)
        return outs.reshape(b, h // s, w // s, s * s * c)
    outs = outs.reshape(nr, nc, b, row_block, col_block, c)
    outs = outs.transpose(2, 0, 3, 1, 4, 5)
    out = outs.reshape(b, h, w, c)
    return epilogue(out)


def warp_space_to_depth_halo(
    image: jnp.ndarray,
    flow: jnp.ndarray,
    mesh,
    axis: str,
    block: int = 4,
    scale: float = 1.0,
    shift: float = 0.0,
    max_displacement: float = _DEFAULT_MAX_DISPLACEMENT,
    row_block: int = 240,
    col_block: int = 512,
) -> jnp.ndarray:
    """H-sharded fused warp + space-to-depth with an explicit halo exchange.

    GSPMD cannot infer that the warp gather's indices are halo-bounded
    (|flow| <= ``max_displacement``): partitioning :func:`warp_space_to_depth`
    under a ``PartitionSpec(None, axis)`` annotation all-gathers the full
    packed HR operand *and* the index/weight grids on every shard — measured
    ~537 MB of collectives per frame at 2048x4096 8-way
    (``tools/audit_spatial_hlo.py``), which erases spatial scaling. This
    version runs the warp inside :func:`jax.shard_map`: each shard exchanges
    exactly one ``halo``-row band with each H-neighbor via ``lax.ppermute``
    (~2 MB/frame over ICI) and gathers shard-locally.

    Boundary shards receive zero halos (ppermute's no-source fill); those
    rows are never addressed because corner indices are globally clamped to
    [0, H-2] before localization, reproducing TF's edge-clamp semantics
    (reference dense_image_warp, Teco.py:119-122) exactly — outputs are
    bit-identical to the unsharded op.

    Requires shard height > halo (one-neighbor exchange); raises otherwise.

    Args:
      image: (B, H, W, C) global HR image, H sharded over ``axis``.
      flow: (B, H, W, 2) global HR flow, same sharding.
      mesh: the Mesh carrying ``axis``.
      max_displacement: bound on |flow| (production flows are tanh-bounded
        to 24 LR px = 96 HR px, reference frvsr.py:39-40).

    Returns:
      (B, H/block, W/block, block*block*C), H sharded over ``axis``.
    """
    from jax.sharding import PartitionSpec as P

    b, h, w, c = image.shape
    n = mesh.shape[axis]
    if h % (n * block) != 0:
        raise ValueError(
            f"H={h} must divide into {n} shards of {block}-multiples")
    hs = h // n
    halo = int(max_displacement) + 1
    if hs <= halo:
        raise ValueError(
            f"shard height {hs} must exceed halo {halo}; use fewer shards "
            f"(<= {h // (halo + 1)}) for {h}-row frames")
    dtype = image.dtype

    def local_warp(img_l, fl_l):
        # img_l: (b, hs, w, c) shard; fl_l: (b, hs, w, 2).
        i = jax.lax.axis_index(axis)
        r0 = i * hs
        fwd = [(j, j + 1) for j in range(n - 1)]   # my bottom -> next's top halo
        bwd = [(j + 1, j) for j in range(n - 1)]   # my top -> prev's bottom halo
        top = jax.lax.ppermute(img_l[:, hs - halo:], axis, fwd)
        bot = jax.lax.ppermute(img_l[:, :halo], axis, bwd)
        ext = jnp.concatenate([top, img_l, bot], axis=1)  # (b, hs+2*halo, w, c)
        ext_h = hs + 2 * halo

        # Corner coords on the GLOBAL grid (clamp to the full image), then
        # localized into ext rows.
        coord_dtype = jnp.promote_types(fl_l.dtype, jnp.float32)
        fl32 = fl_l.astype(coord_dtype)
        grid_y = (r0 + jnp.arange(hs, dtype=jnp.int32)).astype(coord_dtype)[
            None, :, None]
        grid_x = jnp.arange(w, dtype=coord_dtype)[None, None, :]
        qy = grid_y - fl32[..., 0]
        qx = grid_x - fl32[..., 1]
        fy = jnp.clip(jnp.floor(qy), 0.0, h - 2)
        fx = jnp.clip(jnp.floor(qx), 0.0, w - 2)
        ay = jnp.clip(qy - fy, 0.0, 1.0)[..., None].astype(dtype)
        ax = jnp.clip(qx - fx, 0.0, 1.0)[..., None].astype(dtype)
        iy = fy.astype(jnp.int32) - (r0 - halo)  # ext-local rows
        ix = fx.astype(jnp.int32)

        packed = _tap_pack(ext)
        rb = _snap_block(hs, row_block)
        cb = _snap_block(w, col_block)
        if hs * w <= _BLOCK_THRESHOLD_PIXELS or w <= 2 * halo + cb:
            base = (iy * w + ix).reshape(b, hs * w, 1)
            g = jnp.take_along_axis(
                packed.reshape(b, ext_h * w, 4 * c), base, axis=1)
            out = _lerp(g.reshape(b, hs, w, 4, c), ay, ax)
        else:
            # 2D-blocked local gather (same rationale as dense_image_warp's
            # blocked path: keep each gather's operand cache-sized). Output
            # block rows [a, a+rb) need ext rows [a, a + rb + 2*halo).
            sr, sc = rb + 2 * halo, cb + 2 * halo
            nr, nc = hs // rb, w // cb

            def do_block(k):
                a = (k // nc) * rb
                c0 = (k % nc) * cb
                s0 = jnp.clip(a, 0, ext_h - sr)
                q0 = jnp.clip(c0 - halo, 0, w - sc)
                slab = jax.lax.dynamic_slice(
                    packed, (0, s0, q0, 0), (b, sr, sc, 4 * c))
                iy_b = jnp.clip(
                    jax.lax.dynamic_slice(iy, (0, a, c0), (b, rb, cb)) - s0,
                    0, sr - 1)
                ix_b = jnp.clip(
                    jax.lax.dynamic_slice(ix, (0, a, c0), (b, rb, cb)) - q0,
                    0, sc - 1)
                ay_b = jax.lax.dynamic_slice(ay, (0, a, c0, 0), (b, rb, cb, 1))
                ax_b = jax.lax.dynamic_slice(ax, (0, a, c0, 0), (b, rb, cb, 1))
                base = (iy_b * sc + ix_b).reshape(b, rb * cb, 1)
                g = jnp.take_along_axis(
                    slab.reshape(b, sr * sc, 4 * c), base, axis=1)
                return _lerp(g.reshape(b, rb, cb, 4, c), ay_b, ax_b)

            outs = jax.lax.map(do_block, jnp.arange(nr * nc))
            outs = outs.reshape(nr, nc, b, rb, cb, c)
            out = outs.transpose(2, 0, 3, 1, 4, 5).reshape(b, hs, w, c)

        if scale != 1.0 or shift != 0.0:
            out = out * jnp.asarray(scale, dtype) + jnp.asarray(shift, dtype)
        hl, wl = hs // block, w // block
        out = out.reshape(b, hl, block, wl, block, c).transpose(0, 1, 3, 2, 4, 5)
        return out.reshape(b, hl, wl, block * block * c)

    return jax.shard_map(
        local_warp,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis)),
        out_specs=P(None, axis),
    )(image, flow)


def dense_image_warp_flowlr(
    image: jnp.ndarray,
    flow_lr: jnp.ndarray,
    max_displacement: float = _DEFAULT_MAX_DISPLACEMENT,
    row_block: int = 240,
    col_block: int = 512,
) -> jnp.ndarray:
    """Blocked warp with the 4x flow upsample and gather coordinates
    computed PER TILE from the LR flow.

    Semantically ``dense_image_warp(image, upscale_bilinear(flow_lr*4, 4))``
    up to 1-ulp einsum reassociation in the per-tile upsample
    (the recurrent pipeline's exact flow path, reference main.py:212-215):
    the legacy TF bilinear phase weights are applied to a (rb/4+1, cb/4+1)
    LR flow slab inside each gather tile. This removes the full-frame HR
    flow / coordinate materializations — at 2160p those cost ~8.6 ms/frame
    (~6.4 ms of clip/floor/select passes over four 33 MB coordinate grids
    plus ~2.2 ms of flow-upsample layout copies, tools/trace_2160p.py) and
    their HBM traffic; per-tile they fuse into the gather prologue.

    Requires H*W > the blocking threshold and tile sides divisible by 4
    (guaranteed for the production 2160p geometry); callers fall back to
    the global-flow path otherwise.

    Args:
      image: (B, H, W, C) HR image.
      flow_lr: (B, H/4, W/4, 2) LR flow in LR pixel units (fnet output,
        already padded to the LR grid — ``pad_flow_to``).
    """
    b, h, w, c = image.shape
    dtype = image.dtype
    assert flow_lr.shape[1] * 4 == h and flow_lr.shape[2] * 4 == w

    if b > 1:  # same rationale as dense_image_warp's per-image map
        def one(args):
            im, fl = args
            return dense_image_warp_flowlr(
                im[None], fl[None], max_displacement=max_displacement,
                row_block=row_block, col_block=col_block)[0]
        return jax.lax.map(one, (image, flow_lr))

    halo = int(max_displacement) + 1
    rb = _snap_block(h, row_block)
    cb = _snap_block(w, col_block)
    if (h * w <= _BLOCK_THRESHOLD_PIXELS or rb % 4 or cb % 4
            or h <= 2 * halo + rb or w <= 2 * halo + cb):
        from tecogan_tpu.ops.resize import upscale_bilinear

        flow_hr = upscale_bilinear(flow_lr * 4.0, 4)
        return dense_image_warp(image, flow_hr,
                                max_displacement=max_displacement,
                                row_block=row_block, col_block=col_block)

    # LR flow scaled to HR units, then replicate-padded bottom/right so the
    # per-tile +1 taps never leave the array (matches upscale_bilinear's
    # edge replication; scale-then-upsample order matches upscale_flow).
    fp = flow_lr * jnp.asarray(4.0, flow_lr.dtype)
    fp = jnp.concatenate([fp, fp[:, -1:]], axis=1)
    fp = jnp.concatenate([fp, fp[:, :, -1:]], axis=2)[0]  # (hl+1, wl+1, 2)

    from tecogan_tpu.ops.resize import _bilinear_phase_weights

    wp = _bilinear_phase_weights(4)
    wgt = jnp.asarray(
        np.einsum("pa,qd->pqad", wp, wp), dtype=flow_lr.dtype)  # (4,4,2,2)

    packed = _tap_pack(image)
    sr, sc = rb + 2 * halo, cb + 2 * halo
    nr, nc = h // rb, w // cb
    coord_dtype = jnp.promote_types(flow_lr.dtype, jnp.float32)

    def do_block(k):
        r0 = (k // nc) * rb
        c0 = (k % nc) * cb
        # --- inline legacy-bilinear flow upsample on the LR slab ---
        fs = jax.lax.dynamic_slice(
            fp, (r0 // 4, c0 // 4, 0), (rb // 4 + 1, cb // 4 + 1, 2))
        corners = jnp.stack([
            jnp.stack([fs[:-1, :-1], fs[:-1, 1:]], axis=0),
            jnp.stack([fs[1:, :-1], fs[1:, 1:]], axis=0),
        ], axis=0)  # (2, 2, ib, jb, 2ch)
        fl = jnp.einsum("pqad,adhwc->hpwqc", wgt, corners,
                        precision="highest").reshape(rb, cb, 2)
        # --- gather coordinates for this tile (f32; see _corner_coords) ---
        fl32 = fl.astype(coord_dtype)
        gy = (r0 + jnp.arange(rb, dtype=jnp.int32)).astype(coord_dtype)[:, None]
        gx = (c0 + jnp.arange(cb, dtype=jnp.int32)).astype(coord_dtype)[None, :]
        qy = gy - fl32[..., 0]
        qx = gx - fl32[..., 1]
        fy = jnp.clip(jnp.floor(qy), 0.0, h - 2)
        fx = jnp.clip(jnp.floor(qx), 0.0, w - 2)
        ay = jnp.clip(qy - fy, 0.0, 1.0)[None, ..., None].astype(dtype)
        ax = jnp.clip(qx - fx, 0.0, 1.0)[None, ..., None].astype(dtype)
        s0 = jnp.clip(r0 - halo, 0, h - sr)
        q0 = jnp.clip(c0 - halo, 0, w - sc)
        iy_b = jnp.clip(fy.astype(jnp.int32) - s0, 0, sr - 1)
        ix_b = jnp.clip(fx.astype(jnp.int32) - q0, 0, sc - 1)
        slab = jax.lax.dynamic_slice(packed, (0, s0, q0, 0), (1, sr, sc, 4 * c))
        base = (iy_b * sc + ix_b).reshape(1, rb * cb, 1)
        g = jnp.take_along_axis(slab.reshape(1, sr * sc, 4 * c), base, axis=1)
        return _lerp(g.reshape(1, rb, cb, 4, c), ay, ax)

    outs = jax.lax.map(do_block, jnp.arange(nr * nc))
    outs = outs.reshape(nr, nc, 1, rb, cb, c)
    return outs.transpose(2, 0, 3, 1, 4, 5).reshape(1, h, w, c)


def warp_space_to_depth_flowlr(
    image: jnp.ndarray,
    flow_lr: jnp.ndarray,
    block: int = 4,
    scale: float = 1.0,
    shift: float = 0.0,
    max_displacement: float = _DEFAULT_MAX_DISPLACEMENT,
    row_block: int = 240,
    col_block: int = 512,
) -> jnp.ndarray:
    """``space_to_depth(scale * dense_image_warp_flowlr(...) + shift)`` —
    the LR-flow-driven form of :func:`warp_space_to_depth`."""
    b, h, w, c = image.shape
    assert h % block == 0 and w % block == 0, (h, w, block)
    dtype = image.dtype
    out = dense_image_warp_flowlr(image, flow_lr,
                                  max_displacement=max_displacement,
                                  row_block=row_block, col_block=col_block)
    if scale != 1.0 or shift != 0.0:
        out = out * jnp.asarray(scale, dtype) + jnp.asarray(shift, dtype)
    return _s2d_tile(out, block)


def dense_image_warp_box(
    image: jnp.ndarray,
    flow: jnp.ndarray,
    origin: Tuple[int, int],
) -> jnp.ndarray:
    """Warp only an output WINDOW of the full grid, gathering from the whole
    source frame.

    Semantically ``dense_image_warp(image, flow_full)[:, y0:y0+bh,
    x0:x0+bw]`` where ``flow`` is the same slice of ``flow_full`` — bit-
    identical arithmetic (same f32 coordinates, clamps and lerp as the flat
    path of :func:`dense_image_warp`), but the gather carries only the
    window's indices and its scatter-add backward only the window's
    cotangents. Built for the Dst input assembly (reference
    Teco.py:216-220,230-234): with ``crop_dt=0.75`` everything outside the
    center box is zero-masked, so warping the full frame wastes
    1 - 0.75^2 = 44% of the train step's largest op family
    (train/losses.py:assemble_dst_inputs).

    Args:
      image: (B, H, W, C) full source frames.
      flow: (B, bh, bw, 2) flow on the output window only.
      origin: (y0, x0) of the window on the full grid.

    Returns:
      (B, bh, bw, C) warped window, dtype of ``image``.
    """
    b, h, w, c = image.shape
    bh, bw = flow.shape[1], flow.shape[2]
    y0, x0 = origin
    assert 0 <= y0 <= h - bh and 0 <= x0 <= w - bw, (origin, (bh, bw), (h, w))
    dtype = image.dtype

    # Same cache-sized chunking as dense_image_warp's many-small-frames path:
    # thresholds use the SOURCE frame pixels (the gather/scatter operand).
    if (b >= 8 and h * w <= _MAP_THRESHOLD_PIXELS
            and b * h * w >= _CHUNKED_MAP_MIN_INDICES):
        chunk = max(1, _CHUNK_TARGET_PIXELS // (h * w))
        if chunk > 1 and b % chunk == 0:
            def few(args):
                im, fl = args
                return dense_image_warp_box(im, fl, origin)
            imgs = image.reshape(b // chunk, chunk, h, w, c)
            fls = flow.reshape(b // chunk, chunk, bh, bw, 2)
            out = jax.lax.map(few, (imgs, fls))
            return out.reshape(b, bh, bw, c)

    # Window-offset grid; coordinates in f32 (see _corner_coords).
    coord_dtype = jnp.promote_types(flow.dtype, jnp.float32)
    fl32 = flow.astype(coord_dtype)
    grid_y = (y0 + jnp.arange(bh, dtype=jnp.int32)).astype(coord_dtype)[
        None, :, None]
    grid_x = (x0 + jnp.arange(bw, dtype=jnp.int32)).astype(coord_dtype)[
        None, None, :]
    qy = grid_y - fl32[..., 0]
    qx = grid_x - fl32[..., 1]
    fy = jnp.clip(jnp.floor(qy), 0.0, h - 2)
    fx = jnp.clip(jnp.floor(qx), 0.0, w - 2)
    ay = jnp.clip(qy - fy, 0.0, 1.0)[..., None].astype(dtype)
    ax = jnp.clip(qx - fx, 0.0, 1.0)[..., None].astype(dtype)
    iy = fy.astype(jnp.int32)
    ix = fx.astype(jnp.int32)

    # Flat-layout tap-packed gather (see dense_image_warp's flat path).
    flat_img = image.reshape(b, h * w, c)
    flat = jnp.concatenate(
        [flat_img,
         jnp.roll(flat_img, -1, axis=1),
         jnp.roll(flat_img, -w, axis=1),
         jnp.roll(flat_img, -(w + 1), axis=1)], axis=-1)
    base = (iy * w + ix).reshape(b, bh * bw, 1)
    g = jnp.take_along_axis(flat, base, axis=1)
    tl, tr = g[..., :c], g[..., c:2 * c]
    bl, br = g[..., 2 * c:3 * c], g[..., 3 * c:]
    axf = ax.reshape(b, bh * bw, 1)
    ayf = ay.reshape(b, bh * bw, 1)
    top = tl + (tr - tl) * axf
    bot = bl + (br - bl) * axf
    return (top + (bot - top) * ayf).reshape(b, bh, bw, c)


def dense_image_warp_reference(image: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Direct 4-gather realization — the parity oracle for tests."""
    b, h, w, c = image.shape
    iy, ix, ay, ax = _corner_coords(image.shape, flow, image.dtype)

    flat = image.reshape(b, h * w, c)
    base = iy * w + ix

    def gather(idx):
        g = jnp.take_along_axis(flat, idx.reshape(b, h * w, 1), axis=1)
        return g.reshape(b, h, w, c)

    tl = gather(base)
    tr = gather(base + 1)
    bl = gather(base + w)
    br = gather(base + w + 1)

    top = tl + (tr - tl) * ax
    bot = bl + (br - bl) * ax
    return top + (bot - top) * ay


def warp_space_to_depth(
    image: jnp.ndarray,
    flow: jnp.ndarray,
    block: int = 4,
    scale: float = 1.0,
    shift: float = 0.0,
    row_block: int = 240,
    col_block: int = 512,
    max_displacement: float = _DEFAULT_MAX_DISPLACEMENT,
) -> jnp.ndarray:
    """Fused ``space_to_depth(scale * dense_image_warp(image, flow) + shift)``.

    The recurrent step only ever consumes the warped previous HR frame
    through space-to-depth packing (reference main.py:201, Teco.py:143-148);
    ``scale``/``shift`` fold the deprocess affine ([-1,1] -> [0,1], reference
    Teco.py:143) into the interpolation epilogue so no extra elementwise pass
    over the HR image is materialized.

    Note: an earlier variant reordered the gather *indices* into s2d order so
    the gather output needed no transpose — measured 2.5x SLOWER on TPU than
    row-major gather + transpose, because XLA's gather throughput depends on
    index locality. Keep the gather row-major.

    Args:
      image: (B, H, W, C) with H, W divisible by ``block``.
      flow: (B, H, W, 2) HR flow.

    Returns:
      (B, H/block, W/block, block*block*C).
    """
    b, h, w, c = image.shape
    assert h % block == 0 and w % block == 0, (h, w, block)
    # NOTE: dense_image_warp's s2d_block option fuses the s2d per gather
    # tile — measured SLOWER in the 2160p streaming scan (92.7 vs 82.3
    # ms/frame, tools/ab_step.py: the tiled reassembly transpose costs more
    # than one full-frame s2d), so the production path packs after the warp.
    dtype = image.dtype
    out = dense_image_warp(image, flow, row_block=row_block,
                           col_block=col_block,
                           max_displacement=max_displacement)
    if scale != 1.0 or shift != 0.0:
        out = out * jnp.asarray(scale, dtype) + jnp.asarray(shift, dtype)
    return _s2d_tile(out, block)
