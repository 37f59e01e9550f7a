"""Pallas TPU kernel: the generator's residual-block chain, fused.

The FRVSR generator's trunk is 16 residual blocks = 32 sequential 3x3 convs
at 64 channels (reference frvsr.py:59-73). This kernel executes the entire
chain as ONE Pallas launch with the activation resident in VMEM, each conv
realized as 9 shifted-tap MXU matmuls.

**Measured outcome (v5e, 144x180x64 bf16, honest benchmark with carried
dependencies): the fused kernel runs at ~3.3 ms vs XLA's ~2.4-2.8 ms for
the same chain.** The tap matmuls are (M, 64) @ (64, 64): K=N=64 uses at
most 25% of the 128x128 MXU (~21 TF/s achieved), while XLA's conv lowering
reaches ~33 TF/s via its internal im2col (K=576). Fusing the chain removes
per-op overhead (~10-30 us/op) but that saving is smaller than the MXU
utilization gap. The kernel is therefore NOT wired into the default model
path — `resblock_chain` dispatches to it only when explicitly requested;
XLA remains the production path.

The pair-packed variants below (`resblock_chain_paired`, `_v2`) lift the
tap matmuls to dense (M, 128) @ (128, 128) tiles (50% useful MACs) and DO
beat XLA in isolation (2.21 ms vs 2.62 ms at 144x180; 38.2 vs 49.6 ms for
the row-banded form at 540x960) — but wired into the full streaming step
they LOSE (~164 vs ~194 fps at 144x180; ~10.4 vs ~12.0 fps at 540p->2160p,
where XLA's in-scan chain runs ~2x faster than the same chain isolated):
the pair pack/unpack layout transposes and per-frame kernel launches cost
more than the MXU win, and bf16 tap-order drift compounds over 16 blocks.
All variants stay available behind ``TecoConfig.fused_trunk``; none is on
the default path.

Layout: the (H, W, C) activation is stored flat as (P*S, C) where S = W+4
is the row stride (8-aligned; two zero columns each side) and P = H+6
(3 zero rows top and bottom). Dynamic loads happen only at 8-aligned
sublane offsets (a Mosaic requirement); each tile loads one wide aligned
window and derives all nine conv taps from *static* value slices, so SAME
zero-padding falls out of the zero borders. An iota-computed mask re-zeros
the borders after every block.

Grid step r applies residual block r: step 0 reads the packed source from
its own input block, later steps ping-pong between the output buffer and
one scratch buffer. Within a step,
output row-tiles compute conv1 on a 1-row + 1-column halo so conv2 consumes
y entirely from registers — no intermediate activation buffer.

Numerics: taps accumulate via f32 MXU matmuls; the bf16 round happens once
per conv output, matching XLA's conv (bf16 in, f32 accumulate, bf16 out) up
to tap summation order. Backward: ``jax.custom_vjp`` replays the XLA
reference (`resblock_chain_xla`) — training runs at batch >= 4 where XLA
convs are efficient; the fused forward targets streaming inference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAD_ROWS = 3  # zero rows above/below the image (covers conv1+conv2 halos)

#: Experimental: route resblock_chain through the Pallas kernel. Off by
#: default — XLA's conv lowering is faster on v5e (see module docstring).
USE_PALLAS_CHAIN = False


# --------------------------------------------------------------- reference
def resblock_chain_xla(x, w1, b1, w2, b2):
    """XLA oracle: x (B,H,W,C); w1/w2 (N,3,3,C,C); b1/b2 (N,C).

    Per block: ``x = x + (conv(relu(conv(x, w1) + b1), w2) + b2)``
    (reference frvsr.py:49-56 residual_block with biased slim convs).
    """
    n = w1.shape[0]
    for i in range(n):
        y = jax.lax.conv_general_dilated(
            x, w1[i], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jax.nn.relu(y + b1[i])
        z = jax.lax.conv_general_dilated(
            y, w2[i], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = x + z + b2[i]
    return x


# ----------------------------------------------------------------- kernel
def _chain_kernel(w1_ref, b1_ref, w2_ref, b2_ref, x_ref, o_ref, buf_ref, *,
                  h: int, w: int, c: int, tile_rows: int, n_res: int):
    """One grid step = one residual block; step 0 reads from x_ref."""
    r = pl.program_id(0)
    s = w + 4                          # 8-aligned row stride
    assert s % 8 == 0, s
    first = _PAD_ROWS * s              # flat offset of image row 0
    n_tiles = h // tile_rows
    t_m = tile_rows * s                # flat elements per output tile
    y_len = t_m + 2 * s + 2            # conv2 consumes y at offsets 0..2s+2
    v_len = t_m + 4 * s + 16           # aligned window covering all taps
    total = (h + 2 * _PAD_ROWS) * s

    def mask_for(q0, n_rows, dtype):
        q = q0 + jax.lax.broadcasted_iota(jnp.int32, (n_rows, 1), 0)
        col = q % s
        row = q // s
        ok = ((col >= 2) & (col < w + 2)
              & (row >= _PAD_ROWS) & (row < _PAD_ROWS + h))
        return ok.astype(dtype)

    def body(src, dst):
        w1k = w1_ref[0]                      # (9, C, C)
        w2k = w2_ref[0]
        b1k = b1_ref[0].astype(jnp.float32)  # (1, C)
        b2k = b2_ref[0].astype(jnp.float32)

        def tile_step(i, _):
            q_out = first + i * t_m
            q_y = q_out - s - 1              # y block origin
            # One aligned dynamic load; all taps are static value slices.
            v0 = q_out - 2 * s - 8           # aligned window origin
            win = src[pl.ds(v0, v_len), :]
            # conv1 (+bias, relu) over the haloed y block.
            acc = None
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    off = s + 7 + dy * s + dx  # (q_y + dy*s + dx) - v0
                    tap = win[off : off + y_len, :]
                    t = (dy + 1) * 3 + (dx + 1)
                    p = jnp.dot(tap, w1k[t],
                                preferred_element_type=jnp.float32)
                    acc = p if acc is None else acc + p
            y = jnp.maximum(acc + b1k, 0.0) * mask_for(q_y, y_len, jnp.float32)
            y = y.astype(src.dtype)
            # conv2 from registers: out tap (dy, dx) = y[(dy+1)*s + (dx+1) ...].
            acc2 = None
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    off = (dy + 1) * s + (dx + 1)
                    tap = y[off : off + t_m, :]
                    t = (dy + 1) * 3 + (dx + 1)
                    p = jnp.dot(tap, w2k[t],
                                preferred_element_type=jnp.float32)
                    acc2 = p if acc2 is None else acc2 + p
            skip = win[2 * s + 8 : 2 * s + 8 + t_m, :].astype(jnp.float32)
            out = (skip + acc2 + b2k) * mask_for(q_out, t_m, jnp.float32)
            dst[pl.ds(q_out, t_m), :] = out.astype(dst.dtype)
            return 0

        jax.lax.fori_loop(0, n_tiles, tile_step, 0)
        # Keep zero borders in dst.
        dst[pl.ds(0, first), :] = jnp.zeros((first, c), dst.dtype)
        tail = first + h * s
        dst[pl.ds(tail, total - tail), :] = jnp.zeros(
            (total - tail, c), dst.dtype)

    # Ping-pong: step 0 reads the packed source from x_ref, then blocks
    # alternate buf_ref <-> o_ref. After the last block the result must be
    # in o_ref; when n_res is odd the final write lands in buf and is
    # copied. (Reading the source through an input_output_aliases'd OUTPUT
    # block miscompiles under an outer jit — see _paired_kernel.)
    even = r % 2 == 0

    @pl.when(r == 0)
    def _():
        body(x_ref, buf_ref)

    @pl.when(even & (r > 0))
    def _():
        body(o_ref, buf_ref)

    @pl.when(jnp.logical_not(even))
    def _():
        body(buf_ref, o_ref)

    if n_res % 2 == 1:
        @pl.when(r == n_res - 1)
        def _():
            o_ref[:, :] = buf_ref[:, :]


def _pick_tile(h: int) -> int:
    for t in (16, 12, 8, 6, 4, 3, 2, 1):
        if h % t == 0:
            return t
    return 1


@functools.partial(jax.jit, static_argnames=("tile_rows",))
def _fused_chain_single(x, w1t, b1r, w2t, b2r, tile_rows: int):
    """x: (H, W, C) -> (H, W, C); weights pre-reshaped to taps (N,9,C,C).

    Requires (W + 4) % 8 == 0 (aligned row stride); callers fall back to XLA
    otherwise.
    """
    h, w, c = x.shape
    n_res = w1t.shape[0]
    s = w + 4
    flat = jnp.pad(x, ((_PAD_ROWS, _PAD_ROWS), (2, 2), (0, 0)))
    m = (h + 2 * _PAD_ROWS) * s
    flat = flat.reshape(m, c)

    kernel = functools.partial(
        _chain_kernel, h=h, w=w, c=c, tile_rows=tile_rows, n_res=n_res)
    out = pl.pallas_call(
        kernel,
        grid=(n_res,),
        in_specs=[
            pl.BlockSpec((1, 9, c, c), lambda r: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, c, c), lambda r: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, c), lambda r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, c), lambda r: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((m, c), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(w1t, b1r, w2t, b2r, flat)
    return out.reshape(h + 2 * _PAD_ROWS, s, c)[
        _PAD_ROWS : _PAD_ROWS + h, 2 : 2 + w, :]


def _use_pallas() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@jax.custom_vjp
def resblock_chain(x, w1, b1, w2, b2):
    """Fused residual-block chain over (B, H, W, C); Pallas forward on TPU,
    XLA elsewhere; XLA-replay backward."""
    return _resblock_chain_fwd(x, w1, b1, w2, b2)[0]


def _taps(w1, b1, w2, b2):
    n, _, _, c, _ = w1.shape
    return (w1.reshape(n, 9, c, c), b1.reshape(n, 1, c),
            w2.reshape(n, 9, c, c), b2.reshape(n, 1, c))


def _resblock_chain_fwd(x, w1, b1, w2, b2):
    if USE_PALLAS_CHAIN and _use_pallas() and (x.shape[2] + 4) % 8 == 0:
        w1t, b1r, w2t, b2r = _taps(w1, b1, w2, b2)
        outs = [
            _fused_chain_single(x[i], w1t, b1r, w2t, b2r,
                                tile_rows=_pick_tile(x.shape[1]))
            for i in range(x.shape[0])
        ]
        out = jnp.stack(outs, 0)
    else:
        out = resblock_chain_xla(x, w1, b1, w2, b2)
    return out, (x, w1, b1, w2, b2)


def _resblock_chain_bwd(res, g):
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(resblock_chain_xla, x, w1, b1, w2, b2)
    return vjp(g)


resblock_chain.defvjp(_resblock_chain_fwd, _resblock_chain_bwd)


# ------------------------------------------------- pair-packed variant
# Two adjacent pixels share one 128-lane row ([a(64) | b(64)]), so every tap
# matmul is (M, 128) @ (128, 128) — a dense MXU tile instead of the 25%-
# utilized (M, 64) @ (64, 64) of the flat variant. The 3x3 conv becomes, per
# row offset dy, three pair-matmuls against block-structured weights:
#   out_pair[k] = pair[k-1] @ A_dy + pair[k] @ B_dy + pair[k+1] @ C_dy
#   A_dy[64:, :64] = w(dy,-1)                 (b_{k-1} -> a)
#   B_dy = [[w(dy,0), w(dy,-1)], [w(dy,+1), w(dy,0)]]
#   C_dy[:64, 64:] = w(dy,+1)                 (a_{k+1} -> b)
# Useful-MAC fraction is 50% of a fully dense MXU pass = 2x the flat form.

_PAIR_PAD_COLS = 2  # zero image columns on the left (cols 0-1 = pad pair)


def _pack_pair_weights(w_taps: jnp.ndarray) -> jnp.ndarray:
    """(9, C, C) tap weights -> (9, 2C, 2C) pair matmul matrices.

    Output index t = dy*3 + j with j in {0: A (pair k-1), 1: B (pair k),
    2: C (pair k+1)}.
    """
    c = w_taps.shape[-1]
    out = jnp.zeros((9, 2 * c, 2 * c), w_taps.dtype)
    for dy in range(3):
        w_m = w_taps[dy * 3 + 0]   # dx = -1
        w_0 = w_taps[dy * 3 + 1]   # dx = 0
        w_p = w_taps[dy * 3 + 2]   # dx = +1
        out = out.at[dy * 3 + 0, c:, :c].set(w_m)
        out = out.at[dy * 3 + 1, :c, :c].set(w_0)
        out = out.at[dy * 3 + 1, :c, c:].set(w_m)
        out = out.at[dy * 3 + 1, c:, :c].set(w_p)
        out = out.at[dy * 3 + 1, c:, c:].set(w_0)
        out = out.at[dy * 3 + 2, :c, c:].set(w_p)
    return out


def _paired_kernel(w1_ref, b1_ref, w2_ref, b2_ref, x_ref, o_ref, buf_ref, *,
                   h: int, w: int, c: int, s_cols: int, tile_rows: int,
                   n_res: int):
    """Pair-packed chain: activations (M2, 2C), pairs per row s2 = s_cols/2."""
    r = pl.program_id(0)
    s2 = s_cols // 2
    first = _PAD_ROWS * s2
    n_tiles = h // tile_rows
    t_m = tile_rows * s2
    y_len = t_m + 2 * s2 + 2
    v_len = t_m + 4 * s2 + 16
    total = (h + 2 * _PAD_ROWS) * s2
    img_pairs = w // 2  # image pairs per row, starting at pair index 1

    def mask_for(q0, n_rows, dtype):
        q = q0 + jax.lax.broadcasted_iota(jnp.int32, (n_rows, 1), 0)
        col = q % s2
        row = q // s2
        ok = ((col >= 1) & (col < 1 + img_pairs)
              & (row >= _PAD_ROWS) & (row < _PAD_ROWS + h))
        return ok.astype(dtype)

    def body(src, dst):
        w1k = w1_ref[0]                      # (9, 2C, 2C)
        w2k = w2_ref[0]
        b1k = b1_ref[0].astype(jnp.float32)  # (1, 2C)
        b2k = b2_ref[0].astype(jnp.float32)

        def tile_step(i, _):
            q_out = first + i * t_m
            q_y = q_out - s2 - 1
            v0 = q_out - 2 * s2 - 8
            win = src[pl.ds(v0, v_len), :]

            def conv(block, wk, base_off):
                acc = None
                for dy in (-1, 0, 1):
                    for j in (-1, 0, 1):
                        off = base_off + dy * s2 + j
                        tap = block[off : off + (y_len if wk is w1k else t_m), :]
                        t = (dy + 1) * 3 + (j + 1)
                        p = jnp.dot(tap, wk[t],
                                    preferred_element_type=jnp.float32)
                        acc = p if acc is None else acc + p
                return acc

            y = conv(win, w1k, s2 + 7)  # (q_y + dy*s2 + j) - v0
            y = jnp.maximum(y + b1k, 0.0) * mask_for(q_y, y_len, jnp.float32)
            y = y.astype(src.dtype)
            acc2 = conv(y, w2k, s2 + 1)  # (q_out + dy*s2 + j) - q_y
            skip = win[2 * s2 + 8 : 2 * s2 + 8 + t_m, :].astype(jnp.float32)
            out = (skip + acc2 + b2k) * mask_for(q_out, t_m, jnp.float32)
            dst[pl.ds(q_out, t_m), :] = out.astype(dst.dtype)
            return 0

        jax.lax.fori_loop(0, n_tiles, tile_step, 0)
        dst[pl.ds(0, first), :] = jnp.zeros((first, 2 * c), dst.dtype)
        tail = first + h * s2
        dst[pl.ds(tail, total - tail), :] = jnp.zeros(
            (total - tail, 2 * c), dst.dtype)

    # Step 0 reads the packed source from x_ref (its own input block); later
    # steps ping-pong buf_ref <-> o_ref. Reading the source through an
    # input_output_aliases'd OUTPUT block (the previous scheme) miscompiles
    # under an outer jit at large sizes: XLA may assign the aliased operand
    # and the output different physical tilings (observed bf16[...]{1,0} vs
    # {1,0:T(8,128)(2,1)} at 540x960), so the kernel read a wrongly-tiled
    # buffer -> ~27% NaNs. Explicit x_ref reads are layout-safe.
    even = r % 2 == 0

    @pl.when(r == 0)
    def _():
        body(x_ref, buf_ref)

    @pl.when(even & (r > 0))
    def _():
        body(o_ref, buf_ref)

    @pl.when(jnp.logical_not(even))
    def _():
        body(buf_ref, o_ref)

    if n_res % 2 == 1:
        @pl.when(r == n_res - 1)
        def _():
            o_ref[:, :] = buf_ref[:, :]


@functools.partial(jax.jit, static_argnames=("tile_rows",))
def _fused_chain_single_paired(x, w1p, b1p, w2p, b2p, tile_rows: int):
    """Pair-packed chain for one (H, W, C) image; W even.

    Row stride: image cols sit at [2, 2+W) inside s_cols total columns where
    s_cols = W + 4 rounded up so that s_cols/2 is a multiple of 8.
    """
    h, w, c = x.shape
    n_res = w1p.shape[0]
    s_cols = w + 4
    if (s_cols // 2) % 8 != 0:
        s_cols = w + 4 + (16 - (w + 4) % 16) % 16
    pad_right = s_cols - w - 2
    xp = jnp.pad(x, ((_PAD_ROWS, _PAD_ROWS), (2, pad_right), (0, 0)))
    p_rows = h + 2 * _PAD_ROWS
    # (P, S, C) -> pair-packed (P * S/2, 2C)
    flat = xp.reshape(p_rows, s_cols // 2, 2 * c).reshape(
        p_rows * (s_cols // 2), 2 * c)

    kernel = functools.partial(
        _paired_kernel, h=h, w=w, c=c, s_cols=s_cols, tile_rows=tile_rows,
        n_res=n_res)
    m2 = flat.shape[0]
    out = pl.pallas_call(
        kernel,
        grid=(n_res,),
        in_specs=[
            pl.BlockSpec((1, 9, 2 * c, 2 * c), lambda r: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * c), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, 2 * c, 2 * c), lambda r: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * c), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m2, 2 * c), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m2, 2 * c), lambda r: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m2, 2 * c), x.dtype),
        scratch_shapes=[pltpu.VMEM((m2, 2 * c), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(w1p, b1p, w2p, b2p, flat)
    out = out.reshape(p_rows, s_cols, c)
    return out[_PAD_ROWS : _PAD_ROWS + h, 2 : 2 + w, :]


def _pair_taps(w1, b1, w2, b2):
    """(N,3,3,C,C)/(N,C) -> pair-packed (N,9,2C,2C)/(N,1,2C)."""
    n, _, _, c, _ = w1.shape
    w1t = w1.reshape(n, 9, c, c)
    w2t = w2.reshape(n, 9, c, c)
    w1p = jnp.stack([_pack_pair_weights(w1t[i]) for i in range(n)])
    w2p = jnp.stack([_pack_pair_weights(w2t[i]) for i in range(n)])
    b1p = jnp.concatenate([b1, b1], axis=-1).reshape(n, 1, 2 * c)
    b2p = jnp.concatenate([b2, b2], axis=-1).reshape(n, 1, 2 * c)
    return w1p, b1p, w2p, b2p


def resblock_chain_paired(x, w1, b1, w2, b2):
    """Pair-packed fused chain over (B, H, W, C); forward only (use
    :func:`resblock_chain` + custom VJP wiring for training)."""
    w1p, b1p, w2p, b2p = _pair_taps(w1, b1, w2, b2)
    outs = [
        _fused_chain_single_paired(x[i], w1p, b1p, w2p, b2p,
                                   tile_rows=_pick_tile(x.shape[1]))
        for i in range(x.shape[0])
    ]
    return jnp.stack(outs, 0)


def _paired_kernel_v2(w1_ref, b1_ref, w2_ref, b2_ref, x_ref, o_ref,
                      buf_ref, sl_ref, sr_ref, *,
                      h: int, w: int, c: int, s_cols: int, tile_rows: int,
                      n_res: int):
    """Pair-packed chain v2: per block, build whole-buffer +-1-pair shifted
    copies of the source (two static-slice copies) so all conv1 taps load
    ALIGNED — the per-tap sublane relayouts of v1 were the bottleneck."""
    r = pl.program_id(0)
    s2 = s_cols // 2
    first = _PAD_ROWS * s2
    n_tiles = h // tile_rows
    t_m = tile_rows * s2
    # y block starts ALIGNED at q_out - s2 - 8; conv2 reads y at offsets
    # (s2 + 8 + dy*s2 + j) + [0, t_m), so it must extend to t_m + 2*s2 + 16.
    y_len = t_m + 2 * s2 + 16
    # One extra bottom pad row: the last tile's deepest tap reaches
    # first + h*s2 + 3*s2 + 8, which is 8 past symmetric 3-row padding.
    total = (h + 2 * _PAD_ROWS + 1) * s2
    img_pairs = w // 2

    def mask_for(q0, n_rows, dtype):
        q = q0 + jax.lax.broadcasted_iota(jnp.int32, (n_rows, 1), 0)
        col = q % s2
        row = q // s2
        ok = ((col >= 1) & (col < 1 + img_pairs)
              & (row >= _PAD_ROWS) & (row < _PAD_ROWS + h))
        return ok.astype(dtype)

    def body(src, dst):
        # Whole-buffer shifted copies: sl[q] = src[q+1], sr[q] = src[q-1].
        sl_ref[0 : total - 8, :] = src[8 - 7 : total - 7, :]
        sl_ref[total - 8 : total, :] = jnp.zeros((8, 2 * c), src.dtype)
        sr_ref[8:total, :] = src[7 : total - 1, :]
        sr_ref[0:8, :] = jnp.zeros((8, 2 * c), src.dtype)

        w1k = w1_ref[0]
        w2k = w2_ref[0]
        b1k = b1_ref[0].astype(jnp.float32)
        b2k = b2_ref[0].astype(jnp.float32)

        def tile_step(i, _):
            q_out = first + i * t_m
            q_y = q_out - s2 - 8          # ALIGNED y-block origin
            acc = None
            for dy in (-1, 0, 1):
                for j, buf in ((-1, sr_ref), (0, src), (1, sl_ref)):
                    # buf[q] == src[q + j]; want src[q_y + k + dy*s2 + j]
                    tap = buf[pl.ds(q_y + dy * s2, y_len), :]
                    t = (dy + 1) * 3 + (j + 1)
                    p = jnp.dot(tap, w1k[t],
                                preferred_element_type=jnp.float32)
                    acc = p if acc is None else acc + p
            y = jnp.maximum(acc + b1k, 0.0) * mask_for(q_y, y_len, jnp.float32)
            y = y.astype(src.dtype)
            acc2 = None
            for dy in (-1, 0, 1):
                for j in (-1, 0, 1):
                    off = s2 + 8 + dy * s2 + j  # (q_out + dy*s2 + j) - q_y
                    tap = y[off : off + t_m, :]
                    t = (dy + 1) * 3 + (j + 1)
                    p = jnp.dot(tap, w2k[t],
                                preferred_element_type=jnp.float32)
                    acc2 = p if acc2 is None else acc2 + p
            skip = src[pl.ds(q_out, t_m), :].astype(jnp.float32)
            out = (skip + acc2 + b2k) * mask_for(q_out, t_m, jnp.float32)
            dst[pl.ds(q_out, t_m), :] = out.astype(dst.dtype)
            return 0

        jax.lax.fori_loop(0, n_tiles, tile_step, 0)
        dst[pl.ds(0, first), :] = jnp.zeros((first, 2 * c), dst.dtype)
        tail = first + h * s2
        dst[pl.ds(tail, total - tail), :] = jnp.zeros(
            (total - tail, 2 * c), dst.dtype)

    # Step 0 reads from x_ref (layout-safe; see _paired_kernel).
    even = r % 2 == 0

    @pl.when(r == 0)
    def _():
        body(x_ref, buf_ref)

    @pl.when(even & (r > 0))
    def _():
        body(o_ref, buf_ref)

    @pl.when(jnp.logical_not(even))
    def _():
        body(buf_ref, o_ref)

    if n_res % 2 == 1:
        @pl.when(r == n_res - 1)
        def _():
            o_ref[:, :] = buf_ref[:, :]


@functools.partial(jax.jit, static_argnames=("tile_rows",))
def _fused_chain_single_paired_v2(x, w1p, b1p, w2p, b2p, tile_rows: int):
    h, w, c = x.shape
    n_res = w1p.shape[0]
    s_cols = w + 4
    if (s_cols // 2) % 8 != 0:
        s_cols = w + 4 + (16 - (w + 4) % 16) % 16
    pad_right = s_cols - w - 2
    xp = jnp.pad(x, ((_PAD_ROWS, _PAD_ROWS + 1), (2, pad_right), (0, 0)))
    p_rows = h + 2 * _PAD_ROWS + 1
    flat = xp.reshape(p_rows, s_cols // 2, 2 * c).reshape(
        p_rows * (s_cols // 2), 2 * c)
    m2 = flat.shape[0]

    kernel = functools.partial(
        _paired_kernel_v2, h=h, w=w, c=c, s_cols=s_cols,
        tile_rows=tile_rows, n_res=n_res)
    out = pl.pallas_call(
        kernel,
        grid=(n_res,),
        in_specs=[
            pl.BlockSpec((1, 9, 2 * c, 2 * c), lambda r: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * c), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, 2 * c, 2 * c), lambda r: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * c), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m2, 2 * c), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m2, 2 * c), lambda r: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m2, 2 * c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((m2, 2 * c), x.dtype),
            pltpu.VMEM((m2, 2 * c), x.dtype),
            pltpu.VMEM((m2, 2 * c), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(w1p, b1p, w2p, b2p, flat)
    out = out.reshape(p_rows, s_cols, c)
    return out[_PAD_ROWS : _PAD_ROWS + h, 2 : 2 + w, :]


def resblock_chain_paired_v2(x, w1, b1, w2, b2):
    """Pair-packed fused chain with aligned tap loads (see v2 kernel)."""
    w1p, b1p, w2p, b2p = _pair_taps(w1, b1, w2, b2)
    outs = [
        _fused_chain_single_paired_v2(x[i], w1p, b1p, w2p, b2p,
                                      tile_rows=_pick_tile(x.shape[1]))
        for i in range(x.shape[0])
    ]
    return jnp.stack(outs, 0)


def resblock_chain_paired_v1_auto(x, w1, b1, w2, b2):
    """Pair-packed chain on TPU (even W), XLA oracle elsewhere."""
    if _use_pallas() and x.shape[2] % 2 == 0:
        return resblock_chain_paired(x, w1, b1, w2, b2)
    return resblock_chain_xla(x, w1, b1, w2, b2)


# VMEM the paired kernel may claim for its three (M2, 2C) activation
# buffers (input + output + ping-pong scratch), inside the kernel's 100 MB
# scoped limit with headroom for double-buffered weight blocks.
_PAIRED_VMEM_BUDGET = 88 * 1024 * 1024


def _paired_row_pairs(w: int) -> int:
    s_cols = w + 4
    if (s_cols // 2) % 8 != 0:
        s_cols = w + 4 + (16 - (w + 4) % 16) % 16
    return s_cols // 2


def resblock_chain_paired_auto(x, w1, b1, w2, b2, chunk: int = 4):
    """Pair-packed chain with automatic whole-image / banded dispatch.

    TPU + even width: run the whole image in VMEM when its three activation
    buffers fit the budget, else band the frame (near-equal bands sized to
    fit, sub-chains of ``chunk`` blocks -> 2*chunk+1-row halos). Measured on
    v5e bf16: 2.21 vs 2.62 ms at 144x180 (whole), 38.2 vs 49.6 ms at
    540x960 (banded 180/4) against XLA's conv chain. Elsewhere: XLA oracle.
    """
    if not _use_pallas() or x.shape[2] % 2:
        return resblock_chain_xla(x, w1, b1, w2, b2)
    _, h, w, c = x.shape
    esize = jnp.dtype(x.dtype).itemsize
    row_bytes = 3 * _paired_row_pairs(w) * 2 * c * esize
    if (h + 2 * _PAD_ROWS) * row_bytes <= _PAIRED_VMEM_BUDGET:
        return resblock_chain_paired(x, w1, b1, w2, b2)
    halo = 2 * chunk + 1
    max_band = (_PAIRED_VMEM_BUDGET // row_bytes) - 2 * _PAD_ROWS - 2 * halo
    if max_band < 64:
        return resblock_chain_xla(x, w1, b1, w2, b2)
    n_bands = -(-h // max_band)
    band = -(-h // n_bands)
    return resblock_chain_paired_banded(
        x, w1, b1, w2, b2, band_rows=band, chunk=chunk)


# ------------------------------------------------------------ banded chain
def resblock_chain_paired_banded(
    x,
    w1,
    b1,
    w2,
    b2,
    band_rows: int = 270,
    chunk: int = 0,
    use_v2: bool = False,
):
    """Pair-packed fused chain on frames too tall for whole-image VMEM
    residency (e.g. the 540x960 trunk of 2160p streaming).

    The whole-image kernels above keep 3 (v1) or 5 (v2) full activation
    buffers in VMEM — 67 MB each at 540x960x64 bf16, far over budget. This
    wrapper runs the chain in row BANDS at the JAX level: each band is
    sliced with a halo of ``2*chunk + 1`` rows (one conv corrupts one row
    inward from a band edge, so after a 2*chunk-conv sub-chain the kept
    interior is exact — the kernel's own zero-pad/mask only ever touches
    discarded halo rows), runs the existing kernel unchanged, and the clean
    interiors are stitched. ``chunk`` < n splits the chain into sequential
    sub-chains to shrink the halo (cheaper recompute) at the cost of HBM
    round-trips between chunks.

    Identical math to :func:`resblock_chain_xla` up to bf16 tap-summation
    order (golden-tested in tests/test_kernels.py).
    """
    bsz, h, w, c = x.shape
    n = w1.shape[0]
    chunk = chunk or n
    single = _fused_chain_single_paired_v2 if use_v2 else _fused_chain_single_paired

    for r0 in range(0, n, chunk):
        k = min(chunk, n - r0)
        halo = 2 * k + 1
        taps = _pair_taps(w1[r0:r0 + k], b1[r0:r0 + k],
                          w2[r0:r0 + k], b2[r0:r0 + k])
        outs = []
        for i in range(bsz):
            if h <= band_rows + 2 * halo:
                outs.append(single(x[i], *taps, tile_rows=_pick_tile(h)))
                continue
            pieces = []
            for a in range(0, h, band_rows):
                rows = min(band_rows, h - a)
                lo = max(0, a - halo)
                hi = min(h, a + rows + halo)
                band = jax.lax.slice_in_dim(x[i], lo, hi, axis=0)
                out = single(band, *taps, tile_rows=_pick_tile(hi - lo))
                pieces.append(
                    jax.lax.slice_in_dim(out, a - lo, a - lo + rows, axis=0))
            outs.append(jnp.concatenate(pieces, axis=0))
        x = jnp.stack(outs, 0)
    return x
