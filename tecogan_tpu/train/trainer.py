"""FRVSR / TecoGAN trainer.

Reproduces the reference training graph (lib/Teco.py:77-517) as a single
jitted train step:

- batched fnet over all adjacent pairs + scan-unrolled recurrent generator
- losses: content L2, fnet warp L2, VGG cosine, ping-pong L1, adversarial,
  discriminator feature-layer L1s
- three Adam optimizers (G, FNet, Dst) on an exponential-decay schedule
- **adaptive discriminator balancing** (reference Teco.py:455-496): the Dst
  update is applied only while ``EMA(t_balance) < Dbalance``; G/FNet update
  every step. In the reference this is a ``tf.cond`` running different
  optimizer subgraphs; here the D gradients are computed unconditionally
  (cheap relative to G) and the D param/opt-state update is masked — branch-
  free, so the whole step stays one fused XLA program.
- EMA (0.99) telemetry over every loss scalar (reference Teco.py:415-435)

Gradient routing parity (reference Teco.py:437-496): G receives d(gen_loss),
FNet receives d(warp_scaling*warp_loss + gen_loss) — one joint backward,
since warp_loss has no G dependency — and Dst receives d(discrim_loss) only
(adversarial/layer losses reach G through a D forward whose parameters are
treated as constants).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from tecogan_tpu.config import TecoConfig
from tecogan_tpu.models import Discriminator, FNet, Generator, VGG19Features
from tecogan_tpu.models.vgg19 import DEFAULT_FEATURE_KEYS, vgg19_normalized_features
from tecogan_tpu.ops import gauss_down_by4, preprocess
from tecogan_tpu.recurrent.step import (
    extend_pingpong,
    flows_for_sequence,
    unroll_generator,
    upscale_flow,
)
from tecogan_tpu.train import losses as L


_REMAT_BUDGET_BYTES = 4 << 30  # unrolled-activation size above which "auto" remats


def resolve_remat(config: TecoConfig) -> bool:
    """True/False pass through; "auto" remats only when the scan-unrolled
    generator activations would stress HBM (reference config: ~1.5 GB ->
    no remat, 8% faster; crop 128 would be ~24 GB -> remat)."""
    if config.remat_generator != "auto":
        return bool(config.remat_generator)
    px = config.crop_size ** 2 * config.batch_size * config.unroll_frames
    layers = 2 * config.num_resblock + 2  # LR trunk activations
    upsample = 2 * (4 + 16)               # 2x/4x stages (relu'd convT pairs)
    est = px * config.gen_channels * (layers + upsample) * 2  # bf16
    return est > _REMAT_BUDGET_BYTES


def lr_schedule(config: TecoConfig):
    """tf.train.exponential_decay parity (reference Teco.py:97-98)."""
    return optax.exponential_decay(
        init_value=config.learning_rate,
        transition_steps=config.decay_step,
        decay_rate=config.decay_rate,
        staircase=config.stair,
    )


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    gen_params: Any
    fnet_params: Any
    gen_opt: Any
    fnet_opt: Any
    # GAN-only fields (None in FRVSR mode)
    d_params: Any = None
    d_batch_stats: Any = None
    d_opt: Any = None
    ema_tbalance: jnp.ndarray = None
    counter_with_d: jnp.ndarray = None
    counter_wo_d: jnp.ndarray = None
    # telemetry: EMA of every loss scalar
    ema_losses: Dict[str, jnp.ndarray] = flax.struct.field(default_factory=dict)


def prepare_batch(
    hr_seq: jnp.ndarray, config: TecoConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device-side batch prep (reference dataloader.py:306-332).

    Args:
      hr_seq: (B, T, tar, tar, 3) HR crops in [0, 1] where
        tar = 4*crop + 2*gauss_border.

    Returns:
      r_inputs (B, T, crop, crop, 3) in [0, 1] — gaussian down-4 of HR;
      r_targets (B, T, 4*crop, 4*crop, 3) in [-1, 1] — center crop minus the
        gaussian margin, preprocessed.
    """
    if hr_seq.dtype == jnp.uint8:
        # Cheap-upload batches (config.train_upload_uint8): uint8 crops
        # normalized here on device. XLA lowers /255 to a reciprocal
        # multiply — 1 ulp vs the host division it replaces.
        hr_seq = hr_seq.astype(jnp.float32) / 255.0
    b, t, tar, _, c = hr_seq.shape
    k = config.gauss_border
    hr_flat = hr_seq.reshape(b * t, tar, tar, c)
    lr = gauss_down_by4(hr_flat, config.gaussian_sigma)
    crop = lr.shape[1]
    targets = hr_flat[:, k : k + 4 * crop, k : k + 4 * crop, :]
    return (
        lr.reshape(b, t, crop, crop, c),
        preprocess(targets).reshape(b, t, 4 * crop, 4 * crop, c),
    )


def _tree_where(pred, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


class Trainer:
    """Owns model/optimizer definitions and the jitted train/eval steps."""

    def __init__(self, config: TecoConfig, vgg_params=None):
        self.config = config
        dtype = jnp.dtype(config.compute_dtype)
        self.generator = Generator(
            num_resblock=config.num_resblock, channels=config.gen_channels, dtype=dtype
        )
        self.fnet = FNet(
            channels=config.fnet_channels,
            up_channels=config.fnet_up_channels,
            max_velocity=config.flow_max_velocity,
            dtype=dtype,
        )
        self.use_vgg = config.vgg_scaling > 0.0
        if self.use_vgg and vgg_params is None:
            raise ValueError(
                "vgg_scaling > 0 requires VGG19 weights "
                "(see tecogan_tpu.models.vgg19.load_vgg19_npz)"
            )
        self.vgg_params = vgg_params
        self.vgg = VGG19Features(dtype=dtype) if self.use_vgg else None
        if config.gan and not config.dt_mergeDs and config.d_layerloss:
            # The reference's own pure-Dt branch never defines real_layers,
            # so D_LAYERLOSS there is a NameError (Teco.py:265-266,288-292);
            # the combination has no defined semantics to reproduce.
            raise ValueError(
                "dt_mergeDs=False (pure temporal Dt) requires "
                "d_layerloss=False (reference Teco.py:265-292 defines no "
                "layer features on this branch)"
            )
        self.discriminator = Discriminator(dtype=dtype) if config.gan else None

        schedule = lr_schedule(config)
        self._schedule = schedule
        adam = lambda s: optax.adam(s, b1=config.beta1, eps=config.adam_eps)
        self.gen_tx = adam(schedule)
        self.fnet_tx = adam(schedule)
        if config.gan:
            d_sched = (
                schedule
                if config.dt_mergeDs
                else lambda step: schedule(step) * 0.3  # Teco.py:423-424
            )
            self.d_tx = adam(d_sched)

        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_step_impl)

    # ------------------------------------------------------------ state init
    def init_state(self, rng: jax.Array) -> TrainState:
        cfg = self.config
        h = w = cfg.crop_size
        k_gen, k_fnet, k_d = jax.random.split(rng, 3)
        gen_params = self.generator.init(k_gen, jnp.zeros((1, h, w, 51)))["params"]
        fnet_params = self.fnet.init(k_fnet, jnp.zeros((1, h, w, 6)))["params"]
        state = dict(
            step=jnp.zeros((), jnp.int32),
            gen_params=gen_params,
            fnet_params=fnet_params,
            gen_opt=self.gen_tx.init(gen_params),
            fnet_opt=self.fnet_tx.init(fnet_params),
            ema_losses={
                k: jnp.zeros(()) for k in self._telemetry_keys()
            },
        )
        if cfg.gan:
            if cfg.dt_mergeDs:
                d_ch, d_hw = 27, 4 * h
            else:
                # Pure Dt sees the cropped (not re-padded) 9ch warped triplet
                # (reference Teco.py:230-231,265-266).
                d_ch = 9
                crop = int(4 * h * cfg.crop_dt)
                off = (4 * h - crop) // 2
                d_hw = 4 * h - 2 * off
            d_vars = self.discriminator.init(
                k_d, jnp.zeros((1, d_hw, d_hw, d_ch))
            )
            state.update(
                d_params=d_vars["params"],
                d_batch_stats=d_vars["batch_stats"],
                d_opt=self.d_tx.init(d_vars["params"]),
                ema_tbalance=jnp.zeros(()),
                counter_with_d=jnp.zeros((), jnp.int32),
                counter_wo_d=jnp.zeros((), jnp.int32),
            )
        return TrainState(**state)

    def _telemetry_keys(self):
        cfg = self.config
        keys = ["l2_content_loss", "l2_warp_loss", "All_loss_Gen"]
        if self.use_vgg:
            keys += [f"vgg_loss_{i+2}" for i in range(len(DEFAULT_FEATURE_KEYS))]
            keys += ["vgg_all"]
        if cfg.pingpong:
            keys += ["PingPang"]
        if cfg.gan:
            keys += [
                "t_adversarial_loss",
                "t_discrim_loss",
                "t_discrim_real_output",
                "t_discrim_fake_output",
                "Dst_ratio",  # EMA'd like the reference update_list_avg
            ]
            if cfg.d_layerloss:
                keys += [f"D_layer_{i}_loss" for i in range(4)]
                keys += ["D_layer_loss_sum"]
        return keys

    # --------------------------------------------------------------- losses
    def _forward_losses(
        self, gen_params, fnet_params, d_params, d_batch_stats, r_inputs, r_targets, step
    ):
        """Compute gen_loss/fnet_loss and everything needed downstream.

        ``d_params`` enter as constants here (no gradient is taken w.r.t.
        them through this function); the D-side loss runs separately.
        """
        cfg = self.config
        metrics: Dict[str, jnp.ndarray] = {}

        flow_lr, flow_hr = flows_for_sequence(self.fnet.apply, fnet_params, r_inputs)
        gen_outputs, _ = unroll_generator(
            self.generator.apply, gen_params, r_inputs, flow_hr,
            remat=resolve_remat(cfg),
            # The loss path never reads warppre (GIF summaries recompute it,
            # make_summary_outputs below) — don't compute/stack it in-scan.
            with_warppre=False,
            fold_input=cfg.train_fold_s2d,
            num_resblock=cfg.num_resblock,
        )

        b, t = gen_outputs.shape[0], gen_outputs.shape[1]
        hr_hw = gen_outputs.shape[2:4]
        s_gen = gen_outputs.reshape(b * t, *hr_hw, 3)
        s_tar = r_targets.reshape(b * t, *hr_hw, 3)

        c_loss = L.content_loss(s_gen, s_tar)
        w_loss = L.warp_loss(r_inputs, flow_lr)
        metrics["l2_content_loss"] = c_loss
        metrics["l2_warp_loss"] = w_loss
        gen_loss = c_loss

        if self.use_vgg:
            gf = vgg19_normalized_features(self.vgg.apply, self.vgg_params, s_gen)
            tf_ = vgg19_normalized_features(self.vgg.apply, self.vgg_params, s_tar)
            vgg_total, per_layer = L.vgg_cosine_loss(gf, tf_)
            gen_loss = gen_loss + cfg.vgg_scaling * vgg_total
            for i, v in enumerate(per_layer):
                metrics[f"vgg_loss_{i+2}"] = v
            metrics["vgg_all"] = vgg_total

        if cfg.pingpong:
            pp = L.pingpong_loss(gen_outputs, cfg.rnn_n)
            if cfg.pp_scaling > 0:
                gen_loss = gen_loss + cfg.pp_scaling * pp
            metrics["PingPang"] = pp

        aux = dict(t_balance=None, real27=None, fake27=None)
        if cfg.gan:
            flow_back = None
            if not cfg.pingpong:
                # Backward flows for the D triplets (reference Teco.py:190-203).
                t_size = 3 * (t // 3)
                nxt = r_inputs[:, 2:t_size:3]
                mid = r_inputs[:, 1:t_size:3]
                bb, tt, h, w, c = nxt.shape
                fin = jnp.concatenate([nxt, mid], axis=-1).reshape(bb * tt, h, w, 2 * c)
                fl = self.fnet.apply({"params": fnet_params}, fin)
                flow_back = upscale_flow(fl, h, w).reshape(bb, tt, 4 * h, 4 * w, 2)

            real27, fake27 = L.assemble_dst_inputs(
                r_inputs, r_targets, gen_outputs, flow_hr, cfg, flow_back
            )
            d_vars = {"params": d_params, "batch_stats": d_batch_stats}
            (d_real, real_layers), _ = self.discriminator.apply(
                d_vars, real27, mutable=["batch_stats"]
            )
            (d_fake, fake_layers), _ = self.discriminator.apply(
                d_vars, fake27, mutable=["batch_stats"]
            )

            # f32 log terms: D outputs may be bf16 (compute_dtype), where
            # eps=1e-12 underflows and log loses the gradient signal.
            d_real = d_real.astype(jnp.float32)
            d_fake = d_fake.astype(jnp.float32)
            adv = jnp.mean(-jnp.log(d_fake + cfg.eps))
            dt_ratio = jnp.minimum(
                cfg.dt_ratio_max, cfg.dt_ratio_0 + cfg.dt_ratio_add * step.astype(jnp.float32)
            )
            gen_loss = gen_loss + cfg.ratio * adv * dt_ratio
            metrics["t_adversarial_loss"] = adv
            metrics["Dst_ratio"] = dt_ratio  # reference Teco.py:451-452
            metrics["t_discrim_real_output"] = jnp.mean(d_real)
            metrics["t_discrim_fake_output"] = jnp.mean(d_fake)

            if cfg.d_layerloss:
                layer_sum, raw = L.d_layer_losses(
                    real_layers, fake_layers, cfg.d_layer_norm, cfg.d_layer_fix_range
                )
                gen_loss = gen_loss + layer_sum * dt_ratio
                for i, v in enumerate(raw):
                    metrics[f"D_layer_{i}_loss"] = v
                metrics["D_layer_loss_sum"] = layer_sum

            # t_balance drives the adaptive D gate (reference Teco.py:397-399).
            aux["t_balance"] = jnp.mean(jnp.log(d_real + cfg.eps)) + adv
            aux["real27"] = real27
            aux["fake27"] = fake27
            metrics["t_discrim_loss"] = jnp.mean(
                -(jnp.log(1 - d_fake + cfg.eps) + jnp.log(d_real + cfg.eps))
            )

        metrics["All_loss_Gen"] = gen_loss
        fnet_loss = cfg.warp_scaling * w_loss + gen_loss  # Teco.py:443
        return gen_loss, fnet_loss, metrics, aux

    def _d_loss_fn(self, d_params, d_batch_stats, real27, fake27):
        """Discriminator loss + batch-stat updates (reference Teco.py:392-412).

        Inputs arrive stop-gradiented; moving stats update on real then fake
        (reference updates via UPDATE_OPS before the optimizer cond,
        Teco.py:454-455).
        """
        cfg = self.config
        d_vars = {"params": d_params, "batch_stats": d_batch_stats}
        (d_real, _), vars1 = self.discriminator.apply(
            d_vars, real27, mutable=["batch_stats"]
        )
        (d_fake, _), vars2 = self.discriminator.apply(
            {"params": d_params, "batch_stats": vars1["batch_stats"]},
            fake27,
            mutable=["batch_stats"],
        )
        d_real = d_real.astype(jnp.float32)
        d_fake = d_fake.astype(jnp.float32)
        d_loss = jnp.mean(
            -(jnp.log(1 - d_fake + cfg.eps) + jnp.log(d_real + cfg.eps))
        )
        return d_loss, vars2["batch_stats"]

    # ----------------------------------------------------------- train step
    def _train_step_impl(self, state: TrainState, hr_seq: jnp.ndarray):
        cfg = self.config
        r_inputs, r_targets = prepare_batch(hr_seq, cfg)
        if cfg.pingpong:
            r_inputs = extend_pingpong(r_inputs)
            r_targets = extend_pingpong(r_targets)

        def loss_gf(gen_params, fnet_params):
            gen_loss, fnet_loss, metrics, aux = self._forward_losses(
                gen_params, fnet_params, state.d_params, state.d_batch_stats,
                r_inputs, r_targets, state.step,
            )
            # One joint backward: d(gen_loss)/dG + d(fnet_loss)/dF, valid
            # because warp_loss is G-free (reference computes the two
            # gradients separately from the same forward, Teco.py:446-447).
            joint = gen_loss + cfg.warp_scaling * metrics["l2_warp_loss"]
            return joint, (metrics, aux)

        (_, (metrics, aux)), grads = jax.value_and_grad(
            loss_gf, argnums=(0, 1), has_aux=True
        )(state.gen_params, state.fnet_params)
        gen_grads, fnet_grads = grads

        gen_updates, gen_opt = self.gen_tx.update(
            gen_grads, state.gen_opt, state.gen_params
        )
        fnet_updates, fnet_opt = self.fnet_tx.update(
            fnet_grads, state.fnet_opt, state.fnet_params
        )
        new_state = dict(
            step=state.step + 1,
            gen_params=optax.apply_updates(state.gen_params, gen_updates),
            fnet_params=optax.apply_updates(state.fnet_params, fnet_updates),
            gen_opt=gen_opt,
            fnet_opt=fnet_opt,
        )

        if cfg.gan:
            # Adaptive gate: predicate from the *previous* EMA value
            # (reference reads the shadow variable, Teco.py:417,494).
            train_d = state.ema_tbalance < cfg.d_balance
            real27 = jax.lax.stop_gradient(aux["real27"])
            fake27 = jax.lax.stop_gradient(aux["fake27"])
            (d_loss, new_stats), d_grads = jax.value_and_grad(
                self._d_loss_fn, has_aux=True
            )(state.d_params, state.d_batch_stats, real27, fake27)
            d_updates, d_opt_new = self.d_tx.update(
                d_grads, state.d_opt, state.d_params
            )
            d_params_new = optax.apply_updates(state.d_params, d_updates)
            # Masked apply: params/opt change only when the gate is open.
            new_state["d_params"] = _tree_where(train_d, d_params_new, state.d_params)
            new_state["d_opt"] = _tree_where(train_d, d_opt_new, state.d_opt)
            # Moving BN stats always update (reference UPDATE_OPS run in both
            # branches, Teco.py:455-496).
            new_state["d_batch_stats"] = new_stats
            new_state["ema_tbalance"] = (
                cfg.loss_ema_decay * state.ema_tbalance
                + (1 - cfg.loss_ema_decay) * aux["t_balance"]
            )
            new_state["counter_with_d"] = state.counter_with_d + train_d.astype(
                jnp.int32
            )
            new_state["counter_wo_d"] = state.counter_wo_d + (
                1 - train_d.astype(jnp.int32)
            )

        # EMA telemetry (reference Teco.py:433-435).
        d = cfg.loss_ema_decay
        new_state["ema_losses"] = {
            k: d * state.ema_losses[k] + (1 - d) * metrics[k]
            for k in state.ema_losses
        }
        metrics = dict(metrics)
        metrics["learning_rate"] = self._schedule(state.step)
        if cfg.gan:
            metrics["t_balance"] = aux["t_balance"]
        return TrainState(**new_state), metrics

    def _eval_step_impl(self, state: TrainState, hr_seq: jnp.ndarray):
        """Validation losses without updates (reference main.py:394-402)."""
        cfg = self.config
        r_inputs, r_targets = prepare_batch(hr_seq, cfg)
        if cfg.pingpong:
            r_inputs = extend_pingpong(r_inputs)
            r_targets = extend_pingpong(r_targets)
        _, _, metrics, _ = self._forward_losses(
            state.gen_params, state.fnet_params, state.d_params,
            state.d_batch_stats, r_inputs, r_targets, state.step,
        )
        return metrics

    def _generate_impl(self, state: TrainState, hr_seq: jnp.ndarray):
        """Forward-only generation for summaries (reference gif_summary
        inputs, Teco.py:498-503): returns (r_inputs, targets01, gen01,
        warppre01 — the warped previous outputs, 'WarpPreGen')."""
        cfg = self.config
        r_inputs, r_targets = prepare_batch(hr_seq, cfg)
        flow_lr, flow_hr = flows_for_sequence(
            self.fnet.apply, state.fnet_params, r_inputs)
        gen_outputs, gen_warppre = unroll_generator(
            self.generator.apply, state.gen_params, r_inputs, flow_hr,
            remat=False,
        )
        return (
            r_inputs,
            (r_targets + 1) / 2,
            (gen_outputs + 1) / 2,
            (gen_warppre + 1) / 2,
        )

    # --------------------------------------------------------------- public
    def train_step(self, state: TrainState, hr_seq) -> Tuple[TrainState, Dict]:
        return self._train_step(state, hr_seq)

    def generate(self, state: TrainState, hr_seq):
        """(LR, HR, generated) sequences in [0, 1] for summaries."""
        if not hasattr(self, "_generate"):
            self._generate = jax.jit(self._generate_impl)
        return self._generate(state, hr_seq)

    def eval_step(self, state: TrainState, hr_seq) -> Dict:
        return self._eval_step(state, hr_seq)
