"""Configuration for TecoGAN-TPU.

Replaces the reference's flat ``tf.app.flags`` system (~45 global flags,
reference main.py:30-105) and the canonical hyperparameter lists embedded in
runGan.py cases 1/3/4 (reference runGan.py:76-296) with a single typed
dataclass plus named presets.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Tuple


@dataclasses.dataclass(frozen=True)
class TecoConfig:
    """Every knob of the framework, with reference-parity defaults.

    Defaults mirror reference main.py:30-105 flag defaults; presets below
    mirror the canonical training configurations in runGan.py.
    """

    # --- model architecture (reference main.py:47, frvsr.py:44-88) ---
    num_resblock: int = 16          # 16 for TecoGAN, 10 for FRVSR / mini
    gen_channels: int = 64          # generator trunk width
    fnet_channels: Tuple[int, ...] = (32, 64, 128)   # encoder widths
    fnet_up_channels: Tuple[int, ...] = (256, 128, 64)
    flow_max_velocity: float = 24.0  # tanh scale of fnet output (frvsr.py:39-40)
    upscale: int = 4                 # fixed 4x super resolution

    # --- temporal unroll (reference main.py:64, Teco.py:80-85) ---
    rnn_n: int = 10                  # recurrent unroll length in frames
    pingpong: bool = False           # ping-pong sequence extension (2N-1 frames)

    # --- data (reference main.py:62-76, dataloader.py:276-348) ---
    batch_size: int = 4
    crop_size: int = 32              # LR crop; HR crop is 4x
    flip: bool = True
    random_crop: bool = True
    moving_first_frame: bool = True  # camera-pan augmentation (dataloader.py:107-120)
    moving_first_frame_prob: float = 0.3
    input_video_dir: str = ""
    input_video_pre: str = "scene"
    str_dir: int = 1000
    end_dir: int = 2000
    end_dir_val: int = 2050
    max_frm: int = 119
    queue_thread: int = 6            # host decode threads
    prefetch_depth: int = 2          # device prefetch (double-buffer)
    train_upload_uint8: bool = True  # BatchLoader emits raw uint8 crops and
    #   the train step normalizes on device (trainer.py:prepare_batch) — 4x
    #   less host->device / DCN feed traffic, same trick as inference
    #   uploads. The on-device /255 is a reciprocal multiply (1 ulp vs host
    #   division — the documented inference bound); False restores host f32.
    loader_cache_mb: int = 256       # LRU decoded-frame cache shared by the
    #   loader pool (0 = off): overlapping RNN windows share decodes across
    #   the epoch — the reference loadHR_batch strategy (dataloader.py:
    #   53-167 decodes a whole scene per queue element) redesigned as a
    #   byte-budgeted cache. Batches are bit-identical either way.
    gaussian_sigma: float = 1.5      # HR->LR gaussian down-4 sigma (ops.py:347)

    # --- losses (reference main.py:77-103, Teco.py:280-399) ---
    vgg_scaling: float = -0.002      # <=0 disables VGG loss
    warp_scaling: float = 1.0
    pp_scaling: float = 1.0          # ping-pong loss weight
    ratio: float = 0.01              # adversarial loss weight; <=0 -> FRVSR mode
    dt_mergeDs: bool = True          # spatio-temporal D (27ch) vs pure temporal (9ch)
    dt_ratio_0: float = 1.0          # D fade-in start
    dt_ratio_add: float = 0.0        # D fade-in increment per step
    dt_ratio_max: float = 1.0        # D fade-in cap
    d_balance: float = 0.4           # adaptive D gating threshold (Teco.py:494)
    crop_dt: float = 0.75            # center-crop factor for Dt inputs
    d_layerloss: bool = True         # discriminator feature-layer losses
    d_layer_norm: Tuple[float, ...] = (12.0, 14.0, 24.0, 100.0)  # Teco.py:290
    d_layer_fix_range: float = 0.02  # Teco.py:281
    eps: float = 1e-12

    # --- optimization (reference main.py:83-94) ---
    learning_rate: float = 1e-4
    decay_step: int = 500_000
    decay_rate: float = 0.5
    stair: bool = False
    beta1: float = 0.9
    adam_eps: float = 1e-8
    max_iter: int = 1_000_000
    display_freq: int = 20
    summary_freq: int = 100
    save_freq: int = 10_000
    loss_ema_decay: float = 0.99     # EMA over loss telemetry (Teco.py:415,433)

    # --- precision & performance (TPU-native knobs, no reference analog) ---
    compute_dtype: str = "float32"   # "bfloat16" for MXU-friendly inference
    param_dtype: str = "float32"
    remat_generator: Any = "auto"    # per-frame rematerialisation in the
    #   train scan: True | False | "auto" (remat only when the unrolled
    #   generator activations would exceed ~4 GB). At the reference config
    #   (batch 4, crop 32, 19-frame ping-pong) activations are ~1.5 GB and
    #   remat's recompute costs 8% step time for nothing (191.5 -> 176.8
    #   ms/step measured on v5e), so "auto" turns it off there.
    infer_chunk: int = 16            # frames per scan chunk at inference
    inline_flow: str = "off"         # compute the 4x flow upsample + gather
    #   coords per warp tile from the LR flow instead of materializing the
    #   full-frame HR flow ("off"|"auto"|"on"; "auto" = blocked-warp frames
    #   only). Matches the global path to 1 ulp (ops/warp.py:
    #   dense_image_warp_flowlr); shrinks the scan's flow input 16x.
    #   Measured NEUTRAL on v5e (within noise at both 576x720 and 2160p —
    #   XLA's global coordinate passes are already bandwidth-efficient).
    fold_input_s2d: str = "auto"     # fold the post-warp space-to-depth into
    #   the generator's HR input conv at inference
    #   ("off"|"auto"|"on"|"patchify"). "auto" = patchify-mode fold on
    #   mid-size frames (HR 100k..2.1M px) at EVERY batch size: the s2d as
    #   a 0/1-selection 4x4-stride-4 conv (MXU im2col, bit-identical to
    #   the flax path; stride4's split conv is separately bf16-rounded on
    #   TPU, so batched serving would drift from single-stream outputs —
    #   see recurrent/inference.py:s2d_mode_for).
    #   Round-4 in-scan A/B: patchify beats the round-3 stride-4 fold
    #   everywhere in the band (221.0 -> 235.8 fps at 576x720 HR, 515.6 ->
    #   586.3 at 384x480, 887.0 -> 929.8 at 288x360) and no-fold at
    #   1080x1920 (39.7 -> 40.1); stride-4 fold itself was +18% over
    #   no-fold at 576x720 in round 3 and NEGATIVE at 2160p, which stays
    #   unfolded. "on" = force the stride-4 fold (round-3 path, kept for
    #   A/B); "patchify" = force patchify at any geometry. See
    #   models/generator.py:generator_apply_hr_input and
    #   recurrent/inference.py:s2d_mode_for.
    train_fold_s2d: Any = "patchify"  # fold the recurrent s2d pack into the
    #   generator input stage in the TRAINING unroll too (recurrent/step.py:
    #   unroll_generator fold_input). "patchify" (default) = the s2d as a
    #   0/1-selection 4x4-stride-4 conv (the round-4 inference headline
    #   trick; its input gradient is a non-overlapping 4x4 convT —
    #   scatter-free). Measured on v5e b4 crop32 rnn10: TecoGAN-16+VGG
    #   112.7 -> 107.3 ms/step, FRVSR-10 34.5 -> 30.8 (repeat-confirmed).
    #   False/"off" = the packed s2d path (round-3 default); True/"on" =
    #   the stride-4 kernel fold — MEASURED NEGATIVE (110.6 vs 105.1 ms:
    #   its input-gradient is a dilated 12x12 conv over the 4x HR frame,
    #   costlier than the s2d transposes it removes). All three are
    #   equality-tested (tests/test_recurrent.py).
    pallas_flow_upsample: str = "auto"  # 4x flow upsample via the Pallas
    #   banded-matmul kernel (kernels/upsample4.py) instead of XLA's einsum
    #   form in the streaming step ("off"|"auto"|"on"). In-scan A/B
    #   (tools/upsample_ab.py, v5e): NEUTRAL at 144x180 (208.1 -> 209.8
    #   fps, within run variance); at 540x960 the round-4 H-banded kernel
    #   is a consistent small win — 12.33 -> 12.56 fps at chunk 12, 12.54
    #   -> 12.65 at chunk 24, spreads +-0.01 — so "auto" enables it on
    #   TPU for LR frames >= 400k px and keeps XLA's einsum elsewhere.
    #   Outputs differ by <= 1 bf16 ulp.
    fused_trunk: str = "off"         # Pallas resblock trunk at inference:
    #   "off" = never (default: wins isolated — 38.2 vs 49.6 ms at 540x960 —
    #   but loses ~13 ms/frame inside the streaming scan, where XLA's chain
    #   runs ~2x faster than in isolation; kernels/resblocks.py docstring),
    #   "auto" = on large frames, "on" = always. Training always uses XLA.

    # --- parallelism (TPU-native; reference is single-GPU, SURVEY §2.3) ---
    dp_axis: str = "data"            # data-parallel mesh axis name
    sp_axis: str = "space"           # spatial-sharding mesh axis name

    # --- misc ---
    rand_seed: int = 1

    # -------------------------------------------------------------- helpers
    @property
    def gan(self) -> bool:
        """TecoGAN (adversarial) vs FRVSR mode (reference main.py:283-286)."""
        return self.ratio > 0

    @property
    def unroll_frames(self) -> int:
        """Total frames in the training unroll (2N-1 under ping-pong)."""
        return self.rnn_n * 2 - 1 if self.pingpong else self.rnn_n

    @property
    def gauss_border(self) -> int:
        """HR crop margin consumed by the VALID gaussian down-4 conv.

        Reference dataloader.py:279-280: tar = crop*4 + 2*int(1.5*3).
        """
        return int(self.gaussian_sigma * 3.0)

    @property
    def hr_load_size(self) -> int:
        return self.crop_size * self.upscale + 2 * self.gauss_border

    def __post_init__(self):
        # Mode-string knobs fail loudly on typos: a silently-unknown value
        # would fall through every dispatch branch and quietly run the
        # default strategy instead of the requested experiment.
        allowed = {
            "inline_flow": ("off", "auto", "on"),
            "fold_input_s2d": ("off", "auto", "on", "patchify"),
            "pallas_flow_upsample": ("off", "auto", "on"),
            "fused_trunk": ("off", "auto", "on"),
            "train_fold_s2d": (False, True, "off", "on", "patchify"),
        }
        for field, values in allowed.items():
            v = getattr(self, field)
            if v not in values:
                raise ValueError(f"{field}={v!r}; expected one of {values}")
        # The training unroll runs FNet on the raw LR crop with no /8
        # symmetric pad-back (inference pads any geometry back; the train
        # path keeps shapes static for the scan). A non-multiple-of-8 crop
        # would surface as an obscure flow reshape error deep in the step.
        if self.crop_size % 8 != 0:
            raise ValueError(
                f"crop_size={self.crop_size} must be a multiple of 8 "
                "(FNet has three 2x2 maxpools; the training unroll does "
                "not pad odd LR grids back — reference uses 32)")

    def replace(self, **kw) -> "TecoConfig":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, s: str) -> "TecoConfig":
        d = json.loads(s)
        for k in ("fnet_channels", "fnet_up_channels", "d_layer_norm"):
            if k in d and isinstance(d[k], list):
                d[k] = tuple(d[k])
        return cls(**d)


# Canonical presets, mirroring runGan.py run cases -------------------------

#: FRVSR training (reference runGan.py case 4, :247-296)
FRVSR_PRESET = TecoConfig(
    num_resblock=10,
    learning_rate=5e-5,
    decay_step=500_000,
    decay_rate=1.0,
    stair=True,
    max_iter=500_000,
    ratio=-0.01,
    pingpong=False,
    str_dir=2000,
    end_dir=2250,
    end_dir_val=2290,
    queue_thread=12,
)

#: Full TecoGAN adversarial training (reference runGan.py case 3, :107-244)
TECOGAN_PRESET = TecoConfig(
    num_resblock=16,
    learning_rate=5e-5,
    decay_step=500_000,
    decay_rate=1.0,
    stair=True,
    max_iter=500_000,
    vgg_scaling=0.2,
    ratio=0.01,
    dt_mergeDs=True,
    pingpong=True,
    pp_scaling=0.5,
    d_layerloss=True,
    str_dir=2000,
    end_dir=2250,
    end_dir_val=2290,
    queue_thread=12,
)

#: TecoGAN-mini (10 resblocks, reference runGan.py:86,269)
MINI_PRESET = TECOGAN_PRESET.replace(num_resblock=10)
