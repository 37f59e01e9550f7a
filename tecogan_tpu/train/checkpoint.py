"""Checkpoint save/restore.

Capability parity with the reference's TF1 Saver workflows (SURVEY.md §5):

- full resume: everything including Adam slots, EMA state and step
  (reference main.py:346-348)
- warm start: only generator/fnet (optionally discriminator) weights from a
  previous run, everything else fresh — how FRVSR weights seed TecoGAN
  training (reference main.py:312-320, lib/ops.py:370-391)
- inference restore: generator + fnet params only (reference main.py:221-224)
- ``max_to_keep=50`` retention (reference main.py:307)

Storage is orbax-checkpoint. A converter ingests TF-slim checkpoints dumped
to ``.npz`` (TF variable names -> arrays) for weight-porting from the
published TecoGAN/FRVSR models; see :func:`convert_tf_npz`.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


# ------------------------------------------------------------------ orbax io
def _manager(ckpt_dir: str, keep: int = 50) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
    )


def save_checkpoint(ckpt_dir: str, state, step: int, keep: int = 50) -> None:
    """Save a full TrainState (or any pytree) at ``step``."""
    mgr = _manager(ckpt_dir, keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(ckpt_dir: str, template, step: Optional[int] = None):
    """Restore a pytree saved by :func:`save_checkpoint`.

    ``template`` supplies structure/shape/dtype (e.g. a freshly initialized
    TrainState).
    """
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError(f"No checkpoint under {ckpt_dir}")
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()
    return restored


def detect_num_resblock(gen_params) -> int:
    """Count generator resblocks in a params tree (its ``resblock_{i}_conv_1``
    keys). The checkpoint — not a CLI flag — is the source of truth for model
    depth; mismatches used to truncate silently (flax ignores extra param
    subtrees), which is how a 16-block model once evaluated as a 10-block one.
    """
    return sum(1 for k in gen_params
               if k.startswith("resblock_") and k.endswith("_conv_1"))


def _flatten_paths(tree) -> Dict[str, Any]:
    """Flatten a pytree to {'a/b/c': leaf} using dict keys / sequence indices."""
    out = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath)
        out[key] = leaf
    return out


def merge_partial_restore(current, loaded, name: str, src: str,
                          zero_missing: bool):
    """Reference ``get_existing_from_ckpt`` semantics for a structure-
    mismatched subtree (lib/ops.py:370-391, called at main.py:312-320):
    restore the leaf-name intersection, hard-error when a same-named leaf has
    a different shape (wrong model, reference ops.py:382-384), and fill leaves
    absent from the checkpoint with ZEROS when ``zero_missing`` (the
    reference's ``rest_zero=True`` for generator+fnet — zero-filled resblocks
    are exact identities, so a generator grown 10→16 blocks initially computes
    the 10-block checkpoint's function; this is how case 3 seeds the published
    16-block TecoGAN from the 10-block FRVSR model, runGan.py:161,200-203) or
    with their fresh init otherwise (the discriminator path, which the
    reference restores without ``rest_zero``).

    One deliberate improvement over the reference: zeroing BOTH convs of a
    grown resblock is a permanent saddle — with ``y = x + W2·relu(W1·x+b1)
    +b2`` all-zero, ``dL/dW2 = relu(0)⊗δ = 0`` and ``dL/d(conv1) = W2ᵀδ = 0``,
    so the reference's grown blocks can never train (only b2 drifts; Adam
    keeps exact-zero grads at zero). A missing ``resblock_*_conv_1`` therefore
    keeps its FRESH init and only ``conv_2`` is zeroed — the block is still an
    exact identity at step 0 (conv_2 zero suffices) but ``dL/dW2 =
    relu(conv1_fresh(x))⊗δ ≠ 0``, so the grown capacity actually trains
    (zero-init-residual, cf. ReZero/Fixup)."""
    cur = _flatten_paths(current)
    new = _flatten_paths(loaded)
    hits = [k for k in cur if k in new]
    if not hits:
        raise ValueError(
            f"warm_start: no overlapping {name} weights between {src} and "
            "the model being trained — wrong checkpoint? (pass matching "
            "--num_resblock/channels)")
    for k in hits:
        a, b = np.shape(new[k]), np.shape(cur[k])
        if a != b:
            raise ValueError(
                f"warm_start: shape mismatch for {name}/{k} in {src}: "
                f"checkpoint {a} vs model {b} (reference ops.py:382-384 "
                "raises here too; pass matching --num_resblock/channels)")
    missing = [k for k in cur if k not in new]
    unused = [k for k in new if k not in cur]

    def pick_leaf(keypath, leaf):
        key = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath)
        if key in new:
            return jnp.asarray(new[key]).astype(leaf.dtype)
        if zero_missing and not (
                key.startswith("resblock_") and "_conv_1" in key):
            return jnp.zeros_like(leaf)
        return leaf  # fresh init (grown conv_1 stays trainable, see above)

    merged = jax.tree_util.tree_map_with_path(pick_leaf, current)
    fill = "zero-filled (identity)" if zero_missing else "fresh init"
    print(f"warm_start: partial {name} restore from {src}: "
          f"{len(hits)} loaded, {len(missing)} {fill}"
          + (f" ({missing[0]} ...)" if missing else "")
          + (f", {len(unused)} checkpoint leaves unused" if unused else ""))
    return merged


# ------------------------------------------------------- partial warm start
def warm_start(state, ckpt_dir: str, step: Optional[int] = None,
               include_discriminator: bool = True):
    """Load only model weights from a previous run's TrainState checkpoint.

    Optimizer slots, EMA telemetry, counters and step stay fresh — parity
    with reference ``pre_trained_model=True`` (main.py:312-320,351-352).
    Entirely missing subtrees (e.g. no discriminator in an FRVSR checkpoint)
    are left at their fresh initialization. A present-but-structure-mismatched
    generator/fnet takes the reference's ``rest_zero`` partial restore
    (:func:`merge_partial_restore`): intersection loaded, missing leaves
    zero-filled into identity resblocks — the canonical 10-block FRVSR →
    16-block TecoGAN grow (runGan.py:161,200-203) — and genuine wrong-model
    cases (same-named shape mismatch, zero overlap) hard-error.

    ``ckpt_dir`` may also be a TF checkpoint dumped to ``.npz`` (e.g. the
    published FRVSR model, reference runGan.py:128-134,200-203) — the
    canonical case-3 chain seeds TecoGAN from it via the same partial
    restore.
    """
    if os.path.isfile(ckpt_dir) and ckpt_dir.endswith(".npz"):
        return warm_start_tf_npz(
            state, ckpt_dir, include_discriminator=include_discriminator)
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError(f"No checkpoint under {ckpt_dir}")
    # Restore lazily as a raw pytree dict to tolerate structure mismatch.
    raw = mgr.restore(step, args=ocp.args.StandardRestore(None))
    mgr.close()

    def pick(name, current):
        if current is None:
            return None
        if isinstance(raw, dict) and name in raw and raw[name] is not None:
            loaded = jax.tree.map(jnp.asarray, raw[name])
            # Fast path: identical treedef AND shapes — take the tree whole
            # (treedef alone would wave through a channel-mismatched model).
            if jax.tree.structure(loaded) == jax.tree.structure(
                    current) and jax.tree.all(jax.tree.map(
                        lambda a, b: a.shape == b.shape, loaded, current)):
                return loaded
            # Structure mismatch: reference-parity partial restore — the
            # canonical case-3 chain grows the 10-resblock FRVSR checkpoint
            # into a 16-resblock TecoGAN (runGan.py:161,200-203), with the
            # missing blocks zero-filled to identities (rest_zero=True,
            # main.py:312-320). Never silently keep fresh init for gen/fnet
            # (that once made a 'warm-started' GAN run train from scratch):
            # merge_partial_restore raises on shape mismatch or no overlap.
            return merge_partial_restore(
                current, loaded, name, ckpt_dir,
                zero_missing=name in ("gen_params", "fnet_params"))
        print(f"warm_start: {name} not in checkpoint; keeping fresh init")
        return current

    updates = dict(
        gen_params=pick("gen_params", state.gen_params),
        fnet_params=pick("fnet_params", state.fnet_params),
    )
    if include_discriminator and state.d_params is not None:
        updates["d_params"] = pick("d_params", state.d_params)
        updates["d_batch_stats"] = pick("d_batch_stats", state.d_batch_stats)
    return state.replace(**updates)


def warm_start_tf_npz(state, npz_path: str,
                      include_discriminator: bool = True):
    """Warm-start model weights from a TF checkpoint dumped to npz
    (:func:`convert_tf_npz` format) — how reference case 3 seeds TecoGAN
    training from the published FRVSR model (runGan.py:200-203,
    main.py:312-320). The npz's own depth is detected from its variable
    names; a depth mismatch against the model follows the reference's
    ``rest_zero`` partial-restore semantics (the canonical 10-block FRVSR →
    16-block TecoGAN grow zero-fills blocks 11-16 into identities)."""
    trees = convert_tf_npz(npz_path, num_resblock=None)

    def pick(name, current, zero_missing=False):
        if current is None or name not in trees:
            if current is not None:
                print(f"warm_start: {name} not in {npz_path}; "
                      "keeping fresh init")
            return current
        loaded = jax.tree.map(jnp.asarray, trees[name])
        if jax.tree.structure(loaded) == jax.tree.structure(
                current) and jax.tree.all(jax.tree.map(
                    lambda a, b: a.shape == b.shape, loaded, current)):
            return loaded
        return merge_partial_restore(current, loaded, name, npz_path,
                                     zero_missing=zero_missing)

    updates = dict(
        gen_params=pick("generator", state.gen_params, zero_missing=True),
        fnet_params=pick("fnet", state.fnet_params, zero_missing=True),
    )
    if include_discriminator and state.d_params is not None:
        updates["d_params"] = pick("discriminator", state.d_params)
        updates["d_batch_stats"] = pick(
            "discriminator_batch_stats", state.d_batch_stats)
    return state.replace(**updates)


# ------------------------------------------------- TF-slim name conversion
# Mapping from our flax module names to TF-slim scope names
# (reference frvsr.py:59-80, frvsr.py:26-38, Teco.py:44-71; SURVEY.md §5
# "checkpoint namespace contract").
def _get(data, *candidates):
    for c in candidates:
        if c in data:
            return data[c]
    raise KeyError(f"none of {candidates} in checkpoint npz")


def convert_tf_npz(npz_path: str,
                   num_resblock: Optional[int] = 16) -> Dict[str, Any]:
    """Convert a TF TecoGAN/FRVSR checkpoint (dumped to npz) to flax params.

    The npz maps TF variable names to arrays; produce it with any TF install:

        reader = tf.train.load_checkpoint(ckpt)
        np.savez(out, **{name: reader.get_tensor(name)
                         for name in reader.get_variable_to_shape_map()})

    ``num_resblock=None`` detects the depth from the checkpoint's own
    variable names (the published FRVSR has 10 blocks, TecoGAN 16 —
    reference runGan.py:161).

    Returns dict with 'generator' and 'fnet' param trees (plus
    'discriminator'/'discriminator_batch_stats' and 'global_step' when
    present).

    Training checkpoints additionally carry Adam slot variables
    (``<var>/Adam``, ``<var>/Adam_1``), ``beta1_power``/``beta2_power`` and
    loss-EMA shadows (``.../ExponentialMovingAverage``) — all ignored here:
    weight-porting seeds fresh optimizers (reference main.py:312-320 does
    the same for warm starts).
    """
    data = dict(np.load(npz_path))
    if num_resblock is None:
        # Both npz spellings appear in the wild (.../conv_1/Conv/weights
        # from slim scopes, .../conv_1/weights from flat dumps) — see _get.
        rb = re.compile(
            r"generator/generator_unit/resblock_(\d+)/conv_1/(Conv/)?weights$")
        num_resblock = max(
            (int(m.group(1)) for m in map(rb.match, data) if m), default=0)

    def conv(tf_scope):
        return {
            "kernel": jnp.asarray(_get(data, f"{tf_scope}/Conv/weights",
                                       f"{tf_scope}/weights")),
            "bias": jnp.asarray(_get(data, f"{tf_scope}/Conv/biases",
                                     f"{tf_scope}/biases")),
        }

    def conv_tran(tf_scope):
        # TF conv2d_transpose kernel layout [k,k,out,in] matches our
        # ConvTranspose(transpose_kernel=True) layout directly.
        return {
            "kernel": jnp.asarray(_get(data, f"{tf_scope}/Conv2d_transpose/weights",
                                       f"{tf_scope}/weights")),
            "bias": jnp.asarray(_get(data, f"{tf_scope}/Conv2d_transpose/biases",
                                     f"{tf_scope}/biases")),
        }

    g = "generator/generator_unit"
    gen = {"input_stage_conv": conv(f"{g}/input_stage/conv")}
    for i in range(1, num_resblock + 1):
        gen[f"resblock_{i}_conv_1"] = conv(f"{g}/resblock_{i}/conv_1")
        gen[f"resblock_{i}_conv_2"] = conv(f"{g}/resblock_{i}/conv_2")
    gen["conv_tran1"] = conv_tran(f"{g}/conv_tran2highres/conv_tran1")
    gen["conv_tran2"] = conv_tran(f"{g}/conv_tran2highres/conv_tran2")
    gen["output_stage_conv"] = conv(f"{g}/output_stage/conv")

    f = "fnet/autoencode_unit"
    fnet = {}
    for i in (1, 2, 3):
        for j in (1, 2):
            fnet[f"encoder_{i}_conv_{j}"] = conv(f"{f}/encoder_{i}/conv_{j}")
            fnet[f"decoder_{i}_conv_{j}"] = conv(f"{f}/decoder_{i}/conv_{j}")
    fnet["output_conv1"] = conv(f"{f}/output_stage/conv1")
    fnet["output_conv2"] = conv(f"{f}/output_stage/conv2")

    out = {"generator": gen, "fnet": fnet}

    d = "tdiscriminator/discriminator_unit"
    if any(k.startswith("tdiscriminator") for k in data):
        disc = {"input_stage_conv": conv(f"{d}/input_stage/conv")}
        stats = {}
        for idx in (1, 3, 5, 7):
            disc[f"disblock_{idx}_conv"] = {
                "kernel": jnp.asarray(
                    _get(data, f"{d}/disblock_{idx}/conv1/Conv/weights")
                )
            }
            disc[f"disblock_{idx}_bn"] = {
                "bn": {
                    "bias": jnp.asarray(
                        _get(data, f"{d}/disblock_{idx}/BatchNorm/beta")
                    )
                }
            }
            stats[f"disblock_{idx}_bn"] = {
                "bn": {
                    "mean": jnp.asarray(
                        _get(data, f"{d}/disblock_{idx}/BatchNorm/moving_mean")
                    ),
                    "var": jnp.asarray(
                        _get(data, f"{d}/disblock_{idx}/BatchNorm/moving_variance")
                    ),
                }
            }
        disc["dense"] = {
            "kernel": jnp.asarray(
                _get(data, f"{d}/dense_layer_2/dense/kernel")
            ).reshape(-1, 1),
            "bias": jnp.asarray(_get(data, f"{d}/dense_layer_2/dense/bias")),
        }
        out["discriminator"] = disc
        out["discriminator_batch_stats"] = stats
    if "global_step" in data:
        out["global_step"] = int(data["global_step"])
    return out


# ----------------------------------------------------------- plain npz io
def params_to_npz(path: str, **param_trees) -> None:
    """Flatten named param trees into one npz (our own interchange format)."""
    flat = {}
    for name, tree in param_trees.items():
        leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
        for keypath, leaf in leaves:
            key = name + "/" + "/".join(
                str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath
            )
            flat[key] = np.asarray(leaf)
    np.savez(path, **flat)


def npz_to_params(path: str, template_trees: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of :func:`params_to_npz` given structure templates."""
    data = np.load(path)
    out = {}
    for name, template in template_trees.items():
        leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
        new_leaves = []
        for keypath, leaf in leaves:
            key = name + "/" + "/".join(
                str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath
            )
            arr = jnp.asarray(data[key])
            assert arr.shape == leaf.shape, (key, arr.shape, leaf.shape)
            new_leaves.append(arr)
        out[name] = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(template), new_leaves
        )
    return out
