"""Data-parallel training: the Trainer's jitted step re-bound to a mesh.

Parameters/optimizer state are replicated; the HR batch is sharded on its
leading dimension. GSPMD propagates the shardings through the whole step and
inserts the gradient all-reduce over ICI — the only collective the training
parity needs (SURVEY.md §5 "distributed communication backend").
"""

from __future__ import annotations

import jax

from tecogan_tpu.config import TecoConfig
from tecogan_tpu.parallel.mesh import batch_sharding, replicated, shard_batch
from tecogan_tpu.train.trainer import Trainer


class DataParallelTrainer(Trainer):
    """Trainer whose train/eval steps run sharded over a mesh.

    The global batch size must be divisible by the ``data`` axis size.
    """

    def __init__(self, config: TecoConfig, mesh, vgg_params=None):
        self.mesh = mesh
        super().__init__(config, vgg_params=vgg_params)
        repl = replicated(mesh)
        bsh = batch_sharding(mesh, config.dp_axis)
        # State replicated, batch sharded; outputs (state, metrics) replicated.
        self._train_step = jax.jit(
            self._train_step_impl,
            donate_argnums=(0,),
            in_shardings=(repl, bsh),
            out_shardings=(repl, repl),
        )
        self._eval_step = jax.jit(
            self._eval_step_impl, in_shardings=(repl, bsh), out_shardings=repl
        )

    def init_state(self, rng):
        state = super().init_state(rng)
        return jax.device_put(state, replicated(self.mesh))

    def put_batch(self, batch):
        return shard_batch(self.mesh, batch, self.config.dp_axis)
