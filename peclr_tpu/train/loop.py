"""PeCLR pretraining loop: the `trainer.fit` equivalent.

Glues host pipeline -> device prefetch -> jitted train step, with epoch-mean
metric aggregation (`checkpoint_saving_loss` parity with
base_model.py:106-115), top-k checkpointing, optional auto-resume (the
reference leaves resume manual — SURVEY §5.3 — here it is wired in), and
throughput/profiler observability.

Resume semantics: interrupt-at-an-epoch-boundary + resume is BIT-EQUAL to
uninterrupted training (tests/test_end_to_end.py::
test_resume_trajectory_equivalence): the step RNG is keyed by the absolute
step index (`fold_in(key, epoch*steps_per_epoch+i)`), the pipeline's batch
stream is keyed by `epoch`, and checkpoints carry the full TrainState.
A MID-epoch interrupt resumes from the last completed epoch's checkpoint
and deterministically REPLAYS the partial epoch (same batches, same keys);
no optimizer step is ever half-applied or double-applied.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import jax
import numpy as np

from peclr_tpu.config.defaults import ModelConfig, TrainConfig
from peclr_tpu.constants import SAVED_META_INFO_PATH, SAVED_MODELS_BASE_PATH
from peclr_tpu.data.pipeline import HostPipeline, device_prefetch
from peclr_tpu.models import PeCLRModel
from peclr_tpu.parallel.mesh import make_mesh, replicated
from peclr_tpu.train.checkpoint import CheckpointManager, save_experiment_key
from peclr_tpu.train.optimizer import build_optimizer
from peclr_tpu.train.state import TrainState
from peclr_tpu.train.step import make_peclr_eval_step, make_peclr_train_step
from peclr_tpu.utils.logging import (
    ExperimentLogger,
    get_console_logger,
    prepare_name,
)
from peclr_tpu.utils.profiler import Throughput, trace

import jax.numpy as jnp


class PeCLRTrainer:
    def __init__(
        self,
        train_cfg: TrainConfig,
        model_cfg: ModelConfig,
        train_pipeline: HostPipeline,
        val_pipeline: Optional[HostPipeline] = None,
        mesh=None,
        workdir: Optional[str] = None,
        experiment_name: Optional[str] = None,
        save_top_k: int = 3,
        save_period: int = 1,
        log_interval: str = "epoch",
        meta_file: Optional[str] = None,
        tags: Sequence[str] = (),
        profile_dir: Optional[str] = None,
        auto_resume: bool = True,
        log_images: bool = True,
        restore_checkpoint: str = "",
    ):
        self.log_images = log_images
        self.log = get_console_logger("peclr_tpu.train")
        self.train_cfg = train_cfg
        self.model_cfg = model_cfg
        self.pipeline = train_pipeline
        self.val_pipeline = val_pipeline
        self.mesh = mesh if mesh is not None else make_mesh()
        self.profile_dir = profile_dir
        self.auto_resume = auto_resume

        flags = train_cfg.augmentation_flags
        # use_palm parity (data_set.py:305-314 vs 356-383): the flag reaches
        # the data config but ONLY supervised samples consume it — hybrid2
        # contrastive pairs carry no joint labels, so pretraining behavior is
        # identical either way.  It is recorded in the experiment params so a
        # downstream finetune/evaluate run can match the convention.
        self.use_palm = bool(getattr(train_cfg, "use_palm", False))
        if self.use_palm:
            get_console_logger("peclr_tpu.train").info(
                "use_palm is recorded for downstream runs; the hybrid2 "
                "contrastive objective itself is unaffected (reference "
                "data_set.py:356-383 never reads it)"
            )
        self.experiment_name = experiment_name or prepare_name(
            "hybrid2_", train_cfg.batch_size, flags.active()
        )
        self.tracker = ExperimentLogger(
            SAVED_META_INFO_PATH, self.experiment_name, log_interval=log_interval
        )
        self.tracker.log_parameters(
            {
                "train": train_cfg.__dict__,
                "model": model_cfg.__dict__,
                # at epoch cadence the proj* stats are a first-step-of-epoch
                # SAMPLE, not an epoch mean (hot path skips them; see
                # _train_step_stats gating in fit)
                "projection_stats_cadence": (
                    "per-step" if log_interval == "step"
                    else "first-step-of-epoch sample"
                ),
            }
        )
        self.tracker.add_tags(["pretraining", "HYBRID2", *tags])
        if meta_file is not None:
            save_experiment_key(
                SAVED_META_INFO_PATH, self.experiment_name,
                self.tracker.experiment_key, meta_file,
            )

        workdir = workdir or os.path.join(
            SAVED_MODELS_BASE_PATH, self.tracker.experiment_key
        )
        self.ckpt = CheckpointManager(
            workdir, save_top_k=save_top_k, period=save_period
        )

        # ---- model + optimizer -------------------------------------------
        dtype = jnp.bfloat16 if train_cfg.precision == "bf16" else jnp.float32
        self.model = PeCLRModel(
            resnet_size=model_cfg.resnet_size,
            projection_hidden_dim=model_cfg.projection_head_hidden_dim,
            projection_dim=model_cfg.output_dim,
            dtype=dtype,
        )
        canvas_init = jnp.zeros(
            (1, *train_cfg.augmentation_params.resize_shape, 3), jnp.float32
        )
        variables = self.model.init(
            jax.random.PRNGKey(train_cfg.seed), canvas_init, train=False
        )
        accum = train_cfg.accumulate_grad_batches
        self.steps_per_epoch = max(
            len(train_pipeline) // (train_cfg.batch_size * accum), 1
        )
        tx, self.schedule = build_optimizer(
            variables["params"],
            base_lr=model_cfg.lr,
            batch_size=train_cfg.batch_size,
            accum=accum,
            steps_per_epoch=self.steps_per_epoch * accum,
            epochs=train_cfg.epochs,
            warmup_epochs=model_cfg.warmup_epochs,
            weight_decay=model_cfg.opt_weight_decay,
            optimizer=model_cfg.optimizer,
            lr_max_epochs=model_cfg.lr_max_epochs,
        )
        self.tx = tx
        self.state = jax.device_put(
            TrainState.create(variables, tx), replicated(self.mesh)
        )
        if getattr(model_cfg, "experiment_type", "hybrid2") == "simclr":
            # invariant baseline: no inverse transforms in projection space
            augmentations = ()
        else:
            augmentations = model_cfg.augmentation or flags.active()
        # Hot path runs WITHOUT the per-step projection stats; a second
        # compiled variant computes them only on logged steps (reference logs
        # them every step — hybrid2_model.py:40-45 — but at epoch cadence the
        # 8 extra reductions/microbatch are pure overhead).  bench.py measures
        # the stats-free variant, which is the shipped common path.
        self.train_step = make_peclr_train_step(
            self.model, tx, flags, train_cfg.augmentation_params,
            accum=accum, augmentations=augmentations, with_stats=False,
        )
        self._train_step_stats = make_peclr_train_step(
            self.model, tx, flags, train_cfg.augmentation_params,
            accum=accum, augmentations=augmentations, with_stats=True,
        )
        self.eval_step = make_peclr_eval_step(
            self.model, flags, train_cfg.augmentation_params,
            augmentations=augmentations,
        )
        self.start_epoch = 0
        if restore_checkpoint:
            # named restore (reference restore_model/get_latest_checkpoint,
            # experiments/utils.py:535-561 + models/utils.py:189-206): a
            # specific checkpoint beats auto-resume-latest, and a missing
            # name is a loud error, not a silent cold start
            epoch = self.ckpt.resolve_epoch(restore_checkpoint)
            restored, epoch = self.ckpt.restore(
                jax.device_get(self.state), epoch=epoch
            )
            self.state = jax.device_put(restored, replicated(self.mesh))
            self.start_epoch = epoch + 1
            self.log.info(
                f"restored checkpoint {restore_checkpoint!r} (epoch {epoch})"
            )
        elif auto_resume:
            restored, epoch = self.ckpt.restore(jax.device_get(self.state))
            if restored is not None:
                self.state = jax.device_put(restored, replicated(self.mesh))
                self.start_epoch = epoch + 1
                self.log.info(f"auto-resumed from epoch {epoch}")

    # ------------------------------------------------------------------
    def fit(self, epochs: Optional[int] = None):
        try:
            return self._fit(epochs)
        finally:
            # release the metrics JSONL fd however fit() exits
            self.tracker.close()

    def _fit(self, epochs: Optional[int] = None):
        cfg = self.train_cfg
        epochs = epochs if epochs is not None else cfg.epochs
        accum = cfg.accumulate_grad_batches
        images_per_step = cfg.batch_size * accum
        key = jax.random.PRNGKey(cfg.seed)

        for epoch in range(self.start_epoch, epochs):
            meter = Throughput()
            epoch_metrics: Dict[str, list] = {}
            batches = device_prefetch(
                self.pipeline.batches(self.steps_per_epoch, epoch=epoch),
                mesh=self.mesh,
            )
            with trace(self.profile_dir if epoch == self.start_epoch else None):
                for i, batch in enumerate(batches):
                    step_key = jax.random.fold_in(
                        key, epoch * self.steps_per_epoch + i
                    )
                    if i == 0 and self.log_images:
                        self._log_pair_figure(batch, step_key, epoch)
                    want_stats = (
                        self.tracker.log_interval == "step" or i == 0
                    )
                    step_fn = (
                        self._train_step_stats if want_stats else self.train_step
                    )
                    self.state, metrics = step_fn(self.state, batch, step_key)
                    meter.tick(images_per_step)
                    for k, v in metrics.items():
                        epoch_metrics.setdefault(k, []).append(v)
                    if self.tracker.log_interval == "step":
                        self.tracker.log_metrics(
                            {k: float(v) for k, v in metrics.items()},
                            step=int(jax.device_get(self.state.step)),
                            epoch=epoch,
                        )

            mean_metrics = {
                k: float(np.mean(jax.device_get(v))) for k, v in epoch_metrics.items()
            }
            mean_metrics["checkpoint_saving_loss"] = mean_metrics.get(
                "loss", np.inf
            )
            mean_metrics.update(meter.report())
            # LearningRateMonitor parity: current schedule value
            mean_metrics["lr"] = float(
                self.schedule(int(jax.device_get(self.state.step)))
            )
            self.tracker.log_metrics(mean_metrics, epoch=epoch)
            self.log.info(
                f"epoch {epoch}: loss={mean_metrics['loss']:.4f} "
                f"({mean_metrics.get('images_per_sec', float('nan')):.0f} img/s)"
            )

            if self.val_pipeline is not None:
                val = self.validate(epoch)
                self.tracker.log_metrics(val, epoch=epoch, context="val")

            self.ckpt.save(epoch, jax.device_get(self.state), mean_metrics)
        return self.state

    def _log_pair_figure(self, batch, key, epoch: int):
        """Save an augmented-pair figure for the first sample of the epoch
        (the reference's per-epoch Comet image logging,
        upload_comet_logs.py:38-101)."""
        try:
            from peclr_tpu.ops.augment import augment_pair
            from peclr_tpu.utils.visualize import plot_peclr_pair

            v1, v2 = augment_pair(
                key,
                batch["image"][:1],
                batch["joints25d"][:1],
                self.train_cfg.augmentation_flags,
                self.train_cfg.augmentation_params,
            )
            params = {
                **{f"{k}_1": np.asarray(v) for k, v in v1.params.items()},
                **{f"{k}_2": np.asarray(v) for k, v in v2.params.items()},
            }
            path = plot_peclr_pair(
                np.asarray(v1.images[0]),
                np.asarray(v2.images[0]),
                params,
                out_dir=os.path.join(self.tracker.dir, "figures"),
                name=f"pair_epoch{epoch}.png",
            )
            if path is not None:
                self.tracker.log_figure(path, name=f"pair_epoch{epoch}")
        except Exception as e:  # figures must never kill training
            self.log.warning(f"pair-figure logging failed: {e}")

    def validate(self, epoch: int, num_batches: Optional[int] = None):
        n = num_batches or max(
            len(self.val_pipeline) // self.train_cfg.batch_size, 1
        )
        key = jax.random.PRNGKey(1000 + epoch)
        losses = []
        for i, batch in enumerate(
            device_prefetch(self.val_pipeline.batches(n, epoch=epoch), mesh=self.mesh)
        ):
            m = self.eval_step(self.state, batch, jax.random.fold_in(key, i))
            losses.append(float(m["loss"]))
        return {"loss": float(np.mean(losses))}
