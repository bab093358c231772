"""CLI end-to-end smoke tests on the synthetic dataset: train, finetune,
evaluate, pred_fh, port — each exercised through its real main()."""

import json
import os

import numpy as np
import pytest

from peclr_tpu.data.synthetic import (
    generate_freihand_eval_like,
    generate_freihand_like,
)


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    """DATA_PATH layout with a miniature freihand_dataset."""
    root = tmp_path_factory.mktemp("data_root")
    fh = os.path.join(str(root), "freihand_dataset")
    generate_freihand_like(fh, num_unique=12, seed=7)
    generate_freihand_eval_like(fh, num_images=4, seed=8)
    return str(root)


@pytest.fixture
def env(data_root, tmp_path, monkeypatch):
    import peclr_tpu.constants as const
    import peclr_tpu.cli.finetune as ft
    import peclr_tpu.cli.evaluate as ev
    import peclr_tpu.cli.pred_fh as pf
    import peclr_tpu.cli.train as tr
    import peclr_tpu.train.loop as loop_mod

    fh = os.path.join(data_root, "freihand_dataset")
    saved = str(tmp_path / "models")
    meta = str(tmp_path / "meta")
    monkeypatch.setattr(const, "FREIHAND_DATA", fh)
    monkeypatch.setattr(const, "SAVED_MODELS_BASE_PATH", saved)
    monkeypatch.setattr(const, "SAVED_META_INFO_PATH", meta)
    for mod in (ft, ev, pf, tr, loop_mod):
        for name, val in (
            ("FREIHAND_DATA", fh),
            ("SAVED_MODELS_BASE_PATH", saved),
            ("SAVED_META_INFO_PATH", meta),
        ):
            if hasattr(mod, name):
                monkeypatch.setattr(mod, name, val)
    return {"fh": fh, "saved": saved, "meta": meta, "tmp": tmp_path}


def test_finetune_and_evaluate_cli(env, tmp_path):
    from peclr_tpu.cli import finetune

    workdir = str(tmp_path / "ft")
    finetune.main(
        [
            "-batch_size", "8", "-epochs", "1", "-steps_per_epoch", "2",
            "-resnet_size", "50", "-crop_size", "64", "-train_ratio", "0.75",
            "-num_workers", "2", "-workdir", workdir, "-optimizer", "adam",
        ]
    )
    ckpts = os.listdir(os.path.join(workdir, "checkpoints"))
    assert any(c.startswith("epoch_") for c in ckpts)

    from peclr_tpu.cli import evaluate

    ckpt = os.path.join(workdir, "checkpoints", "epoch_0")
    import io
    import contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        evaluate.main(
            [
                "-checkpoint", ckpt, "-resnet_size", "50", "-batch_size", "4",
                "-num_batches", "1", "-train_ratio", "0.75",
                "-crop_size", "64",
            ]
        )
    results = json.loads(buf.getvalue())
    assert "AUC" in results and "Mean_EPE_2D" in results
    assert np.isfinite(results["Mean_EPE_3D"])


def test_pred_fh_cli(env, tmp_path):
    """Export a random RN25D as a released-style .npz, run leaderboard
    inference through the CLI."""
    import jax
    import jax.numpy as jnp

    from peclr_tpu.cli import pred_fh
    from peclr_tpu.models import RN25DPose, port

    model = RN25DPose(size="50")
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), train=False
    )
    sd = port.variables_to_rn25d_checkpoint(variables, "50")
    weights = str(tmp_path / "peclr_rn50_model.npz")
    np.savez(weights, **sd)

    out_dir = str(tmp_path / "out")
    pred_fh.main(
        [
            "--model_path", weights, "-ds_path", env["fh"],
            "-batch_size", "4", "-limit", "4", "-out_dir", out_dir,
        ]
    )
    with open(os.path.join(out_dir, "pred_rn50.json")) as f:
        xyz, verts = json.load(f)
    assert len(xyz) == 4
    assert os.path.exists(os.path.join(out_dir, "pred_rn50.zip"))


def test_port_cli(env, tmp_path):
    import jax
    import jax.numpy as jnp

    from peclr_tpu.cli import port as port_cli
    from peclr_tpu.models import PeCLRModel, port

    model = PeCLRModel(resnet_size="18", dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
    )
    src = str(tmp_path / "peclr18.npz")
    np.savez(src, **port.variables_to_peclr_checkpoint(variables, "18"))
    dst = str(tmp_path / "tv18.npz")
    port_cli.main([src, dst, "-format", "peclr_to_torchvision",
                   "-resnet_size", "18"])
    with np.load(dst) as z:
        assert "conv1.weight" in z.files
        assert z["conv1.weight"].shape == (64, 3, 7, 7)


def test_train_cli_one_epoch(env, monkeypatch):
    """The full pretraining CLI on the synthetic dataset (tiny)."""
    from peclr_tpu.cli import train as train_cli

    # shrink the model/augmentation via args; 1 epoch over 36 samples
    train_cli.main(
        [
            "--rotate", "--crop", "--color_jitter", "--resize",
            "-batch_size", "8", "-epochs", "1", "-resnet_size", "18",
            "-train_ratio", "0.75", "-num_workers", "2", "-optimizer", "adam",
            "-canvas", "64", "-view_size", "48", "-sources", "freihand",
            "-save_top_k", "1",
        ]
    )
    # experiment tracked + checkpoint written
    meta_dirs = os.listdir(env["meta"])
    assert meta_dirs
    exp_dir = os.path.join(env["meta"], meta_dirs[0])
    assert os.path.exists(os.path.join(exp_dir, "metrics.jsonl"))


def test_finetune_from_pretrained_orbax(env, tmp_path):
    """Pretrain 1 epoch -> fine-tune initialized from the orbax checkpoint."""
    import glob

    from peclr_tpu.cli import finetune, train as train_cli

    train_cli.main(
        [
            "--rotate", "--crop", "--resize", "-batch_size", "8",
            "-epochs", "1", "-resnet_size", "50", "-train_ratio", "0.75",
            "-num_workers", "2", "-optimizer", "adam", "-canvas", "64",
            "-view_size", "48", "-save_top_k", "1",
        ]
    )
    ckpts = glob.glob(os.path.join(env["saved"], "*", "checkpoints", "epoch_0"))
    assert ckpts
    finetune.main(
        [
            "-batch_size", "8", "-epochs", "1", "-steps_per_epoch", "1",
            "-resnet_size", "50", "-crop_size", "48", "-train_ratio", "0.75",
            "-num_workers", "2", "-workdir", str(tmp_path / "ft2"),
            "-optimizer", "adam", "-pretrained", ckpts[0],
        ]
    )
