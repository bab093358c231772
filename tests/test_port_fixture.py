"""Released-checkpoint parity, pinned by committed golden fixtures.

The actual released .pth files are unreachable here (zero egress; PARITY.md
records the final download-and-diff TODO).  These tests verify everything
short of the bytes: exact key sets / ordering / shapes of all three released
layouts, bit-exact port round-trips through the REAL key sets (including
num_batches_tracked and zroot_ref.zroot_ref.N), the reference port tool's
positional-zip contract, the port CLI end-to-end on a .pth file, and the
flax forward against a committed torch-oracle embedding.
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from peclr_tpu.models import port
from peclr_tpu.models.resnet import ResNetEncoder
from tests.port_fixture import (
    make_state_dict,
    peclr_lightning_manifest,
    rn25d_manifest,
    state_dict_digest,
    torchvision_resnet_manifest,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def golden():
    with np.load(os.path.join(FIXTURES, "port_rn50_golden.npz")) as z:
        return {k: z[k] for k in z.files}


@pytest.fixture(scope="module")
def key_manifest():
    with open(os.path.join(FIXTURES, "port_rn50_keys.json")) as f:
        return json.load(f)


def _digest_hex(golden, name):
    return bytes(golden[f"digest_{name}"]).hex()


class TestManifests:
    @pytest.mark.parametrize(
        "name,fn",
        [
            ("torchvision_rn50", lambda: torchvision_resnet_manifest("50")),
            ("peclr_lightning_rn50", lambda: peclr_lightning_manifest("50")),
            ("rn25d_rn50", lambda: rn25d_manifest("50")),
        ],
    )
    def test_matches_committed_keys(self, key_manifest, name, fn):
        ours = [[k, list(s)] for k, s in fn()]
        assert ours == key_manifest[name]

    def test_fixture_generator_is_stable(self, golden):
        for name, fn in [
            ("torchvision_rn50", lambda: torchvision_resnet_manifest("50")),
            ("peclr_lightning_rn50", lambda: peclr_lightning_manifest("50")),
            ("rn25d_rn50", lambda: rn25d_manifest("50")),
        ]:
            sd = make_state_dict(fn(), seed=7)
            assert state_dict_digest(sd) == _digest_hex(golden, name), name

    def test_positional_zip_contract(self):
        # the reference port tool zips 'features' keys positionally against
        # torchvision keys, checking only last name components
        # (port_model.py:24-40) — our layouts must satisfy that invariant
        tv = torchvision_resnet_manifest("50")
        lt = [e for e in peclr_lightning_manifest("50") if "features" in e[0]]
        assert len(tv) == len(lt)
        for (tk, ts), (lk, ls) in zip(tv, lt):
            assert tk.split(".")[-1] == lk.split(".")[-1]
            assert ts == ls


class TestForwardGolden:
    def test_torch_oracle_matches_committed_embedding(self, golden):
        torch = pytest.importorskip("torch")
        from tests.torch_resnet_ref import torch_resnet_forward

        sd = make_state_dict(torchvision_resnet_manifest("50"), seed=7)
        x = np.random.default_rng(123).standard_normal((2, 3, 128, 128))
        emb = torch_resnet_forward(
            sd, "50", torch.from_numpy(x.astype(np.float32))
        ).numpy()
        np.testing.assert_allclose(emb, golden["embedding"], atol=1e-4, rtol=1e-5)

    def test_flax_import_matches_committed_embedding(self, golden):
        sd = make_state_dict(torchvision_resnet_manifest("50"), seed=7)
        variables = port.torchvision_to_encoder(sd, "50")
        x = np.random.default_rng(123).standard_normal((2, 3, 128, 128))
        ours = ResNetEncoder(size="50").apply(
            variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1)), jnp.float32),
            train=False,
        )
        np.testing.assert_allclose(
            np.asarray(ours), golden["embedding"], atol=5e-3, rtol=1e-3
        )


class TestReleasedLayoutRoundTrips:
    def test_lightning_import_export_bit_exact(self):
        sd = make_state_dict(peclr_lightning_manifest("50"), seed=7)
        variables = port.peclr_checkpoint_to_variables(sd, "50")
        back = port.variables_to_peclr_checkpoint(variables, "50")
        for k, v in back.items():
            if k.endswith("num_batches_tracked"):
                assert k in sd
                continue
            np.testing.assert_array_equal(v, sd[k], err_msg=k)

    def test_lightning_to_torchvision_values(self):
        # ported values land positionally: features key i -> torchvision key i
        sd = make_state_dict(peclr_lightning_manifest("50"), seed=7)
        variables = port.peclr_checkpoint_to_variables(sd, "50")
        out = port.peclr_to_torchvision(variables, "50")
        tv = torchvision_resnet_manifest("50")
        assert [k for k, _ in tv] == list(out)  # same keys, same ORDER
        lt = [e for e in peclr_lightning_manifest("50") if "features" in e[0]]
        for (tk, _), (lk, _) in zip(tv, lt):
            if tk.endswith("num_batches_tracked"):
                continue
            np.testing.assert_array_equal(out[tk], sd[lk], err_msg=tk)

    def test_rn25d_import_forward_export(self):
        from peclr_tpu.models import RN25DPose

        sd = make_state_dict(rn25d_manifest("50"), seed=7)
        variables = port.rn25d_checkpoint_to_variables(sd, "50")
        model = RN25DPose(size="50")
        x = jnp.asarray(
            np.random.default_rng(5).standard_normal((2, 128, 128, 3)),
            jnp.float32,
        )
        out = model.apply(variables, x, train=False)
        assert out["kp3d"].shape == (2, 21, 3)
        assert bool(jnp.isfinite(out["kp3d"]).all())
        back = port.variables_to_rn25d_checkpoint(variables, "50")
        for k, v in back.items():
            if k.endswith("num_batches_tracked"):
                assert k in sd
                continue
            np.testing.assert_array_equal(v, sd[k], err_msg=k)


class TestPortCLI:
    def test_cli_on_released_pth(self, tmp_path):
        torch = pytest.importorskip("torch")
        from peclr_tpu.cli.port import main as port_main

        sd = make_state_dict(peclr_lightning_manifest("50"), seed=7)
        src = tmp_path / "peclr_rn50.pth"
        torch.save({"state_dict": {k: torch.tensor(v) for k, v in sd.items()}},
                   str(src))
        dst = tmp_path / "tv.npz"
        port_main([str(src), str(dst), "-format", "peclr_to_torchvision",
                   "-resnet_size", "50"])
        with np.load(dst) as z:
            out = {k: z[k] for k in z.files}
        tv = torchvision_resnet_manifest("50")
        assert [k for k, _ in tv] == list(out)
        lt = [e for e in peclr_lightning_manifest("50") if "features" in e[0]]
        for (tk, _), (lk, _) in zip(tv, lt):
            if tk.endswith("num_batches_tracked"):
                continue  # dropped on import, synthesized as 0 on export
            np.testing.assert_array_equal(out[tk], sd[lk], err_msg=tk)
