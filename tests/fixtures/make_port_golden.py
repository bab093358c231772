"""Generate the committed released-checkpoint golden fixture.

Run from the repo root:  python tests/fixtures/make_port_golden.py

Writes:
  tests/fixtures/port_rn50_keys.json   — exact key/shape manifests of the
      three released checkpoint layouts (torchvision / PeCLR-lightning /
      RN_25D_wMLPref) for RN50.
  tests/fixtures/port_rn50_golden.npz  — SHA-256 digests of the seeded
      fixture state dicts + the torch-oracle forward embedding on a fixed
      input (tests/torch_resnet_ref.py), pinning the port tables AND the
      flax encoder numerics against an immutable historical value.

tests/test_port_fixture.py asserts all of it on every run; regenerating this
file is a deliberate act that shows up in review.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from tests.port_fixture import (  # noqa: E402
    make_state_dict,
    peclr_lightning_manifest,
    rn25d_manifest,
    state_dict_digest,
    torchvision_resnet_manifest,
)

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    manifests = {
        "torchvision_rn50": torchvision_resnet_manifest("50"),
        "peclr_lightning_rn50": peclr_lightning_manifest("50"),
        "rn25d_rn50": rn25d_manifest("50"),
    }
    with open(os.path.join(HERE, "port_rn50_keys.json"), "w") as f:
        json.dump(
            {k: [[n, list(s)] for n, s in v] for k, v in manifests.items()},
            f,
            indent=1,
        )

    dicts = {k: make_state_dict(m, seed=7) for k, m in manifests.items()}
    digests = {k: state_dict_digest(sd) for k, sd in dicts.items()}

    import torch

    from tests.torch_resnet_ref import torch_resnet_forward

    x = np.random.default_rng(123).standard_normal((2, 3, 128, 128)).astype(
        np.float32
    )
    emb = torch_resnet_forward(
        dicts["torchvision_rn50"], "50", torch.from_numpy(x)
    ).numpy()

    np.savez(
        os.path.join(HERE, "port_rn50_golden.npz"),
        embedding=emb,
        **{f"digest_{k}": np.frombuffer(bytes.fromhex(d), np.uint8)
           for k, d in digests.items()},
    )
    print({k: (len(v), d[:12]) for (k, v), d in zip(manifests.items(),
                                                    digests.values())})
    print("embedding", emb.shape, float(np.abs(emb).mean()))


if __name__ == "__main__":
    main()
