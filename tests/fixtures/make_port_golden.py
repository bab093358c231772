"""Generate the committed released-checkpoint golden fixtures.

Run from the repo root:
    python tests/fixtures/make_port_golden.py [size ...]     (default: 50 152)

Writes, per resnet size N:
  tests/fixtures/port_rnN_keys.json   — exact key/shape manifests of the
      three released checkpoint layouts (torchvision / PeCLR-lightning /
      RN_25D_wMLPref).  The reference releases BOTH RN50 and RN152 weights
      (/root/reference/README.md:84-122), so both sizes are pinned.
  tests/fixtures/port_rnN_golden.npz  — SHA-256 digests of the seeded
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


def write_size(size: str):
    manifests = {
        f"torchvision_rn{size}": torchvision_resnet_manifest(size),
        f"peclr_lightning_rn{size}": peclr_lightning_manifest(size),
        f"rn25d_rn{size}": rn25d_manifest(size),
    }
    with open(os.path.join(HERE, f"port_rn{size}_keys.json"), "w") as f:
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
        dicts[f"torchvision_rn{size}"], size, torch.from_numpy(x)
    ).numpy()

    np.savez(
        os.path.join(HERE, f"port_rn{size}_golden.npz"),
        embedding=emb,
        **{f"digest_{k}": np.frombuffer(bytes.fromhex(d), np.uint8)
           for k, d in digests.items()},
    )
    print({k: (len(v), d[:12]) for (k, v), d in zip(manifests.items(),
                                                    digests.values())})
    print(f"rn{size} embedding", emb.shape, float(np.abs(emb).mean()))


def main(sizes):
    for size in sizes:
        write_size(size)


if __name__ == "__main__":
    main(sys.argv[1:] or ["50", "152"])
