"""Pallas kernel tests (interpret mode on the CPU test mesh)."""

import jax.numpy as jnp
import numpy as np

from peclr_tpu.ops.pallas.barrel_shift import barrel_shift_rows_pallas


def test_barrel_shift_rows_exact(rng):
    n, p, out_w = 64, 512, 256
    rows = jnp.asarray(rng.uniform(0, 255, (n, p)).astype(np.float32))
    shifts = jnp.asarray(rng.integers(0, p - out_w - 1, (n,)).astype(np.int32))
    fracs = jnp.asarray(rng.uniform(0, 1, (n,)).astype(np.float32))
    out = np.asarray(
        barrel_shift_rows_pallas(rows, shifts, fracs, out_w, interpret=True)
    )
    r, s, f = np.asarray(rows), np.asarray(shifts), np.asarray(fracs)
    ref = np.stack(
        [
            r[i, s[i]: s[i] + out_w] * (1 - f[i])
            + r[i, s[i] + 1: s[i] + out_w + 1] * f[i]
            for i in range(n)
        ]
    )
    np.testing.assert_allclose(out, ref, atol=1e-4)
