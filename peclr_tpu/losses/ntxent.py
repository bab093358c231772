"""NT-Xent (normalized temperature-scaled cross-entropy) contrastive loss.

Semantics match the SimCLR formulation used by the reference
(src/models/utils.py:154-186): for 2N L2-normalized projections the positive
similarity is exp(<z1_i, z2_i>/τ) and the denominator is the sum over all
2N−1 off-diagonal similarities, loss = −mean log(pos/neg).

TPU/sharding notes: this is written as a *global-view* jit function.  When
z1/z2 are batch-sharded over the mesh's data axis, the 2N×2N similarity
matmul makes XLA insert the cross-chip all_gather automatically, so the
negative pool always spans the full global batch — equivalent to the
single-device computation at the same global batch size (the north-star
requirement in SURVEY §2.2).  No shard_map/pmap plumbing needed.
"""

from __future__ import annotations

import jax.numpy as jnp


def ntxent_loss(z1, z2, temperature: float = 0.5):
    """z1, z2: (N, D) L2-normalized projections of the two views.

    Returns the scalar NT-Xent loss over the 2N global batch.
    """
    z = jnp.concatenate([z1, z2], axis=0)
    # full similarity matrix on the MXU; f32 accumulation
    sim = jnp.exp(
        jnp.dot(z, z.T, preferred_element_type=jnp.float32) / temperature
    )
    # off-diagonal sum per row (subtract the diagonal exactly rather than
    # masking — avoids materializing a 2N x 2N mask)
    neg = jnp.sum(sim, axis=-1) - jnp.diagonal(sim)
    pos = jnp.exp(jnp.sum(z1 * z2, axis=-1) / temperature)
    pos = jnp.concatenate([pos, pos], axis=0)
    return -jnp.mean(jnp.log(pos / neg))
