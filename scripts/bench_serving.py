"""Serving-latency benchmark for the fixed-shape inference session.

The reference repo has no serving layer; `peclr_tpu.eval.serving` adds one
(compile-once fixed batches, pad/chunk at the edges).  This measures its
two deployment-relevant numbers per batch size:

  sync_ms    — synchronous request latency through the REAL request path
               (`InferenceSession.predict`: host pad/chunk, dispatch, fetch
               the full output dict to numpy).  On the axon tunnel this
               includes the RPC round trip (~ms), which a PCIe-attached
               host does not pay; the chained device bound isolates that.
  chained_ms — device-side step time from a data-dependency chain
               (kp3d -> next input), the only trustworthy device timing on
               this tunnel (CLAUDE.md timing rules): the pipelined
               throughput bound when requests are queued back-to-back.

Writes ONE JSON artifact (bench_artifacts/serving_latency.json) asserted
by tests/test_bench_artifacts.py.

Run: python scripts/bench_serving.py  [--batches 1,8,32,128] [--iters 30]
"""

import argparse
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,8,32,128")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--image-size", type=int, default=128)
    ap.add_argument("--resnet", default="50")
    ap.add_argument("--out", default="bench_artifacts/serving_latency.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"),
    )

    from peclr_tpu.eval.serving import InferenceSession
    from peclr_tpu.models import RN25DPose
    from peclr_tpu.models.rn25d import K_DEFAULT

    model = RN25DPose(size=args.resnet)
    rng = np.random.default_rng(0)
    size = args.image_size
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, size, size, 3), jnp.float32),
        train=False,
    )

    rows = []
    for batch in [int(b) for b in args.batches.split(",")]:
        sess = InferenceSession(
            model, variables, batch_size=batch, image_size=size
        ).warmup()

        images = rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8)
        K = np.broadcast_to(np.asarray(K_DEFAULT), (batch, 3, 3)).copy()

        @jax.jit
        def chained(variables, images_u8, K, carry):
            # zero-valued uint8 derived from the previous kp3d: forces the
            # device to serialize the requests without changing the input
            eps = (carry * jnp.float32(0.0)).astype(jnp.uint8)
            out = sess._apply(variables, images_u8 + eps, K)
            kp3d = out["kp3d"]
            return kp3d, jnp.sum(kp3d)

        # warmup / compile the chained program (session already compiled)
        dimages = jnp.asarray(images)
        dK = jnp.asarray(K)
        _, carry = chained(sess.variables, dimages, dK, jnp.float32(0.0))
        float(carry)  # force

        # synchronous request latency through InferenceSession.predict:
        # numpy in, padded/chunked fixed-shape dispatch, numpy dict out
        sync = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            sess.predict(images, K)
            sync.append((time.perf_counter() - t0) * 1e3)
        sync = np.array(sync)

        # chained device step time (state->state; one fetch at the end)
        t0 = time.perf_counter()
        c = jnp.float32(0.0)
        for _ in range(args.iters):
            _, c = chained(sess.variables, dimages, dK, c)
        float(c)  # forces the whole chain
        chained_ms = (time.perf_counter() - t0) * 1e3 / args.iters

        rows.append(
            {
                "batch": batch,
                "sync_ms_p50": float(np.percentile(sync, 50)),
                "sync_ms_p99": float(np.percentile(sync, 99)),
                "chained_ms": chained_ms,
                "chained_img_per_s": batch / (chained_ms / 1e3),
            }
        )
        print(json.dumps(rows[-1]))

    artifact = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "resnet": args.resnet,
        "image_size": size,
        "iters": args.iters,
        "rows": rows,
        "note": (
            "sync is the full InferenceSession.predict request path and "
            "includes the tunnel RPC round trip on this rig; chained is "
            "the device-side pipelined bound"
        ),
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
