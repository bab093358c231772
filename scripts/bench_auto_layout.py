"""A/B: AUTO input layouts for the batch vs default layouts.

The r3b trace shows 3.2 ms/step of input-batch relayout copies (copy.423:
u8[16,128,224,224,3] {1,0,3,4,2}->{3,2,1,4,0} at 254 GB/s + copy.432)
because jit pins the batch params to default layouts while the accum scan
wants its own tiling.  Lowering with AutoLayout on the batch lets XLA pick
the param layout the scan prefers; the host pipeline would then device_put
into that layout (free: the transfer writes the same bytes either way).

Measures the recipe step both ways with state->state chains; prints both
rates and the chosen layouts.  Run serialized with other TPU work:
    JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/bench_auto_layout.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    accum = int(os.environ.get("BENCH_ACCUM", "16"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"),
    )
    from jax._src.layout import AutoLayout
    from jax.experimental.layout import Format

    from peclr_tpu.config.defaults import AugmentationParams, peclr_pretrain_flags
    from peclr_tpu.train.recipe import build_pretrain_state, synthetic_pretrain_batch
    from peclr_tpu.train.step import (
        make_peclr_train_step,
        resolve_compiler_options,
    )

    model, state, tx = build_pretrain_state(resnet="50", batch=batch,
                                            accum=accum)
    flags = peclr_pretrain_flags()
    aug = AugmentationParams()
    raw_step = make_peclr_train_step(
        model, tx, flags, aug, accum=accum, with_stats=False, donate=True,
        jit=False,
    )
    opts = resolve_compiler_options("auto")
    batch_dict = synthetic_pretrain_batch(batch * accum)
    key = jax.random.PRNGKey(0)

    def run(tag, in_shardings):
        jitted = jax.jit(raw_step, donate_argnums=(0,),
                         in_shardings=in_shardings)
        compiled = jitted.lower(state, batch_dict, key).compile(
            dict(opts) if opts else None)
        fmts = compiled.input_formats[0]
        bd = batch_dict
        if in_shardings is not None:
            # move the batch into the executable's chosen layouts
            bd = {
                k: jax.device_put(v, fmts[1][k])
                for k, v in batch_dict.items()
            }
            print(f"{tag}: chosen batch layouts: "
                  f"{ {k: str(fmts[1][k].layout) for k in bd} }")
        # the step donates arg 0: run on a fresh copy so both variants can
        # start from the same live state
        st = jax.tree_util.tree_map(jnp.copy, state)
        for i in range(3):
            st, m = compiled(st, bd, jax.random.fold_in(key, i))
        float(m["loss"])
        t0 = time.perf_counter()
        for i in range(iters):
            st, m = compiled(st, bd, jax.random.fold_in(key, 100 + i))
        float(m["loss"])
        dt = time.perf_counter() - t0
        rate = batch * accum * iters / dt
        print(f"{tag}: {rate:.1f} img/s/chip")
        return rate

    results = {"default": run("default", None)}
    auto = (None, {k: Format(AutoLayout()) for k in batch_dict}, None)
    results["auto_batch_layout"] = run("auto", auto)
    results["speedup"] = results["auto_batch_layout"] / results["default"]
    out = "bench_artifacts/auto_layout.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out, json.dumps(results))


if __name__ == "__main__":
    main()
