"""Validity-probe candidate XLA TPU per-compile options on a tiny program.

The axon tunnel's chipless AOT compiler validates per-compile option NAMES
before compiling ("No such compile option: ..."), so unknown names fail in
~0.2 s while valid ones pay only a tiny-program compile (~0.5 s).  This
screens candidates BEFORE spending a ~6-minute recipe compile on each
(BENCHLOG round 4, "Scheduling-option sweep, part 2").

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_compiler_options.py \
        [name=value ...]

With no arguments, probes the round-4 candidate battery below and prints
VALID/INVALID per name.  `value` parses as JSON (so `true`, `2.0`, `64`).

The reference has no equivalent surface — torch exposes no per-compile
backend options; this is TPU/XLA-native tooling.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

#: round-4 battery; see BENCHLOG for which of these validated and how the
#: valid ones measured on the recipe.
DEFAULT_CANDIDATES = [
    ("xla_latency_hiding_scheduler_rerun", 2),
    ("xla_tpu_enforce_prefetch_fifo_order", True),
    ("xla_tpu_use_repeated_instance_for_preferred_prefetch_time", True),
    ("xla_tpu_async_copy_bandwidth_scaling_factor", 1.0),
    ("xla_tpu_nd_short_transfer_max_chunks", 16),
    ("xla_tpu_rwb_fusion", False),
    ("xla_tpu_dot_dot_fusion", True),
    ("xla_tpu_dot_dot_fusion_duplicated", True),
    ("xla_tpu_enable_dot_strength_reduction", False),
    ("xla_tpu_reduce_loop_fusion_dup_with_unfusable_user", True),
    ("xla_tpu_copy_fusion_pad_unpad_ratio", 0.0),
]


def probe(candidates):
    x = jnp.zeros((256, 256), jnp.bfloat16)
    lowered = jax.jit(lambda a: a @ a).lower(x)
    valid = []
    for name, value in candidates:
        t0 = time.time()
        try:
            lowered.compile({name: value})
            valid.append(name)
            print(f"VALID    {name} ({time.time() - t0:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — any compile error == invalid
            msg = str(e).split("\n")[0][:120]
            print(f"INVALID  {name} ({time.time() - t0:.1f}s): {msg}",
                  flush=True)
    return valid


def main(argv):
    if argv:
        cands = []
        for arg in argv:
            name, _, raw = arg.partition("=")
            cands.append((name, json.loads(raw) if raw else True))
    else:
        cands = DEFAULT_CANDIDATES
    valid = probe(cands)
    print("\nvalid:", valid)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
