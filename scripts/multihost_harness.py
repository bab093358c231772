"""Cross-process multi-host feeding harness (VERDICT r4 next #3).

`parallel/multihost.py` maps the reference's latent world-size contract
(`train_iters_per_epoch = num_samples // (world_size * batch)`,
/root/reference/src/models/base_model.py:53-55) onto JAX's multi-process
runtime.  Until round 4 it was only exercised single-process on the virtual
8-device mesh — `make_array_from_process_local_data` never crossed a real
process boundary.  This harness closes that seam:

  * spawns 2 REAL processes (`jax.distributed.initialize`, CPU backend,
    Gloo cross-process collectives, 4 virtual devices each -> one global
    8-device mesh);
  * each worker loads only its PROCESS-LOCAL half of the global batch and
    assembles it with `global_batch_from_host_local` (the >1-process branch
    for real this time);
  * both run TWO chained jitted PeCLR train steps (augment RNG, BN stats,
    global-view NT-Xent, LARS update) on the globally-sharded batch;
  * the launcher reruns the identical program single-process on an
    8-device mesh and asserts the losses match.

Run:  python scripts/multihost_harness.py [--out bench_artifacts/...json]
The pytest wrapper (tests/test_multihost.py) spawns this end-to-end.
If the toolchain cannot run cross-process CPU collectives, the launcher
records the exact failure in the artifact instead (documented blocker).
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GLOBAL_BATCH = 16
ACCUM = 2
CANVAS = 64
VIEW = 32
STEPS = 2  # step 1 has warmup lr 0; step 2 applies a real update


def _batch_numpy():
    """The deterministic GLOBAL batch, identical in every process."""
    import numpy as np

    rng = np.random.default_rng(0)
    n = GLOBAL_BATCH * ACCUM
    images = rng.integers(0, 256, size=(n, CANVAS, CANVAS, 3), dtype=np.uint8)
    joints = np.zeros((n, 21, 3), np.float32)
    joints[..., 0] = rng.uniform(16, 48, (n, 21))
    joints[..., 1] = rng.uniform(16, 48, (n, 21))
    return {"image": images, "joints25d": joints}


def _setup():
    """Deterministic tiny model/step (mirrors tests/test_train_step.py's
    tiny_setup): same PRNG seed in every process => identical init."""
    import jax
    import jax.numpy as jnp

    from peclr_tpu.config.defaults import AugmentationParams, peclr_pretrain_flags
    from peclr_tpu.models import PeCLRModel
    from peclr_tpu.train.optimizer import build_optimizer
    from peclr_tpu.train.state import TrainState
    from peclr_tpu.train.step import make_peclr_train_step

    model = PeCLRModel(resnet_size="18", dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, VIEW, VIEW, 3)), train=False
    )
    tx, _ = build_optimizer(
        variables["params"], base_lr=1e-3, batch_size=GLOBAL_BATCH,
        accum=ACCUM, steps_per_epoch=10, epochs=5, warmup_epochs=1,
        optimizer="LARS",
    )
    state = TrainState.create(variables, tx)
    step = make_peclr_train_step(
        model, tx, peclr_pretrain_flags(),
        AugmentationParams(resize_shape=(VIEW, VIEW)),
        accum=ACCUM, donate=False,
    )
    return state, step


def _run_steps(mesh, state, step, batch_global):
    import jax
    import numpy as np

    key = jax.random.PRNGKey(7)
    losses = []
    for i in range(STEPS):
        state, metrics = step(state, batch_global, jax.random.fold_in(key, i))
        # the loss is replicated; read this process's addressable copy
        losses.append(float(np.asarray(metrics["loss"].addressable_data(0))))
    return losses


def _replicate_global(mesh, tree):
    """Host-identical pytree -> fully-replicated global jax.Arrays (works
    under multi-process, where device_put can't span non-addressable
    devices)."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, rep, lambda idx: x[idx])

    return jax.tree_util.tree_map(put, tree)


def worker(args):
    import jax

    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=args.coord,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert jax.process_count() == args.num_processes
    assert jax.local_device_count() == 4 and jax.device_count() == 8

    from peclr_tpu.parallel.mesh import make_mesh
    from peclr_tpu.parallel.multihost import (
        global_batch_from_host_local,
        local_batch_size,
    )

    mesh = make_mesh(data=8)
    state, step = _setup()
    state = _replicate_global(mesh, jax.device_get(state))

    batch = _batch_numpy()
    # THE contract under test: this process loads only its local rows
    rows = local_batch_size(GLOBAL_BATCH * ACCUM)
    assert rows == GLOBAL_BATCH * ACCUM // args.num_processes
    lo = args.process_id * rows
    local = {k: v[lo : lo + rows] for k, v in batch.items()}
    batch_global = global_batch_from_host_local(mesh, local)
    for v in batch_global.values():
        assert v.shape[0] == GLOBAL_BATCH * ACCUM  # global, not local, shape

    losses = _run_steps(mesh, state, step, batch_global)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump({
                "process_id": args.process_id,
                "process_count": jax.process_count(),
                "local_devices": jax.local_device_count(),
                "global_devices": jax.device_count(),
                "losses": losses,
            }, fh)
    print(f"worker {args.process_id}: losses {losses}")
    jax.distributed.shutdown()


def single_process_reference(out_path=None):
    """The same program, one process, 8 virtual devices.

    Runs in a SANITIZED subprocess when invoked through launch() — the
    launcher's own ambient env may pin jax to the 1-device TPU tunnel,
    which cannot host the 8-device reference mesh."""
    import jax

    from peclr_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh(data=8)
    state, step = _setup()
    state = _replicate_global(mesh, jax.device_get(state))
    batch = shard_batch(mesh, _batch_numpy())
    losses = _run_steps(mesh, state, step, batch)
    if out_path:
        with open(out_path, "w") as fh:
            json.dump({"losses": losses}, fh)
    return losses


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def launch(args):
    """Spawn the 2-process run, then compute the single-process reference
    in-process, and write the comparison artifact."""
    tmp = args.tmpdir or "/tmp"
    port = _free_port()
    env = dict(os.environ)
    for var in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE"):
        env.pop(var, None)  # never let a worker touch the TPU tunnel
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=4 "
        "--xla_cpu_collective_call_terminate_timeout_seconds=600"
    )
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    outs = [os.path.join(tmp, f"multihost_worker{i}.json") for i in range(2)]
    procs = []
    for i in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             "--process-id", str(i), "--num-processes", "2",
             "--coord", f"localhost:{port}", "--out", outs[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        ))
    logs, codes = [], []
    deadline = time.time() + args.timeout
    for p in procs:
        try:
            out, _ = p.communicate(timeout=max(deadline - time.time(), 1))
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            out += "\n[launcher] TIMEOUT"
        logs.append(out)
        codes.append(p.returncode)

    record = {
        "harness": "2 processes x 4 virtual CPU devices, gloo collectives",
        "global_batch": GLOBAL_BATCH, "accum": ACCUM, "steps": STEPS,
        "worker_exit_codes": codes,
    }
    ok = codes == [0, 0] and all(os.path.exists(o) for o in outs)
    if ok:
        results = [json.load(open(o)) for o in outs]
        record["workers"] = results
        # single-process reference in the SAME sanitized env (the launcher
        # itself may sit on the 1-device TPU tunnel)
        ref_out = os.path.join(tmp, "multihost_ref.json")
        env_ref = dict(env)
        env_ref["XLA_FLAGS"] = env["XLA_FLAGS"].replace(
            "device_count=4", "device_count=8"
        )
        refp = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single-ref",
             "--out", ref_out],
            env=env_ref, capture_output=True, text=True,
            timeout=args.timeout,
        )
        if refp.returncode != 0:
            record["ok"] = False
            record["blocker"] = [
                "single-process reference failed:",
                (refp.stdout + refp.stderr)[-4000:],
            ]
            _finish(record, args, logs)
            return
        ref = json.load(open(ref_out))["losses"]
        record["single_process_losses"] = ref
        same = all(
            abs(w - r) <= 2e-5 * abs(r)
            for res in results for w, r in zip(res["losses"], ref)
        )
        agree = results[0]["losses"] == pytest_approx_list(results[1]["losses"])
        record["ok"] = bool(same and agree)
        record["max_rel_err"] = max(
            abs(w - r) / abs(r)
            for res in results for w, r in zip(res["losses"], ref)
        )
    else:
        record["ok"] = False
        record["blocker"] = [l[-4000:] for l in logs]
    _finish(record, args, logs)


def _finish(record, args, logs):
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as fh:
            json.dump(record, fh, indent=1)
    print(json.dumps({k: v for k, v in record.items() if k != "blocker"},
                     indent=1))
    if not record["ok"]:
        for l in logs:
            print(l[-2000:])
        sys.exit(1)


def pytest_approx_list(xs, rel=1e-6):
    class _L(list):
        def __eq__(self, other):
            return len(self) == len(other) and all(
                abs(a - b) <= rel * max(abs(a), abs(b), 1e-12)
                for a, b in zip(self, other)
            )
    return _L(xs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--single-ref", action="store_true",
                    help="run the single-process 8-device reference and "
                    "write {losses} to --out (spawned by the launcher in "
                    "a sanitized env)")
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--coord", default="localhost:9987")
    ap.add_argument("--out", default="bench_artifacts/multihost_crossproc.json")
    ap.add_argument("--tmpdir", default=None)
    ap.add_argument("--timeout", type=float, default=600)
    args = ap.parse_args()
    if args.worker:
        worker(args)
    elif args.single_ref:
        single_process_reference(out_path=args.out)
    else:
        launch(args)


if __name__ == "__main__":
    main()
