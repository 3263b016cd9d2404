"""REAL multi-process jax.distributed initialization (2 processes × 4
virtual CPU devices each, Gloo collectives), exercising
parallel/distributed.initialize + global_mesh and a cross-process
sharded computation — the multi-slice path that single-process tests
can only no-op through.

Each subprocess joins the coordination service, builds the 8-device
global mesh, assembles a globally-sharded batch from process-local
shards, and runs a jitted global reduction plus the small ViT forward;
the parent asserts both processes agree on the results.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    pid = int(sys.argv[1]); n = int(sys.argv[2]); port = sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.getcwd())
    from avd_tpu.parallel import distributed

    assert distributed.initialize(
        coordinator=f"127.0.0.1:{port}", num_processes=n,
        process_id=pid) is True
    assert len(jax.devices()) == 4 * n
    assert len(jax.local_devices()) == 4

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = distributed.global_mesh(axes=("data",))
    assert mesh.size == 4 * n

    # globally-sharded batch assembled from process-local shards
    gshape = (8, 16)
    full = np.arange(np.prod(gshape), dtype=np.float32).reshape(gshape)
    sharding = NamedSharding(mesh, P("data"))
    arr = jax.make_array_from_process_local_data(sharding, full[pid * 4:(pid + 1) * 4], gshape)
    total = jax.jit(lambda v: jnp.sum(v),
                    out_shardings=NamedSharding(mesh, P()))(arr)
    print(f"SUM {float(total)}", flush=True)

    # the detector forward under the global mesh (replicated params,
    # data-sharded batch) — the multi-slice serving configuration
    from avd_tpu.models import detector
    cfg = detector.ViTConfig(image_size=32, patch=16, width=64, depth=1,
                             heads=2)
    params = detector.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.device_put(params, NamedSharding(mesh, P()))
    frames_full = np.linspace(0, 1, 8 * 32 * 32 * 3, dtype=np.float32)
    frames_full = frames_full.reshape(8, 32, 32, 3)
    fr = jax.make_array_from_process_local_data(sharding, frames_full[pid * 4:(pid + 1) * 4], frames_full.shape)
    with mesh:
        logits = jax.jit(lambda p, x: detector.forward(p, x, cfg),
                         out_shardings=NamedSharding(mesh, P()))(params, fr)
    print(f"LOGIT {float(jnp.sum(logits)):.6f}", flush=True)

    # one cross-process data-parallel TRAINING step: the batch is sharded
    # over both processes' devices, gradients all-reduce over the global
    # mesh (GSPMD/Gloo), and both processes must land on the identical
    # replicated loss and updated params
    opt = detector.make_optimizer(1e-3)
    opt_state = opt.init(params)
    step = detector.make_train_step(cfg, opt)
    labels_full = (np.arange(8) % 2).astype(np.int32)
    lb = jax.make_array_from_process_local_data(
        sharding, labels_full[pid * 4:(pid + 1) * 4], labels_full.shape)
    with mesh:
        params, opt_state, loss = jax.jit(
            step, out_shardings=(NamedSharding(mesh, P()), None,
                                 NamedSharding(mesh, P())))(
            params, opt_state, fr, lb)
        psum = jnp.sum(jnp.abs(params["patch_w"]))
    print(f"LOSS {float(loss):.6f} PSUM {float(psum):.4f}", flush=True)
""")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_global_mesh(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=os.getcwd(), env=env) for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert "SUM 8128.0" in out, out  # sum(0..127)
    # both processes computed identical global logits
    lg = [line for out in outs for line in out.splitlines()
          if line.startswith("LOGIT ")]
    assert len(lg) == 2 and lg[0] == lg[1], lg
    # and agreed on the cross-process training step's loss + new params
    ls = [line for out in outs for line in out.splitlines()
          if line.startswith("LOSS ")]
    assert len(ls) == 2 and ls[0] == ls[1], ls
