"""Multi-process (multi-host) data parallelism over the CPU backend: two
OS processes form one JAX runtime via mrn_tpu.parallel.multihost.initialize,
install a global 'data' mesh, feed the SAME global batch from each process
(the seeded-loader pattern), and verify a jitted sharded reduction and a
gradient psum match the single-process result."""

import os
import socket
import subprocess
import sys
import textwrap

WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=4")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from mrn_tpu.parallel import multihost
    from mrn_tpu.parallel.mesh import set_data_parallel, shard_batch, get_mesh

    coord, pid = sys.argv[1], int(sys.argv[2])
    rank, count = multihost.initialize(coordinator_address=coord,
                                       num_processes=2, process_id=pid)
    assert count == 2, count
    assert len(jax.devices()) == 8, len(jax.devices())  # 2 procs x 4 local

    set_data_parallel()  # global mesh over all 8 devices
    assert get_mesh() is not None

    # every process assembles the SAME global batch (seeded loaders do this
    # in training); device_put slices out the addressable shard
    batch = np.arange(8 * 6, dtype=np.float32).reshape(8, 6)
    x = shard_batch(batch)

    w = jnp.full((6,), 0.5, jnp.float32)

    @jax.jit
    def loss_and_grad(w, x):
        def loss(w):
            return jnp.mean(jnp.sum(x * w[None, :], axis=1) ** 2)
        return jax.value_and_grad(loss)(w)

    val, grad = loss_and_grad(w, x)
    # outputs are replicated -> fully addressable in every process
    val = float(val)
    grad = np.asarray(grad)

    ref_val = float(np.mean(np.sum(batch * 0.5, axis=1) ** 2))
    ref_grad = np.mean(2 * np.sum(batch * 0.5, axis=1)[:, None] * batch, axis=0)
    assert abs(val - ref_val) / ref_val < 1e-5, (val, ref_val)
    np.testing.assert_allclose(grad, ref_grad, rtol=1e-5)
    print(f"proc{pid} OK val={val:.3f}")
""")


def test_two_process_data_parallel(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ,
               PYTHONPATH=repo_root + os.pathsep + os.environ.get("PYTHONPATH", ""))
    procs = [subprocess.Popen([sys.executable, str(script), coord, str(i)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=env)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out}"
        assert f"proc{i} OK" in out
