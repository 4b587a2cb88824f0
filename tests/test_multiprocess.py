"""Real multi-process jax.distributed exercise (SURVEY.md section 5.8).

Spawns two OS processes that call jax.distributed.initialize (Gloo
backend over CPU devices), build the global ('rays','geo') mesh, and run
the framework's sharded training step — the geometry all_gather and the
gradient pmean actually cross process boundaries here, unlike the
in-process 8-device mesh the rest of the suite uses.
"""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1])
    port = sys.argv[2]
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                               process_id=pid)
    import jax.numpy as jnp
    from raytracebvh_tpu import Camera, RenderConfig
    from raytracebvh_tpu.core.types import scene_to_device
    from raytracebvh_tpu.models.inverse import apply_params, init_params
    from raytracebvh_tpu.models.procedural import random_triangles
    from raytracebvh_tpu.parallel.mesh import make_mesh, replicated
    from raytracebvh_tpu.parallel.render import train_step_sharded

    mesh = make_mesh(4, geo=2)  # 2 procs x 2 local devices
    cfg = RenderConfig(width=16, height=16, bounces=1, leaf_pad_multiple=32)
    scene = scene_to_device(
        random_triangles(16, seed=0, extent=3.0, tri_size=1.5)
    )
    scene = jax.device_put(scene, replicated(mesh))
    params = jax.device_put(init_params(scene), replicated(mesh))
    target = jnp.zeros((16, 16, 4), jnp.float32)
    loss, grads = train_step_sharded(
        params, apply_params, scene, Camera.default(), target, cfg, mesh
    )
    gnorm = float(sum(jnp.sum(g * g)
                      for g in jax.tree_util.tree_leaves(grads)))
    print(f"RESULT {pid} {float(loss):.9f} {gnorm:.9f}", flush=True)

    # host mesh: 'dcn' axis = the real process boundary (Gloo); the
    # gradient pmean's cross-host stage actually crosses processes
    from raytracebvh_tpu.parallel.mesh import make_host_mesh
    hmesh = make_host_mesh(geo=2)  # ('dcn','rays','geo') = (2,1,2)
    scene_h = jax.device_put(scene, replicated(hmesh))
    params_h = jax.device_put(params, replicated(hmesh))
    loss_h, grads_h = train_step_sharded(
        params_h, apply_params, scene_h, Camera.default(), target, cfg, hmesh
    )
    gnorm_h = float(sum(jnp.sum(g * g)
                        for g in jax.tree_util.tree_leaves(grads_h)))
    print(f"RESULT_HOST {pid} {float(loss_h):.9f} {gnorm_h:.9f}", flush=True)
    """
)


@pytest.mark.slow
def test_two_process_train_step(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ, PYTHONPATH=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    ))
    port = "19891"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(2)
    ]
    results = {}
    results_host = {}
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=300)
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        for line in out.splitlines():
            if line.startswith("RESULT_HOST"):
                _, pid, loss, gnorm = line.split()
                results_host[int(pid)] = (float(loss), float(gnorm))
            elif line.startswith("RESULT"):
                _, pid, loss, gnorm = line.split()
                results[int(pid)] = (float(loss), float(gnorm))
    assert set(results) == {0, 1}
    # both processes agree on the psum'd loss and gradients
    assert results[0] == results[1]
    assert np.isfinite(results[0][0])
    assert results[0][1] > 0.0, "gradients should be nonzero"
    # the ('dcn','rays','geo') host mesh agrees across processes and with
    # the flat mesh (the dcn pmean stage crossed a real process boundary)
    assert set(results_host) == {0, 1}
    assert results_host[0] == results_host[1]
    np.testing.assert_allclose(results_host[0][0], results[0][0], rtol=1e-6)
    np.testing.assert_allclose(results_host[0][1], results[0][1], rtol=1e-5)
