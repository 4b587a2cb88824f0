"""Checkpoint/resume: round-trip and training-state continuity."""

import jax.numpy as jnp
import numpy as np

from raytracebvh_tpu import Camera, RenderConfig
from raytracebvh_tpu.core.types import scene_to_device
from raytracebvh_tpu.models.inverse import (
    init_params,
    make_optimizer,
    train_step,
)
from raytracebvh_tpu.models.procedural import random_triangles
from raytracebvh_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint


def test_roundtrip(tmp_path):
    tree = {
        "a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
        "b": (np.int32(7), 3.5),
        "step": 42,
    }
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, tree)
    got = restore_checkpoint(path, tree)
    assert got["step"] == 42 and isinstance(got["step"], int)
    np.testing.assert_array_equal(got["a"], np.asarray(tree["a"]))
    assert got["b"][1] == 3.5
    assert restore_checkpoint(str(tmp_path / "missing.npz"), tree) is None


def test_training_resume_matches_uninterrupted(tmp_path):
    scene = scene_to_device(random_triangles(60, seed=2))
    cfg = RenderConfig(width=16, height=16, bounces=0, ortho_scale=0.2)
    cam = Camera.default()
    target = jnp.zeros((16, 16, 4), jnp.float32)

    params = init_params(scene)
    opt_state = make_optimizer().init(params)

    # 4 uninterrupted steps
    p_a, s_a = params, opt_state
    for _ in range(4):
        p_a, s_a, loss_a = train_step(p_a, s_a, scene, cam, target, cfg)

    # 2 steps -> checkpoint -> restore -> 2 more
    p_b, s_b = params, opt_state
    for _ in range(2):
        p_b, s_b, _ = train_step(p_b, s_b, scene, cam, target, cfg)
    path = str(tmp_path / "train.npz")
    save_checkpoint(path, (p_b, s_b, 2))
    p_c, s_c, step = restore_checkpoint(path, (p_b, s_b, 0))
    assert step == 2
    for _ in range(2):
        p_c, s_c, loss_c = train_step(p_c, s_c, scene, cam, target, cfg)

    for a, c in zip(
        np.asarray(p_a.vert_offsets).ravel(),
        np.asarray(p_c.vert_offsets).ravel(),
    ):
        np.testing.assert_allclose(a, c, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(float(loss_a), float(loss_c), rtol=1e-6)
