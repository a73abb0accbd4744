"""IO layer, interop wrappers, domain randomization, spectral norm tests."""

import os

import jax
import jax.numpy as jnp
import numpy as onp
import pytest

from brax_tpu import envs
from brax_tpu.envs import ant as ant_mod


@pytest.fixture(scope="module")
def ant_traj():
    env = ant_mod.Ant()
    state = env.reset(jax.random.PRNGKey(0))
    qps = [state.qp]
    step = jax.jit(env.step)
    for _ in range(5):
        state = step(state, jnp.zeros(8))
        qps.append(state.qp)
    return env, qps


def test_json_html(ant_traj, tmp_path):
    from brax_tpu.io import html, json as iojson

    env, qps = ant_traj
    s = iojson.dumps(env.art.config, qps)
    import json as pyjson

    d = pyjson.loads(s)
    assert len(d["pos"]) == 6
    assert d["config"]["bodies"][0]["name"] == "$ Torso"

    path = str(tmp_path / "view.html")
    html.save_html(path, env.art.config, qps)
    page = open(path).read()
    assert "brax-tpu-viewer" in page and "const system" in page


def test_image_render(ant_traj):
    from brax_tpu.io import image

    env, qps = ant_traj
    arr = image.render_array(env.art.config, qps[0], 64, 64, backend="sdf")
    assert arr.shape == (64, 64, 3) and arr.dtype == onp.uint8
    # scene is visible: not a constant image
    assert arr.std() > 5


def test_model_roundtrip(tmp_path):
    from brax_tpu.io import model

    path = str(tmp_path / "params.pkl")
    params = {"w": jnp.arange(4.0), "b": jnp.ones(2)}
    model.save_params(path, params)
    loaded = model.load_params(path)
    assert jnp.allclose(loaded["w"], params["w"])


def test_npy_roundtrip(ant_traj, tmp_path):
    from brax_tpu.io import npy_file

    env, qps = ant_traj
    path = str(tmp_path / "traj.npy")
    npy_file.save(path, qps)
    d = npy_file.load(path)
    assert d["pos"].shape == (6, 10, 3)


def test_torch_interop():
    torch = pytest.importorskip("torch")
    from brax_tpu.io import torch as iotorch

    t = iotorch.jax_to_torch(jnp.arange(5.0))
    assert isinstance(t, torch.Tensor) and t.shape == (5,)
    j = iotorch.torch_to_jax(torch.arange(4).float())
    assert j.shape == (4,)


def test_gym_wrapper():
    env = envs.create_gym_env("fast", episode_length=16)
    obs = env.reset()
    assert obs.shape == (2,)
    obs, reward, done, info = env.step(jnp.zeros(1))
    assert obs.shape == (2,)

    venv = envs.create_gym_env("fast", batch_size=4, episode_length=16)
    obs = venv.reset()
    assert obs.shape == (4, 2)
    obs, reward, done, info = venv.step(jnp.zeros((4, 1)))
    assert reward.shape == (4,)


def test_dm_env_wrapper():
    pytest.importorskip("dm_env")
    from brax_tpu.envs import interop

    DmEnvWrapper = interop.make_dm_env_wrapper()
    env = DmEnvWrapper(envs.create("fast", episode_length=16, auto_reset=False))
    ts = env.reset()
    assert ts.first()
    ts = env.step(jnp.zeros(1))
    assert ts.observation.shape == (2,)


def test_torch_env_wrapper():
    torch = pytest.importorskip("torch")
    from brax_tpu.envs import interop

    env = envs.create_gym_env("fast", batch_size=2, episode_length=8)
    tenv = interop.JaxToTorchWrapper(env)
    obs = tenv.reset()
    assert isinstance(obs, torch.Tensor)
    obs, reward, done, info = tenv.step(torch.zeros((2, 1)))
    assert isinstance(reward, torch.Tensor)


def test_domain_randomization():
    from brax_tpu.sim import randomization

    env = ant_mod.Ant()
    wrapped = randomization.DomainRandomizationWrapper(
        env,
        randomization.mass_randomizer(0.5, 1.5),
        jax.random.PRNGKey(1),
        batch_size=4,
    )
    # population physics params differ
    assert float(jnp.std(wrapped.sys_batch.mass[:, 0])) > 0
    state = jax.jit(wrapped.reset)(jax.random.PRNGKey(0))
    assert state.obs.shape[0] == 4
    state2 = jax.jit(wrapped.step)(state, jnp.zeros((4, 8)))
    # different masses -> different dynamics across the population
    assert bool(jnp.all(jnp.isfinite(state2.obs)))
    assert float(jnp.std(state2.qp.vel[:, 0, 2])) > 0


def test_spectral_norm_dense():
    from brax_tpu.training.spectral_norm import SNDense

    layer = SNDense(features=8)
    x = jnp.ones((3, 4))
    params = layer.init({"params": jax.random.PRNGKey(0), "sing_vec": jax.random.PRNGKey(1)}, x)
    y, updates = layer.apply(params, x, mutable=["sing_vec"])
    assert y.shape == (3, 8)
    # kernel spectral norm ~<= 1 after normalization: outputs stay bounded
    big = layer.apply(params, 100 * jnp.eye(4), mutable=["sing_vec"])[0]
    s = jnp.linalg.svd(big / 100.0, compute_uv=False)
    assert float(s[0]) < 1.5


def test_image_render_heightmap_and_mesh():
    """The SDF renderer covers heightmaps (bilinear field) and triangle
    meshes (point-triangle distance), parity with the reference's
    pytinyrenderer paths (io/image.py:58-104)."""
    from brax_tpu.io import image
    from brax_tpu.sim import config as cfg
    from brax_tpu.sim.types import QP

    n = 8
    data = tuple(
        0.3 * ((i // n) % 2) for i in range(n * n)
    )  # ridged terrain
    tet_verts = ((0, 0, 0), (0.6, 0, 0), (0, 0.6, 0), (0, 0, 0.6))
    tet_faces = (0, 1, 2, 0, 1, 3, 0, 2, 3, 1, 2, 3)
    config = cfg.Config(
        bodies=[
            cfg.Body(
                name="terrain",
                frozen=cfg.FrozenAxes(all=True),
                colliders=[cfg.Collider(heightmap=cfg.HeightMap(size=4.0, data=data))],
            ),
            cfg.Body(
                name="rock",
                colliders=[cfg.Collider(mesh=cfg.MeshRef(name="tet", scale=1.0))],
            ),
            cfg.Body(
                name="ball",
                colliders=[cfg.Collider(sphere=cfg.Sphere(radius=0.25))],
            ),
        ],
        mesh_geometries=[
            cfg.MeshGeometry(name="tet", vertices=tet_verts, faces=tet_faces)
        ],
        dt=0.02,
    )
    qp = QP(
        pos=jnp.array([[0.0, 0.0, 0.0], [1.5, 1.5, 0.35], [2.5, 1.0, 0.6]]),
        rot=jnp.tile(jnp.array([1.0, 0, 0, 0]), (3, 1)),
        vel=jnp.zeros((3, 3)),
        ang=jnp.zeros((3, 3)),
    )
    arr = image.render_array(config, qp, 64, 64, backend="sdf")
    assert arr.shape == (64, 64, 3) and arr.dtype == onp.uint8
    assert arr.std() > 5  # something visible
    # the heightmap ground occupies a region distinct from the sky color
    sky = onp.array([31, 33, 46])
    frac_sky = (onp.abs(arr.astype(int) - sky).sum(-1) < 12).mean()
    assert frac_sky < 0.95


def test_native_rasterizer_backend(ant_traj):
    """The C++ rasterizer (io/native, role parity with the reference's
    pytinyrenderer dep) renders the same scenes as the SDF path."""
    from brax_tpu.io import image, native

    if not native.available():
        pytest.skip("no host compiler for the native rasterizer")
    env, qps = ant_traj
    arr = image.render_array(env.art.config, qps[0], 96, 96, backend="raster")
    assert arr.shape == (96, 96, 3) and arr.dtype == onp.uint8
    assert arr.std() > 5
    # frame-to-frame rendering is fast (the build is cached): 50 frames
    import time

    t0 = time.perf_counter()
    for qp in qps * 10:
        image.render_array(env.art.config, qp, 96, 96, backend="raster")
    dt = time.perf_counter() - t0
    assert dt < 30.0, f"{dt:.1f}s for {len(qps) * 10} frames"


def test_native_rasterizer_heightmap_mesh():
    from brax_tpu.io import image, native
    from brax_tpu.sim import config as cfg
    from brax_tpu.sim.types import QP

    if not native.available():
        pytest.skip("no host compiler for the native rasterizer")
    n = 8
    data = tuple(0.3 * ((i // n) % 2) for i in range(n * n))
    tv = ((0, 0, 0), (0.6, 0, 0), (0, 0.6, 0), (0, 0, 0.6))
    tf = (0, 1, 2, 0, 1, 3, 0, 2, 3, 1, 2, 3)
    config = cfg.Config(
        bodies=[
            cfg.Body(name="terrain", frozen=cfg.FrozenAxes(all=True),
                     colliders=[cfg.Collider(heightmap=cfg.HeightMap(size=4.0, data=data))]),
            cfg.Body(name="rock",
                     colliders=[cfg.Collider(mesh=cfg.MeshRef(name="tet", scale=1.0))]),
        ],
        mesh_geometries=[cfg.MeshGeometry(name="tet", vertices=tv, faces=tf)],
        dt=0.02,
    )
    qp = QP(
        pos=jnp.array([[0.0, 0.0, 0.0], [1.5, 1.5, 0.35]]),
        rot=jnp.tile(jnp.array([1.0, 0, 0, 0]), (2, 1)),
        vel=jnp.zeros((2, 3)), ang=jnp.zeros((2, 3)),
    )
    arr = image.render_array(config, qp, 64, 64, backend="raster")
    assert arr.std() > 5
