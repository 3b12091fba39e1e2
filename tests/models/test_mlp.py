import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keras_nerf_tpu.models import MLPConfig, apply_mlp, init_mlp, param_count


@pytest.fixture
def config():
    return MLPConfig(n_layers=8, dense_units=256, skip_layer=4)


def test_skip_indices(config):
    assert config.skip_indices() == (4,)
    assert MLPConfig(n_layers=10, skip_layer=3).skip_indices() == (3, 6, 9)


def test_output_shapes(config):
    params = init_mlp(jax.random.PRNGKey(0), config, 63, 27)
    xyz = jax.random.uniform(jax.random.PRNGKey(1), (1024, 32, 63))
    dirs = jax.random.uniform(jax.random.PRNGKey(2), (1024, 32, 27))
    rgb, sigma = apply_mlp(params, xyz, dirs, config)
    assert rgb.shape == (1024, 32, 3)
    assert sigma.shape == (1024, 32, 1)
    assert rgb.dtype == jnp.float32 and sigma.dtype == jnp.float32


def test_output_ranges(config):
    params = init_mlp(jax.random.PRNGKey(0), config, 63, 27)
    xyz = jax.random.normal(jax.random.PRNGKey(1), (64, 8, 63))
    dirs = jax.random.normal(jax.random.PRNGKey(2), (64, 8, 27))
    rgb, sigma = apply_mlp(params, xyz, dirs, config)
    r = np.asarray(rgb)
    s = np.asarray(sigma)
    assert (r > 0).all() and (r < 1).all()   # sigmoid head
    assert (s >= 0).all()                     # relu head


def test_param_count_matches_architecture(config):
    params = init_mlp(jax.random.PRNGKey(0), config, 63, 27)
    # trunk: 63*256+256, 3x(256*256+256), skip at 4 -> layer 5 in: 319
    want = (63 * 256 + 256)
    want += 4 * (256 * 256 + 256)        # layers 1-4
    want += (319 * 256 + 256)            # layer 5 after skip concat
    want += 2 * (256 * 256 + 256)        # layers 6-7
    # heads read the post-trunk width (256)
    want += 256 * 1 + 1                  # sigma
    want += 256 * 256 + 256              # features
    want += (256 + 27) * 128 + 128       # rgb_features
    want += 128 * 3 + 3                  # rgb
    assert param_count(params) == want


def test_skip_concat_width(config):
    """The layer after a skip sees dense_units + in_xyz inputs."""
    params = init_mlp(jax.random.PRNGKey(0), config, 63, 27)
    assert params["trunk"][5]["kernel"].shape == (256 + 63, 256)
    assert params["trunk"][4]["kernel"].shape == (256, 256)


def test_deterministic_init_and_apply(config):
    p1 = init_mlp(jax.random.PRNGKey(0), config, 63, 27)
    p2 = init_mlp(jax.random.PRNGKey(0), config, 63, 27)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grads_flow_everywhere(config):
    params = init_mlp(jax.random.PRNGKey(0), config, 63, 27)
    xyz = jax.random.normal(jax.random.PRNGKey(1), (32, 4, 63))
    dirs = jax.random.normal(jax.random.PRNGKey(2), (32, 4, 27))

    def loss(p):
        rgb, sigma = apply_mlp(p, xyz, dirs, config)
        return jnp.mean(rgb ** 2) + jnp.mean(sigma)

    grads = jax.jit(jax.grad(loss))(params)
    for path, g in jax.tree_util.tree_leaves_with_path(grads):
        arr = np.asarray(g)
        assert np.isfinite(arr).all(), path
    # The rgb-path grads must be nonzero.
    assert np.abs(np.asarray(grads["rgb"]["kernel"])).sum() > 0
    assert np.abs(np.asarray(grads["trunk"][0]["kernel"])).sum() > 0


def test_bfloat16_compute_close_to_fp32(config):
    params = init_mlp(jax.random.PRNGKey(0), config, 63, 27)
    xyz = jax.random.normal(jax.random.PRNGKey(1), (16, 4, 63))
    dirs = jax.random.normal(jax.random.PRNGKey(2), (16, 4, 27))
    rgb32, sig32 = apply_mlp(params, xyz, dirs, config, jnp.float32)
    rgb16, sig16 = apply_mlp(params, xyz, dirs, config, jnp.bfloat16)
    assert rgb16.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(rgb32), np.asarray(rgb16), atol=0.1)


def test_jit_apply(config):
    params = init_mlp(jax.random.PRNGKey(0), config, 63, 27)
    f = jax.jit(lambda p, x, d: apply_mlp(p, x, d, config))
    rgb, sigma = f(params,
                   jnp.ones((8, 2, 63)), jnp.ones((8, 2, 27)))
    assert rgb.shape == (8, 2, 3)
