"""Occupancy-grid rendering tier (`ops/occupancy.py`): bake, ray probing,
occupied-space sampling, and the full render path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keras_nerf_tpu.models import engine
from keras_nerf_tpu.models.engine import NeRFConfig
from keras_nerf_tpu.ops.occupancy import (
    bake_occupancy_grid,
    occupancy_along_rays,
    render_image_batch_occ,
    sample_occupied,
)


def sphere_density(p):
    """Analytic unit sphere at the origin, sigma = 100 inside."""
    return jnp.where(jnp.linalg.norm(p, axis=-1) < 1.0, 100.0, 0.0)


@pytest.fixture(scope="module")
def grid():
    return bake_occupancy_grid(sphere_density, grid_size=32, dilate=1)


def test_bake_marks_the_sphere(grid):
    # Unit sphere volume / [-2, 2]^3 volume = (4/3 pi) / 64 ~ 6.5%;
    # dilation adds a shell.
    frac = float(grid.mean())
    assert 0.05 < frac < 0.18
    # Center voxel occupied, corner voxel empty.
    assert float(grid[16, 16, 16]) == 1.0
    assert float(grid[0, 0, 0]) == 0.0


def test_dilate_iterations_grow_the_shell():
    """`dilate=k` is a k-step 6-neighbourhood dilation: a single occupied
    voxel becomes the L1 ball of radius k (|dx|+|dy|+|dz| <= k). This is
    the `--occupancy_train_dilate` contract: k voxels of slack around
    thin/sub-voxel geometry (docs/QUALITY.md hard-scene A/B)."""
    from keras_nerf_tpu.ops.occupancy import dilate_occupancy

    occ = jnp.zeros((9, 9, 9), jnp.float32).at[4, 4, 4].set(1.0)
    # |L1 ball of radius k| = 1, 7, 25 for k = 0, 1, 2.
    assert float(dilate_occupancy(occ, 0).sum()) == 1.0
    one = dilate_occupancy(occ, 1)
    assert float(one.sum()) == 7.0
    two = dilate_occupancy(occ, 2)
    assert float(two.sum()) == 25.0
    # Dilation only grows: every voxel of the smaller shell survives.
    assert float((two - one).min()) == 0.0


def test_samples_land_inside_occupied_span(grid):
    # Rays from (0, 0, 4) looking along -z hit the sphere for t in [3, 5].
    r = 8
    o = jnp.tile(jnp.asarray([0.0, 0.0, 4.0]), (r, 1))
    d = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (r, 1))
    mids, occ = occupancy_along_rays(o, d, grid, 2.0, 6.0, 128)
    assert mids.shape == occ.shape == (r, 128)
    # Occupancy is ~0 before t=3 and after t=5 (one probe bin + one dilated
    # voxel of slack = ~0.2).
    m = np.asarray(mids[0])
    oc = np.asarray(occ[0])
    assert oc[m < 2.7].max() == 0.0
    assert oc[(m > 3.2) & (m < 4.8)].min() == 1.0
    assert oc[m > 5.3].max() == 0.0

    pts = sample_occupied(jax.random.PRNGKey(0), mids, occ, 32)
    assert pts.shape == (r, 32)
    p = np.asarray(pts)
    assert (p > 2.6).all() and (p < 5.4).all()
    assert (np.diff(p, axis=-1) >= 0).all()  # sorted


def test_missing_ray_degrades_to_uniform(grid):
    # A ray that misses the sphere entirely: all-empty occupancy must not
    # NaN — the +1e-5 stabilizer spreads samples over [near, far].
    o = jnp.asarray([[1.9, 1.9, 4.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    mids, occ = occupancy_along_rays(o, d, grid, 2.0, 6.0, 64)
    assert float(occ.max()) == 0.0
    pts = sample_occupied(jax.random.PRNGKey(1), mids, occ, 16)
    p = np.asarray(pts)
    assert np.isfinite(p).all()
    assert p.min() > 2.0 and p.max() < 6.0
    assert np.ptp(p) > 1.0  # actually spread out, not collapsed


def test_render_image_batch_occ_runs(grid):
    cfg = NeRFConfig(n_coarse=8, n_fine=8, pos_emb_xyz=4, pos_emb_dir=2,
                     n_layers=2, dense_units=32, skip_layer=1,
                     white_background=True)
    _, fine = engine.init_params(jax.random.PRNGKey(0), cfg)
    b, h, w = 1, 8, 8
    o = jnp.tile(jnp.asarray([0.0, 0.0, 4.0]), (b, h, w, 1))
    d = jax.random.normal(jax.random.PRNGKey(1), (b, h, w, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 8), (b, h, w, 8))
    out = render_image_batch_occ(fine, (o, d, t), grid,
                                 jax.random.PRNGKey(2), cfg,
                                 n_samples=8, n_probe=32, ray_chunks=32)
    assert out["image"].shape == (b, h, w, 3)
    assert out["depth"].shape == (b, h, w)
    assert np.isfinite(np.asarray(out["image"])).all()


def test_render_image_batch_occ_fused_sampling_matches_xla(grid,
                                                           monkeypatch):
    """With the Pallas kernels on, the occupancy render's inverse-CDF
    runs in the fine kernel's prologue; it must agree with the XLA
    sample_occupied route (same key -> same draws)."""
    cfg = NeRFConfig(n_coarse=8, n_fine=8, n_layers=2, dense_units=256,
                     skip_layer=4, white_background=True, use_pallas=True)
    _, fine = engine.init_params(jax.random.PRNGKey(0), cfg)
    b, h, w = 1, 4, 8
    o = jnp.tile(jnp.asarray([0.0, 0.0, 4.0]), (b, h, w, 1))
    d = jax.random.normal(jax.random.PRNGKey(1), (b, h, w, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 8), (b, h, w, 8))

    def run():
        return render_image_batch_occ(
            fine, (o, d, t), grid, jax.random.PRNGKey(2), cfg,
            n_samples=8, n_probe=32, ray_chunks=32)

    assert engine._fused_sampling_ok(cfg)
    fused = run()
    monkeypatch.setenv("KNT_NO_FUSED_SAMPLING", "1")
    # The env gate is read at TRACE time and render_image_batch_occ is
    # jitted — drop the cached trace so the XLA route actually compiles.
    jax.clear_caches()
    xla = run()
    np.testing.assert_allclose(np.asarray(fused["image"]),
                               np.asarray(xla["image"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(fused["depth"]),
                               np.asarray(xla["depth"]), atol=5e-3)


def test_nerf_bake_and_render_occupancy():
    from keras_nerf_tpu.models import NeRF

    model = NeRF(n_coarse=8, n_fine=8, pos_emb_xyz=4, pos_emb_dir=2,
                 n_layers=2, dense_units=32, skip_layer=1)
    model.compile(batch_size=1, image_height=8, image_width=8,
                  ray_chunks=64)
    model.bake_occupancy(grid_size=16, sigma_threshold=0.1, dilate=0)
    assert model.occ_grid.shape == (16, 16, 16)

    b, h, w = 1, 8, 8
    o = jnp.tile(jnp.asarray([0.0, 0.0, 4.0]), (b, h, w, 1))
    d = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (b, h, w, 1))
    t = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 8), (b, h, w, 8))
    out = model.render_occupancy((o, d, t), n_samples=8, n_probe=32)
    assert out["image"].shape == (b, h, w, 3)
    assert np.isfinite(np.asarray(out["image"])).all()


def test_density_fn_handles_non_chunk_multiple_grids():
    """Grids whose point counts are not multiples of the eval chunk (e.g.
    96^3) must bake fine via the padded last chunk."""
    from keras_nerf_tpu.ops.occupancy import model_density_fn

    cfg = NeRFConfig(n_coarse=8, n_fine=8, pos_emb_xyz=4, pos_emb_dir=2,
                     n_layers=2, dense_units=32, skip_layer=1)
    _, fine = engine.init_params(jax.random.PRNGKey(0), cfg)
    density = model_density_fn(fine, cfg, use_pallas=False, chunk=1000)
    grid = bake_occupancy_grid(density, grid_size=12, sigma_threshold=0.1,
                               dilate=0)  # 12^3 = 1728, not % 1000
    assert grid.shape == (12, 12, 12)
    assert np.isfinite(np.asarray(grid)).all()


# ---------------------------------------------------------------------------
# --occupancy_aabb on a scene that NEEDS it (VERDICT r4 #7): the scale-2
# spheres scene pushes its outer spheres past the default [-2, 2]^3 grid
# box, so the flag's documented failure mode (geometry outside the box is
# culled to background, inference.py --occupancy_aabb help) is demonstrable,
# and the corrected box restores visibility. The PSNR-level restoration is
# the measured TPU demo (scripts/run_aabb_demo.sh, docs/QUALITY.md).

def test_render_pose_scale_is_world_scale_only():
    """A uniformly scaled world viewed from the matching scaled orbit
    renders the IDENTICAL image — scale changes training coordinates,
    never pixels (what makes scaled scenes a controlled AABB fixture)."""
    from keras_nerf_tpu.data.synthetic import render_pose
    from keras_nerf_tpu.data.utils import pose_spherical

    base = render_pose(np.asarray(pose_spherical(35.0, -25.0, 4.0)), 32)
    scaled = render_pose(np.asarray(pose_spherical(35.0, -25.0, 8.0)), 32,
                         scale=2.0)
    np.testing.assert_allclose(scaled, base, atol=1e-6)


def _scaled_spheres_density(scale):
    from keras_nerf_tpu.data.synthetic import _SPHERES

    def density(p):
        sigma = jnp.zeros(p.shape[:-1])
        for center, radius, _ in _SPHERES:
            c = jnp.asarray(center, jnp.float32) * scale
            hit = jnp.linalg.norm(p - c, axis=-1) < radius * scale
            sigma = jnp.where(hit, 100.0, sigma)
        return sigma

    return density


def test_occupancy_aabb_scaled_scene_default_box_culls():
    """Scale-2 spheres: the second sphere spans x in [1.4, 2.5]. A ray
    through its out-of-box part (x = 2.2 > 2) reads EMPTY at every probe
    under the default AABB — rendered as background — while the correct
    scaled box sees it and places the sampled depths across the analytic
    hit interval."""
    density = _scaled_spheres_density(2.0)
    aabb_ok = ((-3.0, -3.0, -3.0), (3.0, 3.0, 3.0))
    grid_default = bake_occupancy_grid(density, grid_size=64, dilate=0)
    grid_ok = bake_occupancy_grid(density, grid_size=64, dilate=0,
                                  aabb=aabb_ok)

    # Ray straight down -z through (2.2, 1.6, *): inside sphere 2 (scaled
    # center (1.6, 1.6, 0.6), radius 0.9: |(2.2,1.6,0.6)-c| = 0.6 < 0.9)
    # and outside the default box (x = 2.2 > 2) at every depth.
    origin = jnp.asarray([[2.2, 1.6, 4.6]])
    direction = jnp.asarray([[0.0, 0.0, -1.0]])
    mids, occ_def = occupancy_along_rays(origin, direction, grid_default,
                                         near=2.0, far=6.0, n_probe=64)
    _, occ_ok = occupancy_along_rays(origin, direction, grid_ok,
                                     near=2.0, far=6.0, n_probe=64,
                                     aabb=aabb_ok)
    assert float(occ_def.sum()) == 0.0, (
        "default box must cull out-of-box geometry (reads empty)")
    assert float(occ_ok.sum()) > 0.0

    # Occupied probes under the corrected box bracket the analytic hit:
    # the ray meets the sphere where z in 0.6 +/- sqrt(0.9^2 - 0.6^2),
    # i.e. t in [4.6 - 1.27, 4.6 + 0.07] ~ [3.33, 4.67].
    hit = np.asarray(mids)[np.asarray(occ_ok) > 0]
    assert hit.min() > 3.0 and hit.max() < 5.0

    # And sample_occupied concentrates its draws there (vs the all-empty
    # default-box fallback, which degrades to a uniform [near, far] spread).
    t_ok = sample_occupied(jax.random.PRNGKey(0), mids, occ_ok, 32)
    t_def = sample_occupied(jax.random.PRNGKey(0), mids, occ_def, 32)
    frac_in = lambda t: float(np.mean(  # noqa: E731
        (np.asarray(t) > 3.3) & (np.asarray(t) < 4.7)))
    assert frac_in(t_ok) > 0.95
    assert frac_in(t_def) < 0.6  # uniform spread over [2, 6] ~ 0.35
