import os

import numpy as np
import pytest

from keras_nerf_tpu.data import DatasetLoader, load_image, write_synthetic_scene


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    out = tmp_path_factory.mktemp("scene")
    return write_synthetic_scene(
        str(out), image_wh=32, n_train=6, n_val=2, n_test=2)


def test_scene_layout(scene):
    for split in ["train", "val", "test"]:
        assert os.path.exists(os.path.join(scene, f"transforms_{split}.json"))
    assert os.path.exists(os.path.join(scene, "train", "r_0.png"))


def test_scene_images_nontrivial(scene):
    img = load_image(os.path.join(scene, "train", "r_0.png"), 32, 32)
    assert img.shape == (32, 32, 4)
    assert img.dtype == np.float32
    assert img.min() >= 0.0 and img.max() <= 1.0
    # The sphere occupies part of the frame: some opaque, some empty pixels.
    alpha = img[..., 3]
    assert 0.05 < alpha.mean() < 0.95


def test_image_loader_white_background(scene):
    path = os.path.join(scene, "train", "r_0.png")
    black = load_image(path, 32, 32, white_background=False)
    white = load_image(path, 32, 32, white_background=True)
    empty = black[..., 3] < 0.5
    # Empty pixels: black bg -> 0, white bg -> 1.
    assert np.allclose(black[empty][:, :3], 0.0, atol=1e-5)
    assert np.allclose(white[empty][:, :3], 1.0, atol=1e-5)
    # Occupied pixels identical under both backgrounds.
    occ = black[..., 3] > 0.99
    np.testing.assert_allclose(black[occ], white[occ], atol=1e-6)


def test_image_loader_resize(scene):
    img = load_image(os.path.join(scene, "train", "r_0.png"), 16, 16)
    assert img.shape == (16, 16, 4)


def test_dataset_loader_splits(scene):
    train, val, test = DatasetLoader(scene).load_dataset(
        batch_size=2, image_width=32, image_height=32,
        near=2.0, far=6.0, n_sample=8)
    assert train.num_examples == 6
    assert val.num_examples == 2
    assert test.num_examples == 2
    assert len(train) == 3  # 6 images / batch 2

    images, (ray_o, ray_d, points) = next(iter(train))
    assert images.shape == (2, 32, 32, 4)
    assert ray_o.shape == (2, 32, 32, 3)
    assert ray_d.shape == (2, 32, 32, 3)
    assert points.shape == (2, 32, 32, 8)


def test_dataset_shuffle_changes_order_but_jitter_fresh(scene):
    train, _, _ = DatasetLoader(scene).load_dataset(
        batch_size=2, image_width=32, image_height=32,
        near=2.0, far=6.0, n_sample=8)
    b1 = np.concatenate(
        [np.asarray(img).sum(axis=(1, 2, 3)) for img, _ in train])
    b2 = np.concatenate(
        [np.asarray(img).sum(axis=(1, 2, 3)) for img, _ in train])
    # Same multiset of images across epochs (shuffle only permutes).
    np.testing.assert_allclose(sorted(b1), sorted(b2), rtol=1e-6)
    # Jitter differs per epoch.
    p1 = np.asarray(next(iter(train))[1][2])
    p2 = np.asarray(next(iter(train))[1][2])
    assert not np.allclose(p1, p2)


def test_dataset_drop_remainder(scene):
    train, _, _ = DatasetLoader(scene).load_dataset(
        batch_size=4, image_width=32, image_height=32,
        near=2.0, far=6.0, n_sample=8)
    assert len(train) == 1  # 6 // 4
    batches = list(train)
    assert len(batches) == 1


def test_synthetic_view_consistency(scene):
    """The same scene rendered from a pose via the library equals the PNG on
    disk for that pose — geometry/pose plumbing agrees end to end."""
    import json

    from keras_nerf_tpu.data import render_pose
    with open(os.path.join(scene, "transforms_train.json")) as f:
        meta = json.load(f)
    frame = meta["frames"][0]
    c2w = np.asarray(frame["transform_matrix"], dtype=np.float32)
    want = load_image(os.path.join(scene, "train", "r_0.png"), 32, 32)
    got = render_pose(c2w, 32)
    # PNG round-trip quantizes to 1/255.
    np.testing.assert_allclose(got, want, atol=1 / 255 + 1e-6)


def test_seed_controls_data_rng(scene):
    """--seed must actually steer the data RNG (ADVICE.md round 1: it was
    silently dropped): different seeds -> different shuffle order / jitter;
    same seed -> identical batches; rebatch() preserves the seed."""
    def first_epoch(seed):
        train, _, _ = DatasetLoader(scene).load_dataset(
            batch_size=2, image_width=32, image_height=32,
            near=2.0, far=6.0, n_sample=8, seed=seed)
        return [(np.asarray(img), np.asarray(rays[2]))
                for img, rays in train]

    a = first_epoch(1)
    b = first_epoch(1)
    c = first_epoch(2)
    for (img_a, t_a), (img_b, t_b) in zip(a, b):
        np.testing.assert_array_equal(img_a, img_b)
        np.testing.assert_array_equal(t_a, t_b)
    assert any(not np.array_equal(t_a, t_c) for (_, t_a), (_, t_c)
               in zip(a, c))

    train, _, _ = DatasetLoader(scene).load_dataset(
        batch_size=2, image_width=32, image_height=32,
        near=2.0, far=6.0, n_sample=8, seed=7)
    assert train.rebatch(1).seed == train.seed


def test_resize_method_antialias_bilinear(scene):
    """The tf-parity resize path loads and produces valid pixels."""
    path = os.path.join(scene, "train", "r_0.png")
    img = load_image(path, 16, 16, resize_method="antialias-bilinear")
    assert img.shape == (16, 16, 4)
    assert img.min() >= 0.0 and img.max() <= 1.0
    lanczos = load_image(path, 16, 16, resize_method="lanczos")
    assert not np.allclose(img, lanczos)  # genuinely different filters
    with pytest.raises(ValueError):
        load_image(path, 16, 16, resize_method="nearest")


@pytest.fixture(scope="module")
def hard_scene(tmp_path_factory):
    out = tmp_path_factory.mktemp("hard_scene")
    return write_synthetic_scene(
        str(out), image_wh=48, n_train=4, n_val=2, n_test=2, scene="hard")


def test_hard_scene_writes_and_loads(hard_scene):
    """The adversarial fixture (VERDICT r3 #2) produces a loadable
    Blender-format scene with substantial foreground coverage."""
    for split in ["train", "val", "test"]:
        assert os.path.exists(
            os.path.join(hard_scene, f"transforms_{split}.json"))
    img = load_image(os.path.join(hard_scene, "train", "r_0.png"), 48, 48)
    assert 0.2 < img[..., 3].mean() < 0.95
    train, _, _ = DatasetLoader(hard_scene).load_dataset(
        batch_size=2, image_width=48, image_height=48,
        near=2.0, far=6.0, n_sample=8)
    assert train.num_examples == 4


def test_hard_scene_view_consistency(hard_scene):
    """render_pose(scene='hard') equals the PNG written for that pose."""
    import json

    from keras_nerf_tpu.data import render_pose
    with open(os.path.join(hard_scene, "transforms_train.json")) as f:
        meta = json.load(f)
    c2w = np.asarray(meta["frames"][0]["transform_matrix"], dtype=np.float32)
    want = load_image(os.path.join(hard_scene, "train", "r_0.png"), 48, 48)
    got = render_pose(c2w, 48, scene="hard")
    np.testing.assert_allclose(got, want, atol=1 / 255 + 1e-6)


def test_hard_scene_adversarial_properties():
    """The fixture has the properties VERDICT r3 #2 asked for: sub-voxel
    rods at a 128^3 grid over the default AABB, high-frequency checker
    radiance, cast shadows, and a view-dependent specular lobe."""
    from keras_nerf_tpu.data import synthetic
    from keras_nerf_tpu.data.synthetic import render_pose
    from keras_nerf_tpu.data.utils import pose_spherical
    from keras_nerf_tpu.ops.occupancy import DEFAULT_AABB

    # (a) rod thickness < one voxel of a 128^3 grid over the default AABB.
    voxel = (DEFAULT_AABB[1][0] - DEFAULT_AABB[0][0]) / 128.0
    assert 2 * synthetic._HARD_ROD_HALF < voxel

    rgba = render_pose(pose_spherical(30.0, -30.0, 4.0), 128,
                       supersample=2, scene="hard")
    rgb, alpha = rgba[..., :3], rgba[..., 3]

    # (b) thin rods actually render: yellow-ish pixels (r,g high, b low)
    # exist but cover well under 5% of the frame.
    rod = (rgb[..., 0] > 0.4) & (rgb[..., 1] > 0.3) & (rgb[..., 2] < 0.2) \
        & (alpha > 0.5)
    assert 0 < rod.mean() < 0.05

    # (c) checkerboard: the plane shows BOTH albedos, and adjacent-pixel
    # contrast on the lower third of the image is high (high-frequency).
    lower = rgb[96:, :, :]
    bright = (lower.min(axis=-1) > 0.5).mean()
    dark = (lower.max(axis=-1) < 0.25).mean()
    assert bright > 0.05 and dark > 0.05
    grad = np.abs(np.diff(lower.mean(axis=-1), axis=1))
    assert (grad > 0.3).mean() > 0.02  # many hard transitions per row

    # (d) cast shadows: white checker squares appear at two distinct
    # brightness levels (lit vs shadowed) in the same image.
    # shadowed white ~= 0.30 * 0.92 = 0.28, lit white up to ~0.9; the dark
    # checker tops out ~0.12, so > 0.2 selects white squares in BOTH states.
    white_sq = (rgb[..., 0] > 0.2) & (np.abs(rgb[..., 0] - rgb[..., 1])
                                      < 0.05) & (alpha > 0.5)
    levels = rgb[..., 0][white_sq]
    assert levels.max() - levels.min() > 0.3

    # (e) view-dependent specular: a whitened highlight exists on the red
    # sphere from this view (green/blue lifted far above the diffuse cap).
    highlight = (rgb[..., 0] > 0.85) & (rgb[..., 1] > 0.5) & (
        rgb[..., 2] > 0.4)
    assert highlight.any()


def test_supersampled_gt_is_registered_to_base_pixels():
    """The supersampled box filter must be CENTERED on each base pixel's
    ray: a head-on view of the origin-centered sphere renders a symmetric
    silhouette (the old +k/ss sub-sampling shifted GT ~0.4 px toward +x/+y,
    breaking registration with data/rays.py's no-offset rays)."""
    import numpy as np

    from keras_nerf_tpu.data import synthetic
    from keras_nerf_tpu.data.synthetic import render_pose
    from keras_nerf_tpu.data.utils import pose_spherical

    c2w = np.asarray(pose_spherical(180.0, -90.0, 4.0))  # straight down
    orig_spheres = synthetic._SPHERES
    try:
        # Only the origin-centered sphere: the off-center ones would break
        # the symmetry this test relies on.
        synthetic._SPHERES = (orig_spheres[0],)
        rgba = render_pose(c2w, 32, supersample=4)
    finally:
        synthetic._SPHERES = orig_spheres
    alpha = rgba[..., 3]
    # Mirror symmetry of the alpha silhouette about the image center,
    # accounting for the half-pixel parity of an even-sized image: pixel i
    # mirrors to (W-1) - i only if the scene projects symmetrically about
    # (W-1)/2... the sphere center projects to pixel W/2 exactly (no
    # half-pixel offset convention), so compare i <-> (W - i) instead.
    flipped = alpha[:, ::-1]
    shifted = np.roll(flipped, 1, axis=1)  # aligns mirror at column W/2
    diff = np.abs(alpha[:, 1:] - shifted[:, 1:]).mean()
    assert diff < 0.02, diff
