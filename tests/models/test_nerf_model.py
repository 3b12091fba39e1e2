import os

import numpy as np
import pytest

from keras_nerf_tpu.data import DatasetLoader, write_synthetic_scene
from keras_nerf_tpu.models import NeRF


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    out = tmp_path_factory.mktemp("scene")
    return write_synthetic_scene(
        str(out), image_wh=16, n_train=4, n_val=2, n_test=2)


@pytest.fixture(scope="module")
def datasets(scene):
    return DatasetLoader(scene).load_dataset(
        batch_size=2, image_width=16, image_height=16,
        near=2.0, far=6.0, n_sample=8)


def small_nerf():
    return NeRF(n_coarse=8, n_fine=8, pos_emb_xyz=4, pos_emb_dir=2,
                n_layers=2, dense_units=16, skip_layer=1)


def test_compile_clamps_ray_chunks(datasets):
    model = small_nerf()
    model.compile(batch_size=2, image_height=16, image_width=16,
                  ray_chunks=10_000)
    assert model.ray_chunks == 2 * 16 * 16
    assert model.sequential_chunks == 1


def test_compile_asserts_divisibility():
    model = small_nerf()
    with pytest.raises(AssertionError):
        model.compile(batch_size=1, image_height=16, image_width=16,
                      ray_chunks=100)


def test_fit_and_metrics(datasets):
    train, val, _ = datasets
    model = small_nerf()
    model.compile(batch_size=2, image_height=16, image_width=16,
                  ray_chunks=128, learning_rate=5e-3)
    history = model.fit(train, validation_data=val, epochs=3, verbose=False)
    assert len(history) == 3
    for k in ["coarse_loss", "fine_loss", "val_coarse_loss", "val_fine_loss",
              "coarse_psnr", "fine_ssim", "val_fine_psnr"]:
        assert k in history[0]
        assert np.isfinite(history[-1][k])
    # Training reduces loss on this easy scene.
    assert history[-1]["fine_loss"] < history[0]["fine_loss"]


def test_predict_and_render_images(datasets):
    train, _, _ = datasets
    model = small_nerf()
    model.compile(batch_size=2, image_height=16, image_width=16,
                  ray_chunks=128)
    _, rays = next(iter(train))
    out_c, out_f = model.predict_and_render_images(rays)
    assert out_c["image"].shape == (2, 16, 16, 3)
    assert out_f["depth"].shape == (2, 16, 16)
    img = np.asarray(out_f["image"])
    assert img.min() >= 0.0 and img.max() <= 1.0


def test_training_is_deterministic(scene):
    """Same seeds => bit-identical metrics across runs (explicit PRNG-key
    threading; the reference's implicit TF RNG cannot guarantee this).
    The dataset must be rebuilt per run — its epoch counter advancing is
    part of the RNG state."""
    def run():
        train, _, _ = DatasetLoader(scene).load_dataset(
            batch_size=2, image_width=16, image_height=16,
            near=2.0, far=6.0, n_sample=8, seed=7)
        model = small_nerf()
        model.compile(batch_size=2, image_height=16, image_width=16,
                      ray_chunks=128, seed=7)
        history = model.fit(train, epochs=2, verbose=False)
        return history[-1]["fine_loss"]

    assert run() == run()


def test_evaluate(datasets):
    _, _, test = datasets
    model = small_nerf()
    model.compile(batch_size=2, image_height=16, image_width=16,
                  ray_chunks=128)
    metrics = model.evaluate(test)
    for k in ["coarse_loss", "fine_psnr", "fine_ssim"]:
        assert np.isfinite(metrics[k])


def test_save_load_round_trip(tmp_path, datasets):
    train, _, _ = datasets
    model = small_nerf()
    model.compile(batch_size=2, image_height=16, image_width=16,
                  ray_chunks=128)
    batch = next(iter(train))
    model.train_step(batch)
    path = str(tmp_path / "ckpt")
    model.save_model(path)
    assert os.path.exists(os.path.join(path, "model_config.json"))
    assert os.path.exists(os.path.join(path, "coarse.msgpack"))
    assert os.path.exists(os.path.join(path, "fine.msgpack"))
    assert os.path.exists(os.path.join(path, "optimizer.msgpack"))

    # Reload into a fresh model purely from model_path (inference ctor path).
    model2 = NeRF(model_path=path)
    assert model2.config.n_coarse == 8
    model2.compile(batch_size=2, image_height=16, image_width=16,
                   ray_chunks=128, is_training=False)
    _, rays = batch
    a = np.asarray(model.predict_and_render_images(rays)[1]["image"])
    b = np.asarray(model2.predict_and_render_images(rays)[1]["image"])
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_resume_restores_optimizer_state(tmp_path, datasets):
    train, _, _ = datasets
    model = small_nerf()
    model.compile(batch_size=2, image_height=16, image_width=16,
                  ray_chunks=128)
    batch = next(iter(train))
    for _ in range(3):
        model.train_step(batch)
    path = str(tmp_path / "ckpt")
    model.save_model(path)

    model2 = NeRF(model_path=path)
    model2.compile(batch_size=2, image_height=16, image_width=16,
                   ray_chunks=128)
    assert int(model2.state.step) == 3
    # Adam moments restored (non-zero after 3 steps).
    import jax
    mu_leaves = jax.tree.leaves(model2.state.coarse_opt)
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in mu_leaves
               if hasattr(l, "shape") and getattr(l, "size", 0) > 1)


def test_resume_warns_on_train_config_mismatch(tmp_path, datasets, caplog):
    """A resume launched with different lr-schedule flags than the run that
    wrote the checkpoint must WARN per mismatched key (the silent variant
    resets the schedule to the new flags AND drops the optimizer state —
    the exact footgun train_config.json exists to catch)."""
    import logging

    train, _, _ = datasets
    model = small_nerf()
    model.compile(batch_size=2, image_height=16, image_width=16,
                  ray_chunks=128, learning_rate=5e-4, lr_final=5e-6,
                  lr_decay_steps=100)
    model.train_step(next(iter(train)))
    path = str(tmp_path / "ckpt")
    model.save_model(path)
    assert os.path.exists(os.path.join(path, "train_config.json"))

    model2 = NeRF(model_path=path)
    with caplog.at_level(logging.WARNING):
        model2.compile(batch_size=2, image_height=16, image_width=16,
                       ray_chunks=128)  # default lr=1e-3, no schedule
    text = caplog.text
    assert "resume hyperparameter mismatch" in text
    for key in ("learning_rate", "lr_final", "lr_decay_steps"):
        assert key in text

    # Matching flags: no warning.
    model3 = NeRF(model_path=path)
    caplog.clear()
    with caplog.at_level(logging.WARNING):
        model3.compile(batch_size=2, image_height=16, image_width=16,
                       ray_chunks=128, learning_rate=5e-4, lr_final=5e-6,
                       lr_decay_steps=100)
    assert "resume hyperparameter mismatch" not in caplog.text


def test_weights_only_save(tmp_path, datasets):
    model = small_nerf()
    model.compile(batch_size=2, image_height=16, image_width=16,
                  ray_chunks=128)
    path = str(tmp_path / "w_only")
    model.save_model(path, weights_only=True)
    assert not os.path.exists(os.path.join(path, "model_config.json"))
    assert os.path.exists(os.path.join(path, "coarse.msgpack"))
