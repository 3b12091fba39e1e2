"""Monitor callback + CLI end-to-end tests (hermetic, CPU).

The reference left its callback and CLIs untested (SURVEY.md §4); these run
the real `run_training` flow in-process on the synthetic scene.
"""

import csv
import os
import sys

import numpy as np
import pytest

from keras_nerf_tpu.data import DatasetLoader, write_synthetic_scene
from keras_nerf_tpu.models import NeRF
from keras_nerf_tpu.utils.monitor import NeRFTrainMonitor

REPO = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    out = tmp_path_factory.mktemp("scene")
    return write_synthetic_scene(
        str(out), image_wh=16, n_train=4, n_val=2, n_test=2)


def test_monitor_full_cycle(tmp_path, scene):
    train, val, test = DatasetLoader(scene).load_dataset(
        batch_size=2, image_width=16, image_height=16,
        near=2.0, far=6.0, n_sample=8)
    log_dir = str(tmp_path / "logs")

    model = NeRF(n_coarse=8, n_fine=8, pos_emb_xyz=4, pos_emb_dir=2,
                 n_layers=2, dense_units=16, skip_layer=1)
    model.compile(batch_size=2, image_height=16, image_width=16,
                  ray_chunks=512)
    monitor = NeRFTrainMonitor(dataset=test, log_dir=log_dir, batch_size=2,
                               update_freq=1)
    model.fit(train, validation_data=val, epochs=2, callbacks=[monitor],
              verbose=False)

    # CSV rows with the expected schema.
    with open(os.path.join(log_dir, "log.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2
    assert {"epoch", "coarse_loss", "fine_loss", "val_coarse_loss",
            "val_fine_loss"} <= set(rows[0])

    # Panels + periodic checkpoint.
    assert os.path.exists(os.path.join(log_dir, "test_0_0.png"))
    assert os.path.exists(os.path.join(log_dir, "test_sample_0_1.png"))
    assert os.path.exists(os.path.join(log_dir, "model", "coarse.msgpack"))
    assert os.path.exists(os.path.join(log_dir, "model",
                                       "model_config.json"))

    # Resume: a fresh monitor picks up last_epoch and history.
    monitor2 = NeRFTrainMonitor(dataset=test, log_dir=log_dir, batch_size=2,
                                update_freq=1)
    assert monitor2.last_epoch == 2
    assert len(monitor2.coarse_log_list) == 2


def test_monitor_clamps_fixed_batch_to_dataset_batch(tmp_path, scene):
    """Regression: monitor batch_size larger than the DATASET's batch (but
    not larger than num_examples, so the rebatch guard stays off) must
    clamp the fixed-batch panel loop instead of indexing past the captured
    batch (IndexError at the first logging epoch)."""
    train, _, _ = DatasetLoader(scene).load_dataset(
        batch_size=2, image_width=16, image_height=16,
        near=2.0, far=6.0, n_sample=8)
    assert train.num_examples == 4
    log_dir = str(tmp_path / "logs_clamp")
    monitor = NeRFTrainMonitor(dataset=train, log_dir=log_dir,
                               batch_size=4, update_freq=1)
    model = NeRF(n_coarse=8, n_fine=8, pos_emb_xyz=4, pos_emb_dir=2,
                 n_layers=2, dense_units=16, skip_layer=1)
    model.compile(batch_size=2, image_height=16, image_width=16,
                  ray_chunks=512)
    monitor.set_model(model)
    logs = {"coarse_loss": 0.2, "fine_loss": 0.1,
            "val_coarse_loss": 0.2, "val_fine_loss": 0.1}
    monitor.on_epoch_end(0, logs)  # pre-fix: IndexError at i=2
    assert os.path.exists(os.path.join(log_dir, "test_1_0.png"))
    assert not os.path.exists(os.path.join(log_dir, "test_2_0.png"))


def test_monitor_rebatches_small_dataset(tmp_path, scene):
    """Regression: a monitor dataset smaller than the (global) batch size
    would yield zero batches under drop_remainder; the monitor must rebatch
    instead of crashing (train.py with many devices hits this)."""
    _, _, test = DatasetLoader(scene).load_dataset(
        batch_size=2, image_width=16, image_height=16,
        near=2.0, far=6.0, n_sample=8)
    assert test.num_examples == 2
    monitor = NeRFTrainMonitor(
        dataset=test, log_dir=str(tmp_path / "logs_small"),
        batch_size=8,  # > 2 available images
        update_freq=1)
    assert monitor.batch_size == 2
    assert monitor.images.shape[0] == 2


def test_monitor_update_freq(tmp_path, scene):
    _, _, test = DatasetLoader(scene).load_dataset(
        batch_size=2, image_width=16, image_height=16,
        near=2.0, far=6.0, n_sample=8)
    log_dir = str(tmp_path / "logs2")
    monitor = NeRFTrainMonitor(dataset=test, log_dir=log_dir, batch_size=2,
                               update_freq=5)
    model = NeRF(n_coarse=8, n_fine=8, pos_emb_xyz=4, pos_emb_dir=2,
                 n_layers=2, dense_units=16, skip_layer=1)
    model.compile(batch_size=2, image_height=16, image_width=16,
                  ray_chunks=512)
    monitor.set_model(model)
    logs = {k: 0.1 for k in
            ["coarse_loss", "coarse_psnr", "coarse_ssim", "fine_loss",
             "fine_psnr", "fine_ssim"]}
    logs.update({f"val_{k}": v for k, v in list(logs.items())})
    monitor.on_epoch_end(1, logs)  # 1 % 5 != 0 -> no render, no csv
    assert not os.path.exists(os.path.join(log_dir, "log.csv"))
    monitor.on_epoch_end(5, logs)
    assert os.path.exists(os.path.join(log_dir, "test_0_5.png"))


def test_train_single_cli_end_to_end(tmp_path, scene):
    """Run the real CLI flow in-process: train 2 epochs, resume, save."""
    sys.path.insert(0, REPO)
    from train_single import build_arg_parser, run_training

    args = build_arg_parser().parse_args([
        "--name", "t", "--data_dir", scene, "--img_wh", "16",
        "--num_coarse_samples", "8", "--num_fine_samples", "8",
        "--num_layers", "2", "--num_units", "16", "--skip_layer", "1",
        "--num_epochs", "2", "--batch_size", "2", "--ray_chunks", "512",
        "--white_bg",
        "--log_dir", str(tmp_path / "logs"),
        "--model_dirs", str(tmp_path / "models"),
    ])
    nerf = run_training(args)
    assert os.path.exists(
        str(tmp_path / "models" / "t" / "model_config.json"))
    assert int(nerf.state.step) == 4  # 2 epochs x 2 batches

    # Resume run: continues from epoch 2 without retraining 0-1.
    args2 = build_arg_parser().parse_args([
        "--name", "t", "--data_dir", scene, "--img_wh", "16",
        "--num_coarse_samples", "8", "--num_fine_samples", "8",
        "--num_layers", "2", "--num_units", "16", "--skip_layer", "1",
        "--num_epochs", "3", "--batch_size", "2", "--ray_chunks", "512",
        "--white_bg",
        "--log_dir", str(tmp_path / "logs"),
        "--model_dirs", str(tmp_path / "models"),
    ])
    nerf2 = run_training(args2)
    # 2 prior steps restored + 1 more epoch x 2 batches.
    assert int(nerf2.state.step) == 6


def test_inference_cli_end_to_end(tmp_path, scene):
    """Train briefly then drive the real inference CLI main()."""
    sys.path.insert(0, REPO)
    import inference as inference_cli
    from train_single import build_arg_parser, run_training

    args = build_arg_parser().parse_args([
        "--name", "inf", "--data_dir", scene, "--img_wh", "16",
        "--num_coarse_samples", "8", "--num_fine_samples", "8",
        "--num_layers", "2", "--num_units", "16", "--skip_layer", "1",
        "--num_epochs", "1", "--batch_size", "2", "--ray_chunks", "512",
        "--log_dir", str(tmp_path / "logs"),
        "--model_dirs", str(tmp_path / "models"),
    ])
    run_training(args)

    out_dir = str(tmp_path / "out")
    # frame_batch=2 over 3 frames also covers the padded final group.
    argv = ["inference.py", "--model_dirs",
            str(tmp_path / "models" / "inf"),
            "--name", "orbit", "--img_wh", "16", "--ray_chunks", "256",
            "--output_freq", "120", "--frame_batch", "2",
            "--output_dir", out_dir]
    old = sys.argv
    try:
        sys.argv = argv
        inference_cli.main()
    finally:
        sys.argv = old

    gif = os.path.join(out_dir, "orbit.gif")
    assert os.path.exists(gif)
    import imageio.v2 as imageio
    frames = imageio.mimread(gif)
    assert len(frames) == 3  # 360 / 120
    assert np.asarray(frames[0]).shape[:2] == (16, 16)

    # Same orbit over an 8-device mesh (--num_gpus): height-band-sharded
    # frames, same GIF contract.
    argv = ["inference.py", "--model_dirs",
            str(tmp_path / "models" / "inf"),
            "--name", "orbit8", "--img_wh", "16", "--ray_chunks", "32",
            "--output_freq", "120", "--num_gpus", "8",
            "--output_dir", out_dir]
    try:
        sys.argv = argv
        inference_cli.main()
    finally:
        sys.argv = old
    frames8 = imageio.mimread(os.path.join(out_dir, "orbit8.gif"))
    assert len(frames8) == 3
    assert np.asarray(frames8[0]).shape[:2] == (16, 16)
    assert np.asarray(frames8[0]).std() > 0

    # Occupancy tier composed with the mesh render (--occupancy_grid
    # + --num_gpus): banded fine-only render off the baked grid.
    argv = ["inference.py", "--model_dirs",
            str(tmp_path / "models" / "inf"),
            "--name", "orbit8occ", "--img_wh", "16", "--ray_chunks", "32",
            "--output_freq", "120", "--num_gpus", "8",
            "--occupancy_grid", "8", "--occupancy_samples", "8",
            "--sigma_threshold", "0.0",
            "--output_dir", out_dir]
    try:
        sys.argv = argv
        inference_cli.main()
    finally:
        sys.argv = old
    frames_occ = imageio.mimread(os.path.join(out_dir, "orbit8occ.gif"))
    assert len(frames_occ) == 3
    assert np.asarray(frames_occ[0]).shape[:2] == (16, 16)


def test_monitor_verbose_debug_renders(tmp_path, scene):
    """Verbose mode renders EVERY batch image as a 2x5 panel (images + the
    log-scale batch-loss subplot) named debug_{i}_{batch}.png — the
    reference's `callback.py:75-111` contract."""
    _, _, test = DatasetLoader(scene).load_dataset(
        batch_size=2, image_width=16, image_height=16,
        near=2.0, far=6.0, n_sample=8)
    log_dir = str(tmp_path / "logs_verbose")
    monitor = NeRFTrainMonitor(dataset=test, log_dir=log_dir, batch_size=2,
                               update_freq=1, verbose=True)
    model = NeRF(n_coarse=8, n_fine=8, pos_emb_xyz=4, pos_emb_dir=2,
                 n_layers=2, dense_units=16, skip_layer=1)
    model.compile(batch_size=2, image_height=16, image_width=16,
                  ray_chunks=512)
    monitor.set_model(model)

    logs = {"coarse_loss": 0.2, "fine_loss": 0.1}
    monitor.on_train_batch_end(0, logs)
    monitor.on_train_batch_end(1, logs)
    # One debug panel per image of the batch, per batch.
    for batch in (0, 1):
        for i in range(2):
            p = os.path.join(log_dir, f"debug_{i}_{batch}.png")
            assert os.path.exists(p), p
    assert monitor.coarse_log_list_batch == [0.2, 0.2]
    # The 2x5 panel with the loss subplot is taller than the plain 1x5
    # sample panels (figsize 20x10 vs 20x5).
    from PIL import Image
    with Image.open(os.path.join(log_dir, "debug_0_0.png")) as im:
        w, h = im.size
    assert h > w // 3  # 2-row layout, not the 1x5 strip


def test_resume_warns_on_drifted_convergence_flags(tmp_path, scene, caplog):
    """VERDICT r3 #5: resuming with ANY changed convergence-affecting flag
    (not just lr/optimizer) warns with old->new values instead of silently
    diverging — white_bg, pixel_sampling, sample counts, occupancy_train*."""
    import logging as _logging

    from keras_nerf_tpu.utils import checkpoint as ckpt

    path = str(tmp_path / "ckpt")
    model = NeRF(n_coarse=8, n_fine=8, pos_emb_xyz=4, pos_emb_dir=2,
                 n_layers=2, dense_units=16, skip_layer=1)
    model.compile(batch_size=1, image_height=8, image_width=8,
                  ray_chunks=64, white_background=True,
                  occupancy_train=8, occupancy_train_until=50,
                  pixel_sampling=False, near=2.0, far=6.0)
    model.save_model(path)
    saved = ckpt.load_train_config(path)
    for key in ("white_background", "pixel_sampling", "num_coarse_samples",
                "num_fine_samples", "pos_emb_xyz", "occupancy_train",
                "occupancy_train_samples", "occupancy_train_merge",
                "occupancy_train_warmup", "occupancy_train_until"):
        assert key in saved, f"{key} missing from persisted train_config"

    # Resume with three drifted flags: each must warn by name.
    resumed = NeRF(model_path=path, n_coarse=8, n_fine=8, pos_emb_xyz=4,
                   pos_emb_dir=2, n_layers=2, dense_units=16, skip_layer=1)
    with caplog.at_level(_logging.WARNING):
        resumed.compile(batch_size=1, image_height=8, image_width=8,
                        ray_chunks=64, white_background=False,
                        pixel_sampling=True, occupancy_train=0,
                        near=2.0, far=6.0)
    text = caplog.text
    for key in ("white_background", "pixel_sampling", "occupancy_train"):
        assert key in text, f"no resume warning for drifted {key}"
    # Unchanged keys stay quiet.
    assert "num_coarse_samples" not in text


def test_debug_grads_per_variable_diagnostics(caplog):
    """VERDICT r3 #8: debug_grads returns one norm per parameter tensor
    (grad_norm/{model}/<path> keys) and the NeRF layer warns naming the
    dead layer when one is zero/non-finite (reference nerf.py:429-451)."""
    import logging as _logging

    import jax
    from keras_nerf_tpu.data.synthetic import random_ray_batch
    from keras_nerf_tpu.models import engine

    model = NeRF(n_coarse=8, n_fine=8, pos_emb_xyz=4, pos_emb_dir=2,
                 n_layers=2, dense_units=16, skip_layer=1)
    model.compile(batch_size=1, image_height=8, image_width=8,
                  ray_chunks=64, debug_grads=True)
    batch = random_ray_batch(1, 8, 8, 8, jax.random.PRNGKey(0))
    metrics = model.train_step(batch)
    per_var = [k for k in metrics if k.startswith("grad_norm/")]
    n_tensors = len(jax.tree.leaves(model.state.coarse_params)) + len(
        jax.tree.leaves(model.state.fine_params))
    assert len(per_var) == n_tensors
    assert any(k.startswith("grad_norm/coarse") for k in per_var)
    assert any(k.startswith("grad_norm/fine") for k in per_var)
    assert all(np.isfinite(metrics[k]) and metrics[k] > 0 for k in per_var)

    # A dead layer is named in the warning.
    with caplog.at_level(_logging.WARNING):
        model._warn_grad_health(
            {"grad_norm/fine[rgb][kernel]": 0.0}, "at step 1")
    assert "fine[rgb][kernel]" in caplog.text

    # Off by default: no per-variable keys in the standard step.
    cfg = model.config
    _, plain = engine.train_step(
        model.state, batch, jax.random.PRNGKey(1),
        optimizer=model.optimizer, config=cfg, ray_chunks=64)
    assert not any(k.startswith("grad_norm/") for k in plain)


def test_pixel_sampling_composes_with_occupancy_train(tmp_path, scene):
    """VERDICT r3 #6: --pixel_sampling x --occupancy_train through the real
    CLI flow — both change what the fine pass trains on; the composition
    must run (occupancy sampling is per-ray, so scrambled pixel batches
    satisfy its contract) and the loss must decrease."""
    sys.path.insert(0, REPO)
    from train_single import build_arg_parser, run_training

    args = build_arg_parser().parse_args([
        "--name", "psocc", "--data_dir", scene, "--img_wh", "16",
        "--num_coarse_samples", "8", "--num_fine_samples", "8",
        "--num_layers", "2", "--num_units", "16", "--skip_layer", "1",
        "--num_epochs", "4", "--batch_size", "2", "--ray_chunks", "512",
        "--learning_rate", "5e-3",
        "--white_bg", "--pixel_sampling",
        "--occupancy_train", "8", "--occupancy_train_samples", "8",
        "--occupancy_train_warmup", "1",
        "--log_dir", str(tmp_path / "logs"),
        "--model_dirs", str(tmp_path / "models"),
    ])
    nerf = run_training(args)
    # The grid baked (occ steps actually ran after warmup)...
    assert nerf._occ_train_grid is not None
    # ...on pixel-sampled batches, and training made progress.
    with open(os.path.join(str(tmp_path / "logs"), "psocc",
                           "log.csv")) as f:
        rows = list(csv.DictReader(f))
    assert float(rows[-1]["fine_loss"]) < float(rows[0]["fine_loss"])


def test_evaluate_rebatches_small_dataset(scene):
    """A test split smaller than the global batch must not silently return
    all-zero means from evaluate (ADVICE.md round 1)."""
    _, _, test = DatasetLoader(scene).load_dataset(
        batch_size=8, image_width=16, image_height=16,
        near=2.0, far=6.0, n_sample=8)
    assert len(test) == 0  # drop_remainder would yield no batches
    model = NeRF(n_coarse=8, n_fine=8, pos_emb_xyz=4, pos_emb_dir=2,
                 n_layers=2, dense_units=16, skip_layer=1)
    model.compile(batch_size=2, image_height=16, image_width=16,
                  ray_chunks=512)
    metrics = model.evaluate(test)
    assert metrics["fine_psnr"] != 0.0


def test_eval_checkpoint_script(tmp_path, scene, capsys, monkeypatch):
    """scripts/eval_checkpoint.py reproduces train_single's final-test
    evaluation for a saved model dir (used for post-hoc A/B arms,
    e.g. the hard-scene lr study in docs/QUALITY.md)."""
    import importlib.util
    import json as _json

    sys.path.insert(0, REPO)
    from train_single import build_arg_parser, run_training

    args = build_arg_parser().parse_args([
        "--name", "evalck", "--data_dir", scene, "--img_wh", "16",
        "--num_coarse_samples", "8", "--num_fine_samples", "8",
        "--num_layers", "2", "--num_units", "16", "--skip_layer", "1",
        "--num_epochs", "1", "--batch_size", "2", "--ray_chunks", "512",
        "--white_bg",
        "--log_dir", str(tmp_path / "logs"),
        "--model_dirs", str(tmp_path / "models"),
    ])
    nerf = run_training(args)
    _, _, test = DatasetLoader(scene, True).load_dataset(
        batch_size=1, image_width=16, image_height=16,
        near=2.0, far=6.0, n_sample=8)
    expected = nerf.evaluate(test)

    spec = importlib.util.spec_from_file_location(
        "eval_checkpoint", os.path.join(REPO, "scripts",
                                        "eval_checkpoint.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(sys, "argv", [
        "eval_checkpoint.py",
        "--model_path", str(tmp_path / "models" / "evalck"),
        "--data_dir", scene, "--img_wh", "16", "--white_bg",
        "--ray_chunks", "512",
    ])
    mod.main()
    record = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert record["split"] == "test"
    for k in ("coarse_psnr", "fine_psnr", "coarse_ssim", "fine_ssim"):
        assert abs(record[k] - float(expected[k])) < 1e-2, (k, record)


def test_lr_probe_script(scene, capsys, monkeypatch):
    """scripts/lr_probe.py ranks short exact-math lr arms end-to-end.

    Regression: the eval PRNG fold used a negative fold_in value, which
    overflows uint32 and crashed the first real probe run — this drives
    the train AND eval fold paths on every arm."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "lr_probe", os.path.join(REPO, "scripts", "lr_probe.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(sys, "argv", [
        "lr_probe.py", "--data_dir", scene, "--img_wh", "16", "--white_bg",
        "--num_coarse_samples", "8", "--num_fine_samples", "8",
        "--num_layers", "2", "--num_units", "16", "--skip_layer", "1",
        "--ray_chunks", "256", "--epochs", "2", "--steps_per_epoch", "2",
        "--recipes", "1e-3:0", "5e-4:5e-6",
    ])
    mod.main()
    out = capsys.readouterr().out
    assert "probe ranking" in out
    assert "recommendation:" in out
    ranked = [l for l in out.splitlines()
              if l.startswith("1. ") or l.startswith("2. ")]
    assert len(ranked) == 2
    for line in ranked:  # both arms produced a finite val PSNR
        val = float(line.split("val")[1].split("dB")[0])
        assert np.isfinite(val)


def test_render_frontier_script(tmp_path, scene, monkeypatch):
    """scripts/render_frontier.py writes its JSON record end-to-end.

    Regression: the record-building referenced an undefined name for the
    occupancy occupied-fraction after the bake went lazy, so a completed
    (expensive) sweep crashed before writing JSON/PNG. Runs a filtered
    one-tier sweep on a tiny checkpoint through the occupancy bake path."""
    import importlib.util
    import json as _json

    sys.path.insert(0, REPO)
    from train_single import build_arg_parser, run_training

    args = build_arg_parser().parse_args([
        "--name", "rf", "--data_dir", scene, "--img_wh", "16",
        "--num_coarse_samples", "8", "--num_fine_samples", "8",
        "--num_layers", "2", "--num_units", "16", "--skip_layer", "1",
        "--num_epochs", "1", "--batch_size", "2", "--ray_chunks", "512",
        "--white_bg",
        "--log_dir", str(tmp_path / "logs"),
        "--model_dirs", str(tmp_path / "models"),
    ])
    run_training(args)

    spec = importlib.util.spec_from_file_location(
        "render_frontier", os.path.join(REPO, "scripts",
                                        "render_frontier.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out_json = str(tmp_path / "fr.json")
    out_png = str(tmp_path / "fr.png")
    monkeypatch.setattr(sys, "argv", [
        "render_frontier.py",
        "--model", str(tmp_path / "models" / "rf"),
        "--data", scene, "--img_wh", "16", "--bench_wh", "16",
        "--iters", "1", "--occ_grid", "8", "--ray_chunks", "256",
        "--tiers", "occupancy K=32",
        "--out_json", out_json, "--out_png", out_png,
    ])
    mod.main()
    record = _json.loads(open(out_json).read())
    assert record["occ_occupied_pct"] is not None  # bake ran -> recorded
    assert len(record["rows"]) == 1
    row = record["rows"][0]
    assert row["tier"] == "occupancy K=32"
    for k in ("psnr_db", "delta_db", "fps"):
        assert np.isfinite(row[k])
    assert os.path.exists(out_png)
