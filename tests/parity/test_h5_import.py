"""Reference-checkpoint (.h5) import parity.

A model trained by the reference must load through
``keras_nerf_tpu.utils.import_h5`` and produce identical MLP outputs.
Covers both HDF5 layouts: the legacy Keras-2 by-layer-name format (the
real reference artifact, written here with h5py in the documented layout)
and the Keras-3 ``.weights.h5`` the installed reference produces today.
"""

import json
import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

tf = pytest.importorskip("tensorflow")
h5py = pytest.importorskip("h5py")

if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

try:
    from keras_nerf.model.nerf.mlp import NeRFMLP as TFNeRFMLP
except Exception:  # pragma: no cover - reference not importable
    pytest.skip("reference keras_nerf not importable", allow_module_level=True)

import jax
import jax.numpy as jnp

from keras_nerf_tpu.models.engine import NeRFConfig
from keras_nerf_tpu.models.mlp import apply_mlp
from keras_nerf_tpu.utils import checkpoint
from keras_nerf_tpu.utils.import_h5 import (
    find_h5_pair,
    import_reference_model,
    is_legacy_h5,
    params_from_h5,
    params_from_keras_model,
    params_from_legacy_h5,
)

CFG = NeRFConfig(n_layers=3, dense_units=32, skip_layer=2,
                 pos_emb_xyz=10, pos_emb_dir=4)


@pytest.fixture(scope="module")
def tf_model():
    tf.keras.utils.set_random_seed(7)
    model = TFNeRFMLP(n_layers=CFG.n_layers, dense_units=CFG.dense_units,
                      skip_layer=CFG.skip_layer)
    model([tf.zeros((1, 2, CFG.in_xyz)), tf.zeros((1, 2, CFG.in_dir))])
    return model


def _write_legacy_h5(path, model):
    """Write the legacy Keras-2 ``save_weights`` layout (root
    ``layer_names`` attr; per-group ``weight_names`` -> ``<name>/kernel:0``
    datasets) — the format the reference's TF 2.9 produced."""
    with h5py.File(path, "w") as f:
        names = []
        for layer in model.layers:
            vals = layer.get_weights()
            if len(vals) != 2:
                continue
            names.append(layer.name)
            g = f.create_group(layer.name)
            wnames = [f"{layer.name}/kernel:0", f"{layer.name}/bias:0"]
            g.attrs["weight_names"] = np.array(
                [n.encode() for n in wnames])
            g.create_dataset(wnames[0], data=vals[0])
            g.create_dataset(wnames[1], data=vals[1])
        f.attrs["layer_names"] = np.array([n.encode() for n in names])


def _apply_both(params, tf_model):
    rng = np.random.default_rng(3)
    ex = rng.normal(size=(5, 4, CFG.in_xyz)).astype(np.float32)
    ed = rng.normal(size=(5, 4, CFG.in_dir)).astype(np.float32)
    rgb_ref, sigma_ref = tf_model([tf.constant(ex), tf.constant(ed)])
    rgb, sigma = apply_mlp(params, jnp.asarray(ex), jnp.asarray(ed), CFG.mlp)
    return (np.asarray(rgb), np.asarray(sigma),
            rgb_ref.numpy(), sigma_ref.numpy())


def test_params_from_keras_model_matches_tf(tf_model):
    params = params_from_keras_model(tf_model, CFG.mlp, CFG.in_xyz,
                                     CFG.in_dir)
    rgb, sigma, rgb_ref, sigma_ref = _apply_both(params, tf_model)
    np.testing.assert_allclose(rgb, rgb_ref, atol=2e-6)
    np.testing.assert_allclose(sigma, sigma_ref, atol=2e-6)


def test_legacy_h5_roundtrip(tf_model, tmp_path):
    path = str(tmp_path / "coarse.h5")
    _write_legacy_h5(path, tf_model)
    assert is_legacy_h5(path)
    params = params_from_legacy_h5(path, CFG.mlp, CFG.in_xyz, CFG.in_dir)
    direct = params_from_keras_model(tf_model, CFG.mlp, CFG.in_xyz,
                                     CFG.in_dir)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(direct)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_keras3_h5_via_reference_model(tf_model, tmp_path):
    path = str(tmp_path / "coarse.weights.h5")
    tf_model.save_weights(path)
    assert not is_legacy_h5(path)
    params = params_from_h5(path, CFG)
    rgb, sigma, rgb_ref, sigma_ref = _apply_both(params, tf_model)
    np.testing.assert_allclose(rgb, rgb_ref, atol=2e-6)
    np.testing.assert_allclose(sigma, sigma_ref, atol=2e-6)


def test_import_reference_model_artifact(tf_model, tmp_path):
    """Full artifact conversion: model_config.json + legacy coarse/fine.h5
    -> msgpack checkpoint loadable by checkpoint.load_weights."""
    ref_dir = tmp_path / "ref"
    out_dir = tmp_path / "out"
    ref_dir.mkdir()
    with open(ref_dir / "model_config.json", "w") as f:
        json.dump(CFG.to_model_config(), f)
    _write_legacy_h5(str(ref_dir / "coarse.h5"), tf_model)
    _write_legacy_h5(str(ref_dir / "fine.h5"), tf_model)
    assert find_h5_pair(str(ref_dir)) is not None

    config = import_reference_model(str(ref_dir), str(out_dir))
    assert config.to_model_config() == CFG.to_model_config()
    assert checkpoint.has_weights(str(out_dir))
    assert os.path.exists(out_dir / "model_config.json")

    template = params_from_keras_model(tf_model, CFG.mlp, CFG.in_xyz,
                                       CFG.in_dir)
    coarse, fine = checkpoint.load_weights(str(out_dir), template, template)
    for tree in (coarse, fine):
        rgb, sigma, rgb_ref, sigma_ref = _apply_both(tree, tf_model)
        np.testing.assert_allclose(rgb, rgb_ref, atol=2e-6)
        np.testing.assert_allclose(sigma, sigma_ref, atol=2e-6)


def test_maybe_import_reference_auto_converts(tf_model, tmp_path):
    """The CLI hook: a directory holding only the reference artifact is
    converted in place on first touch (inference.py load path)."""
    ref_dir = tmp_path / "auto"
    ref_dir.mkdir()
    with open(ref_dir / "model_config.json", "w") as f:
        json.dump(CFG.to_model_config(), f)
    _write_legacy_h5(str(ref_dir / "coarse.h5"), tf_model)
    _write_legacy_h5(str(ref_dir / "fine.h5"), tf_model)
    assert not checkpoint.has_weights(str(ref_dir))
    assert checkpoint.maybe_import_reference(str(ref_dir))
    assert checkpoint.has_weights(str(ref_dir))
    # Second call is a no-op.
    assert not checkpoint.maybe_import_reference(str(ref_dir))


def test_export_roundtrip_via_import(tmp_path):
    """export_reference_model -> import_reference_model must be the
    identity on the weights (pure h5py leg, no TF)."""
    from keras_nerf_tpu.models import engine
    from keras_nerf_tpu.utils.export_h5 import export_reference_model

    opt = engine.make_optimizer("adam", 1e-3)
    state = engine.init_train_state(jax.random.PRNGKey(11), CFG, opt)
    coarse, fine = state.coarse_params, state.fine_params
    src = tmp_path / "src"
    src.mkdir()
    checkpoint.save_model(str(src), state, CFG)
    ref_dir = tmp_path / "ref_artifact"
    export_reference_model(str(src), str(ref_dir))
    assert find_h5_pair(str(ref_dir)) is not None
    assert is_legacy_h5(str(ref_dir / "coarse.h5"))

    back = tmp_path / "back"
    import_reference_model(str(ref_dir), str(back))
    c2, f2 = checkpoint.load_weights(str(back), coarse, fine)
    for a, b in zip(jax.tree.leaves((coarse, fine)),
                    jax.tree.leaves((c2, f2))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_exported_h5_loads_into_tf_reference(tf_model, tmp_path):
    """The REAL interop contract: an exported coarse.h5 must load into
    the reference's NeRFMLP via Keras ``load_weights`` and produce
    identical outputs."""
    from keras_nerf_tpu.models import engine
    from keras_nerf_tpu.utils.export_h5 import export_reference_model

    opt = engine.make_optimizer("adam", 1e-3)
    state = engine.init_train_state(jax.random.PRNGKey(13), CFG, opt)
    fine = state.fine_params
    src = tmp_path / "src"
    src.mkdir()
    checkpoint.save_model(str(src), state, CFG)
    ref_dir = tmp_path / "artifact"
    export_reference_model(str(src), str(ref_dir))

    model = TFNeRFMLP(n_layers=CFG.n_layers, dense_units=CFG.dense_units,
                      skip_layer=CFG.skip_layer)
    model([tf.zeros((1, 2, CFG.in_xyz)), tf.zeros((1, 2, CFG.in_dir))])
    model.load_weights(str(ref_dir / "fine.h5"))

    rgb, sigma, rgb_ref, sigma_ref = _apply_both(fine, model)
    np.testing.assert_allclose(rgb, rgb_ref, atol=2e-6)
    np.testing.assert_allclose(sigma, sigma_ref, atol=2e-6)


def test_import_rejects_wrong_architecture(tf_model, tmp_path):
    path = str(tmp_path / "coarse.h5")
    _write_legacy_h5(path, tf_model)
    wrong = NeRFConfig(n_layers=3, dense_units=64, skip_layer=2)
    with pytest.raises(ValueError, match="do not match"):
        params_from_legacy_h5(path, wrong.mlp, wrong.in_xyz, wrong.in_dir)
