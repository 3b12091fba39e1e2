"""Export checkpoints to the reference's Keras ``.h5`` artifact format.

The inverse of `utils/import_h5.py`: converts this framework's msgpack
checkpoint into the directory layout the reference's ``NeRF.load_model``
consumes — ``model_config.json`` + ``coarse.h5`` + ``fine.h5``
(`keras_nerf/model/nerf/nerf.py:45-76`) — so a model trained on TPU here
can be loaded back into the original TF implementation.

The weight files are written in the legacy Keras-2 ``save_weights``
HDF5 layout (root attr ``layer_names``; per-layer groups whose
``weight_names`` attrs point at ``<name>/kernel:0`` / ``<name>/bias:0``
datasets — `hdf5_format.save_weights_to_hdf5_group`), which is what the
reference's TF 2.9 ``load_weights(...)`` expects. Pure h5py — no
TensorFlow needed to export. Round-trip parity is guarded by
``tests/utils/test_h5_roundtrip.py`` (export -> import == identity) and
the TF-reference load test in ``tests/parity/``.
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np

from keras_nerf_tpu.models.engine import NeRFConfig

Params = dict[str, Any]


def _layer_items(params: Params, n_layers: int):
    """(layer_name, kernel, bias) in the reference's layer order
    (`keras_nerf/model/nerf/mlp.py:11-27`)."""
    for i in range(n_layers):
        layer = params["trunk"][i]
        yield f"layer_{i}", layer["kernel"], layer["bias"]
    for name in ("sigma", "features", "rgb_features", "rgb"):
        yield name, params[name]["kernel"], params[name]["bias"]


def write_legacy_h5(path: str, params: Params, n_layers: int) -> None:
    """Write one MLP's params as a legacy Keras-2 weights HDF5 file."""
    import h5py

    names = [name for name, _, _ in _layer_items(params, n_layers)]
    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = np.array(
            [n.encode() for n in names], dtype="S64")
        f.attrs["backend"] = b"tensorflow"
        f.attrs["keras_version"] = b"2.9.0"
        for name, kernel, bias in _layer_items(params, n_layers):
            g = f.create_group(name)
            wnames = [f"{name}/kernel:0", f"{name}/bias:0"]
            g.attrs["weight_names"] = np.array(
                [w.encode() for w in wnames], dtype="S96")
            g.create_dataset(wnames[0],
                             data=np.asarray(kernel, dtype=np.float32))
            g.create_dataset(wnames[1],
                             data=np.asarray(bias, dtype=np.float32))


def export_reference_model(model_dir: str, out_dir: str | None = None
                           ) -> NeRFConfig:
    """Convert a msgpack checkpoint directory into the reference's
    ``model_config.json`` + ``coarse.h5`` + ``fine.h5`` artifact.

    ``model_dir`` must hold this framework's checkpoint
    (``utils/checkpoint.py`` layout). Writes to ``out_dir`` (defaults to
    ``model_dir``, alongside the originals). Returns the parsed config.
    """
    import jax

    from keras_nerf_tpu.models import engine
    from keras_nerf_tpu.utils import checkpoint

    config = checkpoint.load_model_config(model_dir)
    coarse, fine = engine.init_params(jax.random.PRNGKey(0), config)
    coarse, fine = checkpoint.load_weights(model_dir, coarse, fine)

    out_dir = out_dir or model_dir
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, checkpoint.MODEL_CONFIG), "w") as f:
        json.dump(config.to_model_config(), f)
    write_legacy_h5(os.path.join(out_dir, "coarse.h5"),
                    jax.tree.map(np.asarray, coarse), config.n_layers)
    write_legacy_h5(os.path.join(out_dir, "fine.h5"),
                    jax.tree.map(np.asarray, fine), config.n_layers)
    return config
