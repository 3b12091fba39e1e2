"""CLI: convert a reference-trained checkpoint (.h5) to this framework.

The reference's ``save_model`` writes ``model_config.json`` + ``coarse.h5``
+ ``fine.h5`` (`keras_nerf/model/nerf/nerf.py:45-64`); this converts that
directory into the msgpack checkpoint this framework's CLIs load, so e.g.::

    python scripts/import_reference_h5.py --model_dir /path/to/ref/lego \
        --output_dir model/lego
    python inference.py --model_dirs model/lego ...

renders the reference-trained model through the TPU framework. Legacy
Keras-2 ``.h5`` files (what the reference produces) need only h5py;
Keras-3 ``.weights.h5`` files additionally need TensorFlow + the
reference package importable.
"""

import argparse
import logging
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

# Host-side format conversion: no accelerator needed. Force CPU so the
# conversion works offline (and never blocks on the remote-TPU tunnel);
# the env's sitecustomize ignores JAX_PLATFORMS, so set jax.config.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from keras_nerf_tpu.utils.import_h5 import import_reference_model


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model_dir", required=True,
                        help="reference artifact dir (model_config.json + "
                             "coarse.h5 + fine.h5)")
    parser.add_argument("--output_dir", default=None,
                        help="where to write the msgpack checkpoint "
                             "(default: alongside the .h5 files)")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    config = import_reference_model(args.model_dir, args.output_dir)
    out = args.output_dir or args.model_dir
    logging.info("imported reference checkpoint %s -> %s (%s)",
                 args.model_dir, out, config.to_model_config())


if __name__ == "__main__":
    main()
