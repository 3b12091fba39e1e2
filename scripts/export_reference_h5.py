"""CLI: convert a checkpoint of this framework to the reference's format.

The inverse of ``scripts/import_reference_h5.py``: writes
``model_config.json`` + ``coarse.h5`` + ``fine.h5``
(`keras_nerf/model/nerf/nerf.py:45-76`, legacy Keras-2 layout) so a model
trained on TPU here loads back into the original TF implementation::

    python scripts/export_reference_h5.py --model_dir model/quality128 \
        --output_dir /path/to/ref_artifact
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

from keras_nerf_tpu.utils.export_h5 import export_reference_model


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model_dir", required=True,
                        help="this framework's checkpoint dir "
                             "(model_config.json + *.msgpack)")
    parser.add_argument("--output_dir", default=None,
                        help="where to write the reference artifact "
                             "(default: alongside the msgpack files)")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    config = export_reference_model(args.model_dir, args.output_dir)
    out = args.output_dir or args.model_dir
    logging.info("exported %s -> reference artifact %s (%s)",
                 args.model_dir, out, config.to_model_config())


if __name__ == "__main__":
    main()
