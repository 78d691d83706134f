"""Export a trained model as a self-contained AOT serving artifact.

Usage: python export_serving.py <config.json> [output_path]
Weight selection follows the `weight_file` config key (':' latest snapshot,
'' final weights, '-' training checkpoint), like `do_evaluations.py`.
"""

import sys

from egt_tpu.training.schemes import import_scheme
from egt_tpu.utils.hparams import read_config_from_file

if __name__ == "__main__":
    config = read_config_from_file(sys.argv[1])
    scheme = import_scheme(config["scheme"])(config)
    scheme.export_serving(sys.argv[2] if len(sys.argv) > 2 else None)
