"""Dump per-layer attention logits/matrices/gates for a trained model.

Usage: python do_analysis.py <config.json> [split] [max_batches]
The CLI face of the reference's analysis-model capability
(`lib/models/analysis.py`); output lands in predictions/<split>_analysis.npz.
"""

import sys

from egt_tpu.training.schemes import import_scheme
from egt_tpu.utils.hparams import read_config_from_file

if __name__ == "__main__":
    config = read_config_from_file(sys.argv[1])
    split = sys.argv[2] if len(sys.argv) > 2 else "test"
    max_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    scheme = import_scheme(config["scheme"])(config)
    scheme.do_analysis(split, max_batches)
