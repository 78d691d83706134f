"""Eval CLI: python do_evaluations.py <config.json> (reference: do_evaluations.py)."""

import sys

from egt_tpu.training.schemes import import_scheme
from egt_tpu.utils.hparams import read_config_from_file

if __name__ == "__main__":
    config = read_config_from_file(sys.argv[1])
    scheme_class = import_scheme(config["scheme"])
    scheme_class(config).do_evaluations()
