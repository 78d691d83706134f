"""Scheme registry: resolve '<dataset>.<pe>' names to scheme classes.

Equivalent of the reference's dynamic importer (`lib/training/importer.py:4-12`), with
the same scheme names: zinc.svd, zinc.eig, zinc_full.svd, zinc_full.eig, pattern.svd,
pattern.eig, cluster.svd, cluster.eig, mnist.svd, cifar10.svd, tsp.svd.
"""

from __future__ import annotations

import importlib

_MODULES = {
    "zinc": ".zinc",
    "zinc_full": ".zinc_full",
    "pattern": ".pattern",
    "cluster": ".cluster",
    "mnist": ".mnist",
    "cifar10": ".cifar10",
    "tsp": ".tsp",
    "pcqm4mv2": ".pcqm4mv2",
}


def import_scheme(scheme_name: str):
    """'zinc.svd' -> scheme class."""
    ds, _, pe = scheme_name.partition(".")
    if ds not in _MODULES:
        raise KeyError(f"unknown scheme dataset {ds!r}; "
                       f"known: {sorted(_MODULES)}")
    mod = importlib.import_module(_MODULES[ds], package=__name__)
    schemes = getattr(mod, "SCHEMES")
    if pe not in schemes:
        raise KeyError(f"unknown scheme variant {scheme_name!r}; "
                       f"known for {ds}: {sorted(schemes)}")
    return schemes[pe]


def available_schemes() -> list[str]:
    names = []
    for ds, modpath in _MODULES.items():
        mod = importlib.import_module(modpath, package=__name__)
        names.extend(f"{ds}.{pe}" for pe in mod.SCHEMES)
    return sorted(names)
