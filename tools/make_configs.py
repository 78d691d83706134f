"""Generate the 76-experiment config corpus.

Reproduces the published EGT hyperparameter grid (main results + egt_simple /
egt_constrained / ungated ablation families across the 7 benchmark datasets at
~100k/~500k parameter budgets; see the reference's configs/ layout and
README.md:18-28) as JSON files under configs/. The config schema is shared with
the reference, so either corpus runs on this framework unchanged.

Usage: python tools/make_configs.py [--out configs]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

# dataset -> per-size (width, edge_width, height); epochs; rlr_patience;
# batch size; eigen PE selection width
DS = {
    "zinc":      dict(sizes={"100k": (48, 48, 4), "500k": (64, 64, 10)},
                      epochs=600, patience=20, bs=128, eig_sel=8, do=0.05),
    "zinc_full": dict(sizes={"500k": (64, 64, 10)},
                      epochs=200, patience=5, bs=128, eig_sel=8, do=0.05),
    "pattern":   dict(sizes={"100k": (64, 8, 4), "500k": (64, 8, 16)},
                      epochs=200, patience=10, bs=128, eig_sel=2),
    "cluster":   dict(sizes={"100k": (64, 8, 4), "500k": (64, 8, 16)},
                      epochs=200, patience=10, bs=128, eig_sel=20),
    "mnist":     dict(sizes={"100k": (64, 8, 4)},
                      epochs=200, patience=10, bs=128, do=0.0005),
    "cifar10":   dict(sizes={"100k": (64, 8, 4)},
                      epochs=200, patience=10, bs=128, do=0.0005),
    "tsp":       dict(sizes={"100k": (64, 8, 4), "500k": (64, 8, 16)},
                      epochs=100, patience=5, bs=8),
}

# ablation family -> (datasets at which size, config patch, keeps hop16+randmask)
ABLATION_SIZE = {"zinc": "500k", "zinc_full": "500k", "pattern": "500k",
                 "cluster": "500k", "tsp": "500k", "mnist": "100k",
                 "cifar10": "100k"}
# egt_simple shrinks the (unused-residual) edge channel and widens the node
# stream for the molecular models
SIMPLE_ARCH = {"zinc": (80, 8, 10), "zinc_full": (80, 8, 10)}


def base(ds: str, size: str, arch=None) -> dict:
    d = DS[ds]
    w, e, h = arch or d["sizes"][size]
    return {
        "scheme": f"{ds}.svd",
        "distributed": True,
        "batch_size": d["bs"],
        "initial_lr": 0.0005,
        "num_epochs": d["epochs"],
        "rlr_factor": 0.5,
        "rlr_patience": d["patience"],
        "min_lr_factor": 0.01,
        "model_width": w,
        "edge_width": e,
        "model_height": h,
        "num_heads": 8,
        "ffn_multiplier": 2.0,
        "use_svd": False,
    }


def pe_variants(ds: str, cfg: dict, name_stem: str, size: str,
                with_spe=True, with_epe=True):
    """-> {filename_tag: config} for the no-PE / SVD-PE / eigen-PE variants."""
    out = {name_stem: {**cfg, "model_name": f"{name_stem}_{size}"}}
    if with_spe:
        out[f"{name_stem}_spe"] = {
            **cfg, "use_svd": True, "sel_svd_features": 8, "random_neg": True,
            "model_name": f"{name_stem}_spe_{size}"}
    if with_epe and "eig_sel" in DS[ds]:
        epe = {**cfg, "scheme": f"{ds}.eig", "use_eig": True,
               "sel_eig_features": DS[ds]["eig_sel"],
               "model_name": f"{name_stem}_epe_{size}"}
        epe.pop("use_svd")
        out[f"{name_stem}_epe"] = epe
    return out


def main_family(ds: str, size: str):
    cfg = {**base(ds, size), "random_mask_prob": 0.1, "upto_hop": 16}
    out = pe_variants(ds, cfg, "egt", size)
    if "do" in DS[ds]:
        do = dict(out["egt_spe"])
        do.pop("upto_hop")  # the distance objective replaces hop encodings
        do.update(distance_loss=DS[ds]["do"], distance_target=3,
                  model_name=f"egt_spe_do_{size}")
        out["egt_spe_do"] = do
    return out


def ablation_families(ds: str):
    size = ABLATION_SIZE[ds]
    fams = {}

    simple = {**base(ds, size, SIMPLE_ARCH.get(ds)),
              "edge_channel_type": "bias", "random_mask_prob": 0.1,
              "upto_hop": 16}
    fams["egt_simple"] = pe_variants(ds, simple, "egt_simple", size)

    constrained = {**base(ds, size), "edge_channel_type": "constrained"}
    fams["egt_constrained"] = pe_variants(ds, constrained, "egt_constrained",
                                          size)

    if ds != "zinc_full":  # the published ungated family skips ZINC-full
        ungated = {**base(ds, size), "gate_attention": False,
                   "random_mask_prob": 0.1, "upto_hop": 16}
        fams["ungated"] = {"egt_u": {**ungated, "model_name": f"egt_u_{size}"}}
    return size, fams


def run(out_dir: str) -> int:
    out = Path(out_dir)
    n = 0
    for ds, d in DS.items():
        for size in d["sizes"]:
            for tag, cfg in main_family(ds, size).items():
                p = out / "main" / ds / size / f"{tag}.json"
                p.parent.mkdir(parents=True, exist_ok=True)
                p.write_text(json.dumps(cfg, indent=2) + "\n")
                n += 1
    for ds in DS:
        size, fams = ablation_families(ds)
        for fam, cfgs in fams.items():
            for tag, cfg in cfgs.items():
                p = out / "ablation" / fam / ds / size / f"{tag}.json"
                p.parent.mkdir(parents=True, exist_ok=True)
                p.write_text(json.dumps(cfg, indent=2) + "\n")
                n += 1
    return n


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="configs")
    args = ap.parse_args()
    print(f"wrote {run(args.out)} configs under {args.out}/")
