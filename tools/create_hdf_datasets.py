"""Convert benchmark graph datasets to the HDF5 schema this framework (and the
reference) consumes.

Schema (reference: create_hdf_benchmarking_datasets.ipynb; reader
`lib/data/reader.py:11-65`):
    /<DSNAME>/<split>/<%010d>/data          attrs: num_nodes, num_edges
    /<DSNAME>/<split>/<%010d>/data/edges    (E, 2)
    /<DSNAME>/<split>/<%010d>/data/features/nodes/feat
    /<DSNAME>/<split>/<%010d>/data/features/edges/feat
    /<DSNAME>/<split>/<%010d>/targets/{value|label|node_labels|edge_labels}

Sources supported:
  * DGL benchmarking datasets (`--source dgl`), when the `dgl` package and the
    Dwivedi-et-al data package are installed (they are NOT in this image — this
    path mirrors the reference notebook for users running elsewhere);
  * generic pickle (`--source pickle <file>`): a dict
    {split: [ {num_nodes, edges, node_features?, edge_features?, target...} ]}.

Usage:
    python tools/create_hdf_datasets.py ZINC --source pickle zinc.pkl \
        --out datasets/ZINC/ZINC.h5 --target-key value
"""

from __future__ import annotations

import argparse
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from egt_tpu.data.hdf5_io import write_records  # noqa: E402

TARGET_KEYS = ("value", "label", "node_labels", "edge_labels")


def records_from_pickle(path: str) -> dict:
    with open(path, "rb") as fp:
        data = pickle.load(fp)
    if not isinstance(data, dict):
        raise ValueError("pickle must be {split: [record, ...]}")
    return data


def records_from_dgl(name: str) -> dict:
    """Mirror of the reference notebook's DGL -> record extraction."""
    try:
        from data.data import LoadData  # Dwivedi et al. benchmarking package
    except ImportError as e:
        raise SystemExit(
            "DGL benchmarking package not available in this environment; "
            "use --source pickle, or run this tool where "
            "github.com/graphdeeplearning/benchmarking-gnns is installed"
        ) from e
    ds = LoadData(name)
    out = {}
    for split_name, split in (("training", ds.train), ("validation", ds.val),
                              ("test", ds.test)):
        records = []
        for g, label in split:
            rec = {
                "num_nodes": g.number_of_nodes(),
                "edges": np.stack(g.edges(), axis=1),
                "node_features": g.ndata["feat"].numpy(),
            }
            if "feat" in g.edata:
                rec["edge_features"] = g.edata["feat"].numpy()
            label = np.asarray(label)
            if label.ndim == 0:
                rec["label"] = int(label)
            elif label.shape == (1,):
                rec["value"] = label.astype(np.float32)
            elif len(label) == rec["num_nodes"]:
                rec["node_labels"] = label
            else:
                rec["edge_labels"] = label
            records.append(rec)
        out[split_name] = records
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("name", help="dataset group name, e.g. ZINC / SBM_PATTERN")
    ap.add_argument("--source", nargs="+", default=["dgl"],
                    help="'dgl' or 'pickle <file>'")
    ap.add_argument("--out", required=True)
    ap.add_argument("--target-key", default=None, choices=TARGET_KEYS,
                    help="force target key for pickle records using 'target'")
    args = ap.parse_args()

    if args.source[0] == "dgl":
        splits = records_from_dgl(args.name)
    elif args.source[0] == "pickle":
        splits = records_from_pickle(args.source[1])
    else:
        raise SystemExit(f"unknown source {args.source[0]!r}")

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    for split, records in splits.items():
        fixed = []
        for rec in records:
            rec = dict(rec)
            if args.target_key and "target" in rec:
                rec[args.target_key] = rec.pop("target")
            fixed.append(rec)
        write_records(args.out, args.name, split, fixed)
        print(f"{args.name}/{split}: wrote {len(fixed)} records")


if __name__ == "__main__":
    main()
