"""Convert OGB-LSC PCQM4Mv2 to this framework's HDF5 schema.

Requires the `ogb` package and its downloaded data (not present in hermetic CI
environments — the tool degrades with a clear message). Output is consumed by the
`pcqm4mv2.*` schemes.

Usage: python tools/convert_pcqm4mv2.py --root <ogb_root> --out datasets/PCQM4MV2/PCQM4MV2.h5
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from egt_tpu.data.hdf5_io import write_records  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="ogb_data")
    ap.add_argument("--out", required=True)
    ap.add_argument("--limit", type=int, default=None,
                    help="convert only the first N molecules per split")
    args = ap.parse_args()

    try:
        from ogb.lsc import PCQM4Mv2Dataset
        from ogb.utils import smiles2graph
    except ImportError:
        raise SystemExit("the `ogb` package is required; install it where you "
                         "run this conversion (pip install ogb)")

    ds = PCQM4Mv2Dataset(root=args.root, only_smiles=True)
    split = ds.get_idx_split()
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)

    name_map = {"train": "training", "valid": "validation",
                "test-dev": "test"}
    for ogb_split, our_split in name_map.items():
        idxs = split[ogb_split]
        if args.limit:
            idxs = idxs[: args.limit]
        records = []
        for i in idxs:
            smiles, gap = ds[int(i)]
            g = smiles2graph(smiles)
            records.append(dict(
                num_nodes=int(g["num_nodes"]),
                edges=np.asarray(g["edge_index"]).T.astype(np.int64),
                node_features=np.asarray(g["node_feat"], np.int64),
                edge_features=np.asarray(g["edge_feat"], np.int64),
                value=np.asarray([gap], np.float32),
            ))
        write_records(args.out, "PCQM4MV2", our_split, records)
        print(f"PCQM4MV2/{our_split}: wrote {len(records)} records")


if __name__ == "__main__":
    main()
