"""Dump the structure of an xplane trace: plane names, line names, and the
stat keys attached to device op events — used to find which measured
quantities (bytes accessed, flops, occupancy...) this runtime records.

    python tools/xplane_probe.py --dir /tmp/egtprof_zinc
"""

import argparse
import collections
import glob
import sys

from xplane_summary import load_xspace


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/egtprof_zinc")
    ap.add_argument("--events", type=int, default=3,
                    help="sample events per line to print with stats")
    args = ap.parse_args()
    paths = sorted(glob.glob(f"{args.dir}/plugins/profile/*/*.xplane.pb"))
    if not paths:
        print("no xplane under", args.dir, file=sys.stderr)
        return 1
    xs = load_xspace(paths[-1])
    for plane in xs.planes:
        smeta = plane.stat_metadata
        emeta = plane.event_metadata
        print(f"\nPLANE {plane.name!r}: {len(plane.lines)} lines, "
              f"{len(emeta)} event types")
        # plane-level stats
        for st in plane.stats:
            md = smeta.get(st.metadata_id)
            print(f"  plane-stat {md.name if md else st.metadata_id}: {st}")
        for line in plane.lines:
            n_ev = len(line.events)
            statkeys = collections.Counter()
            for ev in line.events[:200]:
                for st in ev.stats:
                    md = smeta.get(st.metadata_id)
                    statkeys[md.name if md else str(st.metadata_id)] += 1
            print(f"  LINE {line.name!r}: {n_ev} events; "
                  f"stat keys: {dict(statkeys)}")
            for ev in line.events[: args.events]:
                md = emeta.get(ev.metadata_id)
                name = md.name if md else ev.metadata_id
                stats = {}
                for st in ev.stats:
                    sm = smeta.get(st.metadata_id)
                    key = sm.name if sm else str(st.metadata_id)
                    val = (st.double_value or st.int64_value
                           or st.uint64_value or st.str_value
                           or st.ref_value)
                    stats[key] = val
                print(f"    ev {name!r} dur={ev.duration_ps}ps {stats}")
        # event metadata may itself carry stats (XLA op metrics)
        sample = 0
        for mid, md in emeta.items():
            if md.stats and sample < args.events:
                stats = {}
                for st in md.stats:
                    sm = smeta.get(st.metadata_id)
                    key = sm.name if sm else str(st.metadata_id)
                    stats[key] = (st.double_value or st.int64_value
                                  or st.uint64_value or st.str_value)
                print(f"  event-metadata {md.name!r}: {stats}")
                sample += 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
