"""Per-line breakdown of an xplane.pb, then top ops in each op-level line,
with simple category buckets."""
import re
import sys
from collections import defaultdict
from tensorflow.tsl.profiler.protobuf import xplane_pb2

path = sys.argv[1]
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(path, 'rb').read())


def cat(name):
    if name.startswith("%while"):
        return "while-loop-glue"
    if name.startswith("%sort"):
        return "sort"
    if "fusion" in name and "733,140" in name:
        return "table-row-gather"
    if name.startswith("%copy-start") or name.startswith("%copy-done"):
        return "async-copy"
    if name.startswith("%copy"):
        return "copy"
    if name.startswith("%slice") or name.startswith("%dynamic"):
        return "slice"
    if name.startswith("%fusion"):
        return "fusion-other"
    if name.startswith("%all-") or name.startswith("%collective"):
        return "collective"
    return "other"


for plane in xs.planes:
    if "TPU" not in plane.name:
        continue
    emeta = {e.id: e.name for e in plane.event_metadata.values()}
    for line in plane.lines:
        tot = defaultdict(float)
        cnt = defaultdict(int)
        cats = defaultdict(float)
        for ev in line.events:
            name = emeta.get(ev.metadata_id, str(ev.metadata_id))
            dur = ev.duration_ps / 1e9
            tot[name] += dur
            cnt[name] += 1
            cats[cat(name)] += dur
        total = sum(tot.values())
        print(f"\n== line '{line.name}' ({len(line.events)} events, "
              f"{total:.1f} ms)")
        for c, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
            print(f"   [{c}] {ms:.1f} ms")
        if 100 < total < 2000:
            for name, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:40]:
                print(f"  {ms:9.3f} ms x{cnt[name]:<6} {name[:120]}")
