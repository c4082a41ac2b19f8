"""Sync-only critical-path profile: exclude async copy-start/copy-done and
the outer jit wrapper; group ops by family."""
import re
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2

path = sys.argv[1]
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(path, "rb").read())
for plane in xs.planes:
    if "TPU" not in plane.name:
        continue
    emeta = {e.id: e.name for e in plane.event_metadata.values()}
    tot = defaultdict(float)
    cnt = defaultdict(int)
    outer = 0.0
    for line in plane.lines:
        for ev in line.events:
            name = emeta.get(ev.metadata_id, str(ev.metadata_id))
            dur = ev.duration_ps / 1e9
            if name.startswith("jit_"):
                outer = max(outer, dur)
                continue
            if "copy-start" in name or "copy-done" in name or \
               name.startswith("%slice-start") or name.startswith("%slice-done"):
                continue
            # only count top-level-ish ops: skip events fully nested inside a
            # while we also count — heuristic: keep while.* and non-while ops
            # that aren't the inner traversal loops (while nested in while)
            tot[name] += dur
            cnt[name] += 1
    # group: inner-traversal whiles are nested inside the lax.map whiles;
    # subtract nesting by reporting both and flagging
    fam = defaultdict(float)
    famc = defaultdict(int)
    for name, ms in tot.items():
        m = re.match(r"%(\w+)[.\d]*", name)
        f = m.group(1) if m else name[:20]
        shape = ""
        sm = re.search(r"= \w+\[([\d,]*)\]", name)
        if sm:
            shape = sm.group(1)
        key = f"{f}[{shape}]"
        fam[key] += ms
        famc[key] += cnt[name]
    print(f"frame total (outer jit): {outer:.1f} ms")
    for k, ms in sorted(fam.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {ms:9.1f} ms x{famc[k]:<6} {k}")
