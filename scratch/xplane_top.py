"""Parse an xplane.pb and print top ops by total device duration."""
import sys
from collections import defaultdict
from tensorflow.tsl.profiler.protobuf import xplane_pb2

path = sys.argv[1]
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(path, 'rb').read())
for plane in xs.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name.lower():
        continue
    emeta = {e.id: e.name for e in plane.event_metadata.values()}
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for line in plane.lines:
        for ev in line.events:
            name = emeta.get(ev.metadata_id, str(ev.metadata_id))
            dur = ev.duration_ps / 1e9  # ms
            tot[name] += dur
            cnt[name] += 1
    total = sum(tot.values())
    print(f"== plane {plane.name}: {len(tot)} op names, "
          f"total {total:.2f} ms (incl nesting)")
    for name, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:45]:
        print(f"  {ms:9.3f} ms  x{cnt[name]:<6} {name[:110]}")
