"""Exclusive-time per op for the 'XLA Ops' line: subtract directly-nested
child event durations (events on the same line nest by time interval).
Prints top ops and category buckets by EXCLUSIVE ms."""
import sys
from collections import defaultdict
from tensorflow.tsl.profiler.protobuf import xplane_pb2

path = sys.argv[1]
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(path, 'rb').read())


def cat(name):
    if name.startswith("%while"):
        return "while-glue"
    if name.startswith("%sort"):
        return "sort"
    if "fusion" in name and "733,140" in name:
        return "row-gather"
    if name.startswith("%copy"):
        return "copy"
    if name.startswith("%fusion"):
        return "fusion-other"
    return "other"


for plane in xs.planes:
    if "TPU" not in plane.name:
        continue
    emeta = {e.id: e.name for e in plane.event_metadata.values()}
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        evs = []
        for ev in line.events:
            name = emeta.get(ev.metadata_id, str(ev.metadata_id))
            evs.append((ev.offset_ps, ev.offset_ps + ev.duration_ps, name))
        evs.sort(key=lambda t: (t[0], -t[1]))
        # stack-based nesting: child sum per open event
        excl = defaultdict(float)
        cnt = defaultdict(int)
        stack = []  # (end, name, child_sum)
        for st, en, name in evs:
            while stack and stack[-1][0] <= st:
                e, n, cs = stack.pop()
                dur = e - excl_start.pop()
                excl[n] += (dur - cs) / 1e9
                cnt[n] += 1
                if stack:
                    stack[-1] = (stack[-1][0], stack[-1][1],
                                 stack[-1][2] + dur)
            if not hasattr(sys.modules[__name__], "_x"):
                pass
            stack.append((en, name, 0.0))
            if 'excl_start' not in dir():
                excl_start = []
            excl_start.append(st)
        while stack:
            e, n, cs = stack.pop()
            dur = e - excl_start.pop()
            excl[n] += (dur - cs) / 1e9
            cnt[n] += 1
            if stack:
                stack[-1] = (stack[-1][0], stack[-1][1], stack[-1][2] + dur)
        total = sum(excl.values())
        print(f"== XLA Ops exclusive total {total:.1f} ms")
        cats = defaultdict(float)
        for n, ms in excl.items():
            cats[cat(n)] += ms
        for c, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
            print(f"   [{c}] {ms:.1f} ms")
        for n, ms in sorted(excl.items(), key=lambda kv: -kv[1])[:45]:
            print(f"  {ms:9.3f} ms x{cnt[n]:<6} {n[:125]}")
