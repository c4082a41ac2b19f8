"""Bucket 'XLA Ops' exclusive time by workload class, keyed on op name +
operand shapes: loop-gather / loop-stack / loop-vpu (while-body ops at
(8,4096)), sorts (by operand count), frame-lane shading ops (1.4M/1.9M),
copies, film/other. Usage: python scratch/xplane_cat.py trace.xplane.pb"""
import re
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2

path = sys.argv[1]
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(path, "rb").read())


def cat(name):
    if name.startswith("%sort"):
        m = re.search(r"\d+", name)
        nops = name.count("[")  # rough operand count incl. output tuple
        return f"sort"
    big = ("1476472" in name or "1476608" in name or "1923984" in name
           or "1,923,984" in name)
    loop = "8,4096" in name or "4096,64" in name
    if loop:
        if ",64]" in name and "fusion" in name and "32768" in name:
            return "loop-row-gather"
        if name.startswith("%copy") and "4096,64" in name:
            return "loop-gather-copy"
        if re.search(r"\[(1[6-9]|[2-9]\d),8,4096", name):
            return "loop-stack"
        return "loop-vpu-glue"
    if big:
        if name.startswith("%copy"):
            return "lane-copy"
        return "lane-shading/raygen"
    if name.startswith("%copy"):
        return "copy-other"
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
        excl = defaultdict(float)
        cnt = defaultdict(int)
        stack = []
        starts = []
        for st, en, name in evs:
            while stack and stack[-1][0] <= st:
                e, n, cs = stack.pop()
                dur = e - starts.pop()
                excl[n] += (dur - cs) / 1e9
                cnt[n] += 1
                if stack:
                    stack[-1] = (stack[-1][0], stack[-1][1], stack[-1][2] + dur)
            stack.append((en, name, 0.0))
            starts.append(st)
        while stack:
            e, n, cs = stack.pop()
            dur = e - starts.pop()
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
            print(f"   [{c:20s}] {ms:7.1f} ms")
        # top lane-shading ops to see what shading actually is
        print("-- top lane-shading/raygen ops:")
        lane = [(ms, n) for n, ms in excl.items()
                if cat(n) == "lane-shading/raygen"]
        for ms, n in sorted(lane, reverse=True)[:25]:
            print(f"  {ms:8.3f} ms x{cnt[n]:<4} {n[:120]}")
        # top 'other' to catch mis-bucketing
        print("-- top other:")
        oth = [(ms, n) for n, ms in excl.items() if cat(n) == "other"]
        for ms, n in sorted(oth, reverse=True)[:15]:
            print(f"  {ms:8.3f} ms x{cnt[n]:<4} {n[:120]}")
