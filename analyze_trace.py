"""Aggregate op durations from a jax profiler xplane capture."""

import collections
import glob
import sys

from jax.profiler import ProfileData

path = sorted(glob.glob("/tmp/jax_trace2/plugins/profile/*/*.xplane.pb"))[-1]
pd = ProfileData.from_file(path)
for plane in pd.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name.lower():
        continue
    print(f"== plane: {plane.name}")
    agg = collections.Counter()
    cnt = collections.Counter()
    total = 0
    for line in plane.lines:
        if "XLA Ops" not in line.name and "Ops" not in line.name:
            continue
        for ev in line.events:
            dur = ev.duration_ns
            name = ev.name
            # strip uniquifier suffixes like .123
            base = name.split(".")[0]
            agg[base] += dur
            cnt[base] += 1
            total += dur
    print(f"total op time: {total/1e6:.1f} ms  (lines: "
          f"{[l.name for l in plane.lines]})")
    for name, dur in agg.most_common(30):
        print(f"  {dur/1e6:9.2f} ms  x{cnt[name]:<6d} {name}")
