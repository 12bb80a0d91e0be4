"""Summarize a jax.profiler xplane trace: per-op device time, grouped.

Usage: env PYTHONPATH= \
           python benchmarks/analyze_trace.py /tmp/prof32k [top_n] [steps]

``steps`` is the number of train steps the trace captured (bench.py with
BENCH_PROFILE traces BENCH_ITERS steps); all "ms/step" figures divide by
it, so pass it or read the totals as per-trace.

Parses the raw XSpace protobuf (tensorflow.tsl xplane schema — the
tensorboard profile plugin in this image is version-broken) and prints
per-op device time on the TPU plane, with a category rollup keyed on the
"tf_op"/hlo_category stat when present.  This is the tool behind
BASELINE.md's "where the time went" paragraphs.
"""

import glob
import re
import sys
from collections import defaultdict

_OPCODE_RE = re.compile(r"}\)?\s+([a-z][a-z0-9-]*)\(")


def find_xplane(log_dir: str) -> str:
    paths = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.xplane.pb"))
    if not paths:
        raise SystemExit(f"no xplane.pb under {log_dir}")
    return paths[-1]


def main() -> None:
    log_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xplane = find_xplane(log_dir)
    space = xplane_pb2.XSpace()
    with open(xplane, "rb") as f:
        space.ParseFromString(f.read())

    print(f"xplane: {xplane}")
    print("planes:", [p.name for p in space.planes])

    for plane in space.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        meta = plane.event_metadata
        by_op = defaultdict(float)
        occ = defaultdict(int)
        by_cat = defaultdict(float)
        print(f"[{plane.name}] lines: {[(l.name, len(l.events)) for l in plane.lines]}")
        for line in plane.lines:
            lname = line.name.lower()
            # XLA op lines carry per-HLO events; step lines / scoped lines
            # would double-count.
            if "xla ops" not in lname:
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name
                short = name.split(" = ")[0].lstrip("%")
                # async copy windows overlap compute — not real occupancy
                if short.startswith("copy-start"):
                    continue
                # opcode: "<lhs> = <type> <opcode>(...)" — type may itself
                # be a tuple containing parens, so regex for a known-shaped
                # opcode token immediately followed by "("
                m = _OPCODE_RE.search(name)
                cat = m.group(1) if m else "?"
                dur_us = ev.duration_ps / 1e6
                by_op[(short, cat)] += dur_us
                occ[(short, cat)] += 1
                by_cat[cat] += dur_us
        total = sum(by_cat.values())
        if total == 0:
            continue
        steps = int(sys.argv[3]) if len(sys.argv) > 3 else 1
        print(
            f"\n=== plane {plane.name}: non-copy XLA-op time {total/1e3:.2f} ms"
            f" ({total/1e3/steps:.2f} ms/step over {steps} steps) ==="
        )
        print("== by opcode ==")
        for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1]):
            print(f"  {t/1e3/steps:9.3f} ms/step  {100*t/total:5.1f}%  {cat}")
        print(f"== top {top_n} ops (per step) ==")
        for (short, cat), t in sorted(by_op.items(), key=lambda kv: -kv[1])[:top_n]:
            print(
                f"  {t/1e3/steps:9.3f} ms  {100*t/total:5.1f}%  x{occ[(short,cat)]:<4d} "
                f"[{cat}] {short[:90]}"
            )


if __name__ == "__main__":
    main()
