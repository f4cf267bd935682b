"""Per-op TPU profile of the flagship train step (r3 VERDICT next #2a).

Runs one compiled step under `jax.profiler.trace` (which works through the
axon relay — the xplane lands client-side) and aggregates the device
"XLA Ops" timeline by HLO category and by model module, with per-category
FLOPs and bytes so compute- vs bandwidth-bound is measured, not guessed.

Usage: PYTHONPATH=. python benchmarks/profile_step.py [--img 384]
       [--trace_dir /tmp/detectax_trace] [--top 15]
Prints a JSON summary line last; human tables before it.
"""
from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import re

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/.cache/detectax_tpu_cache"
)

PEAK_BF16 = 197e12
HBM_GBPS = 819.0  # v5e HBM bandwidth


def run_trace(img: int, batch: int, trace_dir: str) -> str:
    import jax
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from mfu_breakdown import build

    parts, state, bd = build(img, batch)
    step = jax.jit(parts["raw_step"])
    # compile + warm outside the trace
    s2, m = step(state, bd)
    _ = float(m["total"])
    with jax.profiler.trace(trace_dir):
        s2, m = step(state, bd)
        _ = float(m["total"])
    pbs = sorted(glob.glob(os.path.join(trace_dir, "**/*.xplane.pb"),
                           recursive=True), key=os.path.getmtime)
    return pbs[-1]


def parse(xplane_path: str, top: int):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(xplane_path, "rb") as f:
        xs.ParseFromString(f.read())
    tpu = [p for p in xs.planes if "TPU" in p.name][0]
    md, smd = tpu.event_metadata, tpu.stat_metadata
    line = [l for l in tpu.lines if l.name == "XLA Ops"][0]

    def stats_of(e):
        out = {}
        for s in list(md[e.metadata_id].stats) + list(e.stats):
            k = smd[s.metadata_id].name
            out[k] = (s.str_value or s.int64_value or s.double_value
                      or (smd[s.ref_value].name if s.ref_value else 0))
        return out

    bycat = collections.defaultdict(lambda: [0, 0, 0, 0])  # ps,flops,bytes,n
    bymod = collections.defaultdict(lambda: [0, 0])        # ps, n
    ops = []
    for e in line.events:
        st = stats_of(e)
        cat = st.get("hlo_category", "?")
        c = bycat[cat]
        c[0] += e.duration_ps
        c[1] += int(st.get("flops", 0) or 0)
        c[2] += int(st.get("raw_bytes_accessed", 0) or 0)
        c[3] += 1
        tf_op = str(st.get("tf_op", ""))
        # module bucket: jit(step)/jvp(FCOS)/ResNet_0/stage2_block2/... ->
        # coarse phase + first module component
        mod = "other"
        mm = re.search(r"(transpose\(jvp)?\(?FCOS\)?/([^/]+)", tf_op)
        if mm:
            side = "bwd" if "transpose" in tf_op else "fwd"
            mod = f"{side}:{mm.group(2)}"
        elif "assign" in tf_op or "vmap" in tf_op:
            mod = "assign"
        elif "loss" in tf_op or "focal" in tf_op:
            mod = "loss"
        elif "sgd" in tf_op or "update" in tf_op or "clip" in tf_op:
            mod = "update"
        bymod[mod][0] += e.duration_ps
        bymod[mod][1] += 1
        ops.append((e.duration_ps, md[e.metadata_id].display_name, cat,
                    int(st.get("flops", 0) or 0),
                    int(st.get("raw_bytes_accessed", 0) or 0), tf_op[:90]))

    tot = sum(v[0] for v in bycat.values())
    print(f"\n== by HLO category (device total {tot/1e9:.2f} ms) ==")
    print(f"{'ms':>8} {'%':>5} {'n':>5} {'TFLOP/s':>8} {'GB/s':>7}  category")
    cat_rows = {}
    for cat, (ps, fl, by, n) in sorted(bycat.items(), key=lambda kv: -kv[1][0]):
        sec = ps / 1e12
        tfs = fl / sec / 1e12 if sec else 0
        gbs = by / sec / 1e9 if sec else 0
        print(f"{ps/1e9:8.3f} {100*ps/tot:5.1f} {n:5d} {tfs:8.1f} {gbs:7.0f}"
              f"  {cat}")
        cat_rows[cat] = {
            "ms": round(ps / 1e9, 3), "pct": round(100 * ps / tot, 1),
            "n": n, "tflops_per_s": round(tfs, 1), "gb_per_s": round(gbs, 0),
        }

    print("\n== by module (fwd/bwd split from tf_op provenance) ==")
    for mod, (ps, n) in sorted(bymod.items(), key=lambda kv: -kv[1][0])[:14]:
        print(f"{ps/1e9:8.3f} {100*ps/tot:5.1f} {n:5d}  {mod}")

    print(f"\n== top {top} individual ops ==")
    for ps, name, cat, fl, by, tf_op in sorted(ops, reverse=True)[:top]:
        sec = ps / 1e12
        print(f"{ps/1e9:8.3f} ms  {cat:<24} {fl/sec/1e12 if sec else 0:6.1f}"
              f" TF/s {by/sec/1e9 if sec else 0:6.0f} GB/s  {name[:40]}"
              f"  [{tf_op[:60]}]")
    return {"device_ms": round(tot / 1e9, 2), "by_category": cat_rows}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--img", type=int, default=384)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--trace_dir", default="/tmp/detectax_trace")
    p.add_argument("--xplane", default=None,
                   help="parse an existing xplane.pb instead of tracing")
    p.add_argument("--top", type=int, default=15)
    args = p.parse_args(argv)
    path = args.xplane or run_trace(args.img, args.batch, args.trace_dir)
    summary = parse(path, args.top)
    print(json.dumps({"profile_step_summary": summary}))


if __name__ == "__main__":
    main()
