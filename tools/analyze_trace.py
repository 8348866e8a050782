"""Analyze a jax.profiler perfetto trace: per-category and per-op roofline.

Usage: python tools/analyze_trace.py /tmp/xprof_sdxl_r3 [top]
Excludes control-flow wrapper ops (while/conditional) that double-count their
children. Prints achieved TFLOPS / GB/s per op so bandwidth- vs compute-bound
is visible directly (v5e peak: ~197 TFLOPS bf16, ~819 GB/s HBM).
"""
import glob, gzip, json, sys, collections, re


def load(outdir):
    paths = sorted(glob.glob(f"{outdir}/plugins/profile/*/*.trace.json.gz"))
    assert paths, f"no trace under {outdir}"
    with gzip.open(paths[-1], "rt") as f:
        return json.load(f)["traceEvents"]


def analyze(outdir, top=40):
    ev = load(outdir)
    tid_names = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e.get("pid"), e.get("tid"))] = e.get("args", {}).get("name", "")
    rows = []
    for e in ev:
        if e.get("ph") != "X":
            continue
        if "XLA Ops" not in tid_names.get((e.get("pid"), e.get("tid")), ""):
            continue
        name = e["name"]
        if name.startswith(("while", "conditional", "body", "condition")):
            continue
        a = e.get("args", {})
        dur_ms = int(a.get("device_duration_ps", e.get("dur", 0) * 1e6)) / 1e9
        rows.append((name, dur_ms, a.get("hlo_category", "?"),
                     int(a.get("model_flops", 0) or 0),
                     int(a.get("bytes_accessed", 0) or 0),
                     a.get("long_name", "")))
    total = sum(r[1] for r in rows)
    cats = collections.defaultdict(lambda: [0.0, 0, 0])
    for name, dur, cat, fl, by, ln in rows:
        cats[cat][0] += dur; cats[cat][1] += fl; cats[cat][2] += by
    print(f"total device op time (excl. control-flow wrappers): {total:.1f} ms")
    print("\n== categories ==")
    print(f"{'ms':>9} {'%':>6} {'TFLOPS':>7} {'GB/s':>6}  category")
    for cat, (dur, fl, by) in sorted(cats.items(), key=lambda kv: -kv[1][0]):
        tflops = fl / (dur / 1e3) / 1e12 if dur else 0
        gbps = by / (dur / 1e3) / 1e9 if dur else 0
        print(f"{dur:9.1f} {100*dur/total:5.1f}% {tflops:7.1f} {gbps:6.0f}  {cat}")
    agg = collections.defaultdict(lambda: [0.0, 0, 0, 0, ""])
    for name, dur, cat, fl, by, ln in rows:
        k = name
        agg[k][0] += dur; agg[k][1] += fl; agg[k][2] += by; agg[k][3] += 1
        agg[k][4] = ln
    print(f"\n== top {top} ops ==")
    print(f"{'ms':>8} {'%':>6} {'n':>5} {'TFLOPS':>7} {'GB/s':>6}  op | shape")
    for name, (dur, fl, by, n, ln) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]:
        tflops = fl / (dur / 1e3) / 1e12 if dur else 0
        gbps = by / (dur / 1e3) / 1e9 if dur else 0
        m = re.match(r"%\S+ = (\S+?)\{", ln)
        shape = m.group(1) if m else ln[:60]
        print(f"{dur:8.1f} {100*dur/total:5.1f}% {n:5d} {tflops:7.1f} {gbps:6.0f}  {name} | {shape}")


if __name__ == "__main__":
    analyze(sys.argv[1] if len(sys.argv) > 1 else "/tmp/xprof_sdxl_r3",
            int(sys.argv[2]) if len(sys.argv) > 2 else 40)
