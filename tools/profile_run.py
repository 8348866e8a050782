"""Profile one generation with jax.profiler and print a device-op breakdown.

Usage: python tools/profile_run.py [sdxl|sd15] [outdir]
Parses the perfetto trace.json.gz the profiler writes and aggregates device
op durations by fusion name, printing buckets + the top ops. This is the
evidence source for PERF.md's "where the time goes" table.
"""
import glob, gzip, json, os, sys, collections


def run_trace(model="sdxl", outdir="/tmp/xprof_run"):
    import jax
    from forge_tpu.core.synth import synth_sd15_checkpoint, synth_sdxl_checkpoint
    from forge_tpu.pipeline.engine import load_engine
    from forge_tpu.pipeline.processing import Processing, process_images

    if model == "sdxl":
        eng = load_engine(synth_sdxl_checkpoint(fill="zeros"))
        p = Processing(prompt="bench", seed=1, steps=30, width=1024, height=1024,
                       cfg_scale=7.0, sampler_name="DPM++ 2M", scheduler="karras")
    else:
        eng = load_engine(synth_sd15_checkpoint(fill="zeros"))
        p = Processing(prompt="bench", seed=1, steps=20, width=512, height=512,
                       cfg_scale=7.0, sampler_name="Euler a")
    process_images(eng, p)  # compile
    os.makedirs(outdir, exist_ok=True)
    with jax.profiler.trace(outdir):
        p.seed = 3
        process_images(eng, p)
    print("trace done", flush=True)


def parse(outdir="/tmp/xprof_run", top=40):
    paths = sorted(glob.glob(f"{outdir}/plugins/profile/*/*.trace.json.gz"))
    assert paths, f"no trace under {outdir}"
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    # keep only device-lane complete events (TensorFlow Op/XLA Op lanes)
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = {pid for pid, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e.get("pid"), e.get("tid"))] = e.get("args", {}).get("name", "")
    per_op = collections.Counter()
    per_op_n = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        lane = tid_names.get((e.get("pid"), e.get("tid")), "")
        if "XLA Ops" not in lane:
            continue
        dur = e.get("dur", 0) / 1e3  # ms
        per_op[e["name"]] += dur
        per_op_n[e["name"]] += 1
        total += dur
    buckets = collections.Counter()
    def bucket(name):
        n = name.lower()
        if "conv" in n and "fusion" in n or n.startswith("%conv") or "convolution" in n:
            return "convolution"
        if "flash" in n or "attention" in n or "custom-call" in n:
            return "attention/custom"
        if "reduce" in n:
            return "reduce (norm-stats/softmax)"
        if "dot" in n or "matmul" in n:
            return "matmul"
        if "fusion" in n:
            return "generic fusion"
        if "copy" in n or "transpose" in n or "bitcast" in n or "pad" in n:
            return "copy/layout"
        if "dynamic" in n or "slice" in n or "concatenate" in n:
            return "slice/concat"
        return "other"
    for name, dur in per_op.items():
        buckets[bucket(name)] += dur
    print(f"\ntotal device XLA-op time: {total:.1f} ms over {sum(per_op_n.values())} events")
    print("\n== buckets ==")
    for b, d in buckets.most_common():
        print(f"{d:9.1f} ms  {100*d/total:5.1f}%  {b}")
    print(f"\n== top {top} ops ==")
    for name, dur in per_op.most_common(top):
        print(f"{dur:9.1f} ms  {100*dur/total:5.1f}%  n={per_op_n[name]:5d}  {name[:140]}")


if __name__ == "__main__":
    model = sys.argv[1] if len(sys.argv) > 1 else "sdxl"
    outdir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/xprof_{model}_r3"
    if os.environ.get("PARSE_ONLY") != "1":
        run_trace(model, outdir)
    parse(outdir)
