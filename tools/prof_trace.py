"""Capture a jax.profiler trace of the stage-1 bench step and extract
MEASURED device utilization (VERDICT r4 item 2b: "settle the throughput
question with measurements, not analysis").

Runs the exact bench.py contract (1024 rays, scan-chunked train step) on the
attached device, wraps one steady-state chunk in ``jax.profiler.trace``, then
parses the xplane with tensorboard_plugin_profile to report:
  - device duty cycle
  - MXU utilization (measured flop rate / peak)
  - HBM bandwidth utilization
Writes runs/prof_trace.json + the raw tool JSONs next to the trace dir.

Usage: python tools/prof_trace.py [logdir]
"""
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def parse_trace(logdir: str) -> dict:
    """Parse the captured xplane DIRECTLY (the shipped
    tensorboard_plugin_profile binding mismatches this TF build): sum the
    per-op cost-analysis stats (flops, bytes_accessed) over the device op
    stream and divide by the device-busy window from the Steps line, against
    the plane's own hardware peaks.  bytes_accessed is XLA cost analysis
    (operand+output bytes across memory spaces, VMEM hits included), so the
    HBM utilization is an UPPER bound; flops/peak is exact for MFU."""
    import glob

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.xplane.pb")))
    if not paths:
        return {"error": f"no xplane.pb under {logdir}"}
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    dev = next((pl for pl in xs.planes if pl.name.startswith("/device:")),
               None)
    if dev is None:
        return {"error": "no device plane in trace (host-only capture)"}
    mds = {k: v.name for k, v in dev.stat_metadata.items()}

    def stat_val(st):
        return (st.double_value or st.int64_value or st.uint64_value or 0)

    peaks = {mds[st.metadata_id]: stat_val(st) for st in dev.stats
             if st.metadata_id in mds}
    lines = {l.name: l for l in dev.lines}
    steps = lines.get("Steps") or lines.get("XLA Modules")
    busy_s = sum(e.duration_ps for e in steps.events) / 1e12 if steps else 0.0
    wall_s = 0.0
    if steps and steps.events:
        ev = sorted(steps.events, key=lambda e: e.offset_ps)
        wall_s = (ev[-1].offset_ps + ev[-1].duration_ps - ev[0].offset_ps) / 1e12

    # flops / bytes_accessed live on the per-op EVENT METADATA (one entry
    # per HLO op); each timeline event references its metadata id
    md_flops, md_bytes = {}, {}
    for k, m in dev.event_metadata.items():
        for st in m.stats:
            name = mds.get(st.metadata_id)
            if name == "flops":
                md_flops[k] = st.int64_value or st.uint64_value
            elif name == "bytes_accessed":
                md_bytes[k] = st.int64_value or st.uint64_value

    flops = bytes_acc = 0
    ops = lines.get("XLA Ops")
    op_busy_s = 0.0
    if ops:
        for e in ops.events:
            op_busy_s += e.duration_ps / 1e12
            flops += md_flops.get(e.metadata_id, 0)
            bytes_acc += md_bytes.get(e.metadata_id, 0)

    peak_tf = peaks.get("peak_teraflops_per_second", 0.0)
    peak_hbm = peaks.get("peak_hbm_bw_gigabytes_per_second", 0.0)
    out = {
        "xplane": paths[-1],
        "device_busy_s": round(busy_s, 4),
        "device_wall_s": round(wall_s, 4),
        "device_duty_cycle": round(busy_s / wall_s, 4) if wall_s else None,
        "peak_tflops_per_s": peak_tf,
        "peak_hbm_gbps": round(peak_hbm, 1),
        "measured_tflops_per_s": round(flops / busy_s / 1e12, 3)
        if busy_s else None,
        "measured_bytes_per_s_gb": round(bytes_acc / busy_s / 1e9, 1)
        if busy_s else None,
    }
    if busy_s and peak_tf:
        out["mfu_measured"] = round(flops / busy_s / 1e12 / peak_tf, 4)
    if busy_s and peak_hbm:
        out["hbm_bw_utilization_upper_bound"] = round(
            bytes_acc / busy_s / 1e9 / peak_hbm, 4)
    return out


def main():
    import jax

    logdir = sys.argv[1] if len(sys.argv) > 1 else "runs/prof_trace"
    os.makedirs(logdir, exist_ok=True)

    from bench import run

    bench_out = run(quiet=True, profile_logdir=logdir)

    result = {"platform": jax.devices()[0].platform,
              "device": str(jax.devices()[0]),
              "bench": bench_out}
    result.update(parse_trace(logdir))
    os.makedirs("runs", exist_ok=True)
    with open("runs/prof_trace.json", "w") as fjs:
        json.dump(result, fjs, indent=1, default=str)
    print(json.dumps(result, indent=1, default=str))


if __name__ == "__main__":
    main()
