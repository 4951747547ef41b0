"""Op-level TPU step profile at the real-data (Visium) config.

Captures a ``jax.profiler`` trace of the scanned train loop at N=4,050,
m=200, S=5, L=10 (the reference's real-data config,
/root/reference/experiments/expression/visium/visium_alignment.py:48-49),
parses the Chrome-trace events from the device track, and writes a per-op
time-share table to ``experiments/out/op_profile_visium.json``.

This answers the VERDICT r2 item-3 follow-up: the variant-level deltas in
step_profile.json attribute square->triangular to the variational
factorizations, but the remaining ~4 ms/step at m=200 was unattributed
("many small solves/matmuls"). The op table names them.
"""

import argparse
import glob
import gzip
import json
import os
import re
import sys
import tempfile
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def build_model(n_spots, m, seed=0, **kw):
    import jax
    from spatial_alignment_tpu import VariationalGPSA
    from spatial_alignment_tpu.data.simulated import generate_twod_data

    X, Y, n_samples_list, view_idx = generate_twod_data(
        n_views=2,
        n_outputs=10,
        grid_size=int(np.sqrt(n_spots // 2)),
        n_latent_gps=None,
        kernel_lengthscale=5.0,
        kernel_variance=0.5,
        rng=np.random.default_rng(seed),
    )
    data_dict = {
        "expression": {
            "spatial_coords": X.astype(np.float32),
            "outputs": Y.astype(np.float32),
            "n_samples_list": n_samples_list,
        }
    }
    model = VariationalGPSA(
        data_dict,
        m_X_per_view=m,
        m_G=m,
        n_latent_gps={"expression": 10},
        mean_function="identity_fixed",
        fixed_view_idx=0,
        **kw,
    )
    return model


_NAME_FALLBACK = [
    # Used when the trace carries no hlo_category metadata (older profilers /
    # non-TPU backends) — coarse, but better than a flat "other" bucket.
    ("cholesky", re.compile(r"cholesky", re.I)),
    ("triangular_solve", re.compile(r"triangular|trsm", re.I)),
    ("dot/matmul", re.compile(r"dot|convolution|gemm", re.I)),
    ("rng", re.compile(r"rng|threefry|philox|rbg", re.I)),
    ("copy/formatting", re.compile(r"copy|bitcast|transpose|tuple|slice", re.I)),
]


def categorize(name, custom_target="", hlo_category=""):
    """Bucket a device op by its trace-metadata ``hlo_category`` plus the
    custom_call_target for custom-calls (TPU lowers cholesky to blocked
    "Cholesky" panels and triangular_solve to
    "InvertDiagBlocksLowerTriangular" + block matmuls). ``custom_target``
    must be extracted from the UNtruncated long_name (parse_trace does) —
    regexing a truncated prefix misbuckets long-operand custom-calls."""
    if hlo_category == "custom-call":
        if "Cholesky" in custom_target:
            return "cholesky"
        if "Triangular" in custom_target or "triangular" in custom_target:
            return "triangular_solve"
        if custom_target == "tpu_custom_call":
            return "pallas_kernel"
        return "formatting(custom-call)"
    if hlo_category == "convolution fusion":
        return "dot/matmul"
    if hlo_category in ("loop fusion", "custom fusion", "non-fusion elementwise",
                        "output fusion", "input fusion"):
        if re.search(r"rng|threefry|philox|rbg", name, re.I):
            return "rng"
        return "elementwise_fusion"
    if hlo_category in ("data formatting", "copy-start", "copy-done", "copy",
                        "slice", "dynamic-slice", "dynamic-update-slice",
                        "broadcast", "pad", "bitcast", "reshape", "transpose",
                        "async-start", "async-done"):
        return "copy/formatting"
    if "reduce" in hlo_category:
        return "reduce"
    if hlo_category:
        return hlo_category
    for cat, pat in _NAME_FALLBACK:
        if pat.search(name):
            return cat
    return "other"


# Container / non-op spans that nest real ops inside them; counting them
# would double every microsecond (the round-3 parse bug: "while.94" +
# "jit_scan_loop" + the bare step-number track each re-counted the step).
_CONTAINER = re.compile(r"^while|^jit_|^\d+$|^conditional", re.I)


def parse_trace(tracedir):
    """Aggregate device-track op durations from the newest trace.json.gz."""
    paths = sorted(
        glob.glob(os.path.join(tracedir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {tracedir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # Identify device pids: process_name metadata containing 'TPU' / 'device'
    pid_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev.get("args", {}).get("name", "")
    device_pids = {
        pid
        for pid, name in pid_names.items()
        if ("TPU" in name or "Device" in name.title()) and "Host" not in name
    }
    if not device_pids:
        # Fallback for backends whose process naming differs (e.g. the axon
        # remote-compile tunnel): any track carrying fusion/dot/cholesky-named
        # complete events is a device track.
        oplike = re.compile(r"fusion|dot|cholesky|triangular|copy|rng", re.I)
        for drop_host in (True, False):  # last resort: CPU backend = host track
            device_pids = {
                ev["pid"]
                for ev in events
                if ev.get("ph") == "X" and oplike.search(ev.get("name", ""))
                and not (drop_host and "Host" in pid_names.get(ev.get("pid"), ""))
            }
            if device_pids:
                break
    op_time = defaultdict(float)
    op_count = defaultdict(int)
    op_long = {}
    op_target = {}
    op_cat = {}
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        name = ev.get("name", "")
        args = ev.get("args", {}) or {}
        cat = args.get("hlo_category", "")
        # Skip container spans (while loops, jit entry markers, the bare
        # step-number track) — their children are counted individually.
        if cat in ("while", "conditional") or _CONTAINER.match(name):
            continue
        dur = float(ev.get("dur", 0.0))  # microseconds
        op_time[name] += dur
        op_count[name] += 1
        if "long_name" in args:
            ln = args["long_name"]
            if name not in op_long:
                op_long[name] = ln[:300]
            # Extract the custom-call target from the FULL long_name before
            # truncation (operand text can push it past any fixed prefix).
            if name not in op_target:
                m = re.search(r'custom_call_target="([^"]+)"', ln)
                if m:
                    op_target[name] = m.group(1)
        if cat:  # don't pin an empty category from a metadata-less event
            op_cat.setdefault(name, cat)
        total += dur
    return op_time, op_count, op_long, op_target, op_cat, total, pid_names


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-spots", type=int, default=4050)
    ap.add_argument("--m", type=int, default=200)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--out", default="experiments/out/op_profile_visium.json")
    ap.add_argument("--triangular", action="store_true")
    args = ap.parse_args()

    import jax

    model = build_model(
        args.n_spots, args.m, triangular_variational=args.triangular
    )
    loop, opt_state = model.make_train_loop(lr=1e-2, S=5)
    carry = (model.params, opt_state, jax.random.PRNGKey(0))
    carry, losses = loop(carry, args.steps)  # compile + warmup
    losses.block_until_ready()
    t0 = time.perf_counter()
    carry, losses = loop(carry, args.steps)
    losses.block_until_ready()
    steps_per_sec = args.steps / (time.perf_counter() - t0)

    tracedir = tempfile.mkdtemp(prefix="opprof_")
    with jax.profiler.trace(tracedir):
        carry, losses = loop(carry, args.steps)
        losses.block_until_ready()

    (op_time, op_count, op_long, op_target, op_cat, total,
     pid_names) = parse_trace(tracedir)
    cat_time = defaultdict(float)
    for name, t in op_time.items():
        cat_time[categorize(name, op_target.get(name, ""), op_cat.get(name, ""))] += t
    top = sorted(op_time.items(), key=lambda kv: -kv[1])[:40]
    record = {
        "config": {
            "n_spots": args.n_spots,
            "m": args.m,
            "S": 5,
            "steps_traced": args.steps,
            "triangular": bool(args.triangular),
        },
        "platform": jax.devices()[0].platform,
        "steps_per_sec_untraced": steps_per_sec,
        "device_total_us_per_step": total / args.steps,
        "category_shares": {
            k: v / total for k, v in sorted(cat_time.items(), key=lambda kv: -kv[1])
        } if total else {},
        "top_ops": [
            {
                "name": n,
                "us_per_step": t / args.steps,
                "share": t / total,
                "count_per_step": op_count[n] / args.steps,
                "hlo": op_long.get(n, ""),
            }
            for n, t in top
        ],
        "process_names": {str(k): v for k, v in pid_names.items()},
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps({k: record[k] for k in ("steps_per_sec_untraced", "device_total_us_per_step")}))
    for k, v in record["category_shares"].items():
        print(f"{k:20s} {v:6.1%}")
    for o in record["top_ops"][:20]:
        print(f"{o['share']:6.1%} {o['us_per_step']:9.1f}us x{o['count_per_step']:5.1f}  {o['name'][:40]:40s} {o['hlo'][:100]}")


if __name__ == "__main__":
    main()
