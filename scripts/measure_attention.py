"""On-chip autotune for the Pallas bottleneck attention kernel.

Sweeps (query block BQ, late-divide) over the serving shape the profiler
flagged (bf16 [32, 4096, 64] — 8 images x 4 heads at the 512px bucket,
~2.09 ms/step self time = ~33% of its matmul roofline in the 08-19 trace).

Times with jax.profiler.trace + the chip's own event clocks
(parse_xplane.summarize_xspace) so tunnel launch latency cannot pollute the
numbers — host-timed launch loops over the axon tunnel measure dispatch RPC
rate, not the ~2 ms kernel (observed 08-20: 2.9 ms "host" for a kernel the
xplane clock puts at ~2.1 ms).

Prints one JSON line per variant and a final `best` line. Apply the winner
via PALLAS_ATTN_BQ / PALLAS_ATTN_LATE_DIV (ops/pallas/attention.py reads
them at import).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)
# must be set before ANY google.protobuf import (parse_xplane needs the
# pure-python impl)
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax
import jax.numpy as jnp
import numpy as np

from image_restoration_platform_tpu.ops.pallas import attention as A
from parse_xplane import summarize_xspace

NH = int(os.environ.get("ATTN_NH", "32"))
T = int(os.environ.get("ATTN_T", "4096"))
D = int(os.environ.get("ATTN_D", "64"))
REPS = int(os.environ.get("ATTN_REPS", "30"))
TRACE_ROOT = os.environ.get("ATTN_TRACE_ROOT", "/tmp/irp_prof_attn")


def main() -> None:
    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((NH, T, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((NH, T, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((NH, T, D)), jnp.bfloat16)
    interpret = jax.default_backend() == "cpu"

    # reference output for drift checks (current defaults)
    ref = np.asarray(
        A._attention_nh(q, k, v, interpret=interpret, bq=256, late_div=False),
        np.float32,
    )

    flops = 2 * 2 * NH * T * T * D  # QK^T + PV
    results = []
    for bq in (128, 256, 512, 1024):
        for late_div in (False, True):
            # bq=1024 puts the f32 logits block [1024, T=4096] at 16 MB —
            # at/above per-core VMEM with K/V/q/o resident; a Mosaic
            # VMEM/compile failure must not abort the rest of the matrix.
            try:
                fn = lambda: A._attention_nh(
                    q, k, v, interpret=interpret, bq=bq, late_div=late_div
                )
                out = fn()
                out.block_until_ready()  # compile + warm
                mad = float(np.abs(np.asarray(out, np.float32) - ref).max())
                tdir = os.path.join(TRACE_ROOT, f"bq{bq}_ld{int(late_div)}")
                shutil.rmtree(tdir, ignore_errors=True)
                t0 = time.perf_counter()
                with jax.profiler.trace(tdir):
                    for _ in range(REPS):
                        out = fn()
                    out.block_until_ready()
                host_dt = (time.perf_counter() - t0) / REPS
            except Exception as err:
                rec = {"bq": bq, "late_div": late_div, "error": repr(err)[:300]}
                print(json.dumps(rec), flush=True)
                continue
            try:
                plane = next(iter(summarize_xspace(tdir, verbose=False)["planes"].values()))
                dt = plane["modules_ms"] / REPS / 1e3
                clock = "device"
            except (Exception, SystemExit) as err:  # CPU: no xplane device plane (SystemExit)
                print(f"# xplane unavailable ({err}); host clock", file=sys.stderr)
                dt, clock = host_dt, "host"
            rec = {
                "bq": bq,
                "late_div": late_div,
                "ms": round(dt * 1e3, 3),
                "clock": clock,
                "host_ms": round(host_dt * 1e3, 3),
                "tflops": round(flops / dt / 1e12, 1),
                "max_abs_diff_vs_ref": round(mad, 6),
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)

    if not results:
        print(json.dumps({"best": None, "error": "no variant succeeded"}), flush=True)
        return
    best = min(results, key=lambda r: r["ms"])
    print(json.dumps({"best": best}), flush=True)


if __name__ == "__main__":
    main()
