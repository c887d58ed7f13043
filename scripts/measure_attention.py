"""On-chip autotune for the Pallas bottleneck attention kernel.

Sweeps (query block BQ, late-divide) over the serving shape the profiler
flagged (bf16 [32, 4096, 64] — 8 images x 4 heads at the 512px bucket,
~2.09 ms/step self time = ~33% of its matmul roofline in the 08-19 trace).
Times repeated launches host-side around a single block_until_ready — no
bulk D2H, so this runs on a degraded tunnel (only sync RPCs).

Prints one JSON line per variant and a final `best` line. Apply the winner
via PALLAS_ATTN_BQ / PALLAS_ATTN_LATE_DIV (ops/pallas/attention.py reads
them at import).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np

from image_restoration_platform_tpu.ops.pallas import attention as A

NH = int(os.environ.get("ATTN_NH", "32"))
T = int(os.environ.get("ATTN_T", "4096"))
D = int(os.environ.get("ATTN_D", "64"))
REPS = int(os.environ.get("ATTN_REPS", "50"))


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
            fn = lambda: A._attention_nh(
                q, k, v, interpret=interpret, bq=bq, late_div=late_div
            )
            out = fn()
            out.block_until_ready()  # compile + warm
            t0 = time.perf_counter()
            for _ in range(REPS):
                out = fn()
            out.block_until_ready()
            dt = (time.perf_counter() - t0) / REPS
            mad = float(np.abs(np.asarray(out, np.float32) - ref).max())
            rec = {
                "bq": bq,
                "late_div": late_div,
                "ms": round(dt * 1e3, 3),
                "tflops": round(flops / dt / 1e12, 1),
                "max_abs_diff_vs_ref": round(mad, 6),
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)

    best = min(results, key=lambda r: r["ms"])
    print(json.dumps({"best": best}), flush=True)


if __name__ == "__main__":
    main()
