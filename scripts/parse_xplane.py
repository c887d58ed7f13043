"""Parse a jax.profiler xplane trace (from scripts/profile_restore.py) into a
per-HLO-op device-time table.

Usage:
    python scripts/parse_xplane.py [trace_dir=/tmp/irp_prof] [tool=hlo_stats]

Parses the XSpace protobuf directly with TF's bundled ``xplane_pb2`` and
aggregates event durations on the TPU device plane — the
tensorboard_plugin_profile conversion path is broken on this image twice
over (its generated protos predate the installed protobuf runtime, and its
``_pywrap_profiler`` wrapper expects a ``xspace_to_tools_data`` symbol the
installed TF does not export), so we read the trace ourselves:

- ``XLA Ops`` line: self device time per op instance; aggregated by the
  op's metadata name (the HLO instruction) and by its op-category prefix.
- ``XLA Modules`` line: wall device time per compiled module execution.

Prints a JSON payload on stdout (top table + totals) and a human top-30
table on stderr.
"""

from __future__ import annotations

import collections
import glob
import json
import os
import sys

# the bundled protos are generated with an older protoc than the installed
# protobuf runtime accepts in C++ mode ("Descriptors cannot be created
# directly"); pure-python parsing works and must be selected before any
# google.protobuf import
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def summarize_xspace(trace_dir: str, verbose: bool = True) -> dict:
    """Aggregate the newest xplane.pb under ``trace_dir`` into a per-device
    payload: module wall time/runs, per-op self time (top 30), per-category
    totals. Device times come from the chip's own event clocks, so this is
    valid even when the tunnel's D2H path is degraded (the failure mode that
    corrupts host-side chain-differenced timing; docs/STATUS.md 12:05 UTC)."""
    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    path = paths[-1]
    if verbose:
        print(f"# parsing {path}", file=sys.stderr)

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(path, "rb") as fh:
        space.ParseFromString(fh.read())

    device_planes = [p for p in space.planes if "/device:" in p.name and p.lines]
    if not device_planes:
        raise SystemExit(f"no device plane with events in {path}")

    payload = {"trace": path, "planes": {}}
    for plane in device_planes:
        meta = plane.event_metadata
        by_op: dict[str, float] = collections.defaultdict(float)
        by_cat: dict[str, float] = collections.defaultdict(float)
        counts: dict[str, int] = collections.defaultdict(int)
        modules_ms = 0.0
        module_runs = 0
        for line in plane.lines:
            if line.name == "XLA Modules":
                for ev in line.events:
                    modules_ms += ev.duration_ps / 1e9
                    module_runs += 1
                continue
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name if ev.metadata_id in meta else "?"
                ms = ev.duration_ps / 1e9
                by_op[name] += ms
                counts[name] += 1
                # category = HLO opcode prefix of the instruction name
                # (fusion.123 -> fusion, dynamic-update-slice.5 -> d-u-s)
                cat = name.split(".")[0].rstrip("0123456789_")
                by_cat[cat] += ms

        top = sorted(by_op.items(), key=lambda kv: kv[1], reverse=True)[:30]
        total_ops_ms = sum(by_op.values())
        if verbose:
            print(
                f"\n== {plane.name}: {module_runs} module runs, "
                f"{modules_ms:.2f} ms module wall, {total_ops_ms:.2f} ms op self time",
                file=sys.stderr,
            )
            for name, ms in top:
                print(
                    f"  {ms:9.3f} ms  {100.0 * ms / max(total_ops_ms, 1e-9):5.1f}%  "
                    f"x{counts[name]:<5d} {name[:90]}",
                    file=sys.stderr,
                )
            print("  -- by category --", file=sys.stderr)
            for cat, ms in sorted(by_cat.items(), key=lambda kv: kv[1], reverse=True)[:12]:
                print(
                    f"  {ms:9.3f} ms  {100.0 * ms / max(total_ops_ms, 1e-9):5.1f}%  {cat}",
                    file=sys.stderr,
                )
        payload["planes"][plane.name] = {
            "module_runs": module_runs,
            "modules_ms": round(modules_ms, 3),
            "ops_self_ms": round(total_ops_ms, 3),
            "top_ops": [
                {"name": n, "ms": round(ms, 4), "count": counts[n]} for n, ms in top
            ],
            "by_category": {
                c: round(ms, 3)
                for c, ms in sorted(by_cat.items(), key=lambda kv: kv[1], reverse=True)
            },
        }

    return payload


def main() -> None:
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/irp_prof"
    # second arg retained for CLI compatibility with the old tbp-based version
    payload = summarize_xspace(trace_dir)
    print(json.dumps(payload), flush=True)


if __name__ == "__main__":
    main()
