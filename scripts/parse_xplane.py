"""Parse a jax.profiler xplane trace (from scripts/profile_restore.py) into a
per-HLO-op device-time table, offline via tensorboard_plugin_profile.

Usage:
    python scripts/parse_xplane.py [trace_dir=/tmp/irp_prof] [tool=hlo_stats]

Prints the tool's table (CSV/JSON as provided by the plugin) to stdout; for
hlo_stats additionally prints a top-30 summary by self device time.
"""

from __future__ import annotations

import glob
import json
import os
import sys


def main() -> None:
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/irp_prof"
    tool = sys.argv[2] if len(sys.argv) > 2 else "hlo_stats"
    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    path = paths[-1]
    print(f"# parsing {path} with tool={tool}", file=sys.stderr)

    # the bundled tbp protos are generated with an older protoc than the
    # installed protobuf runtime accepts in C++ mode (measured 2026-08-19:
    # "Descriptors cannot be created directly"); pure-python parsing works
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, content_type = raw_to_tool_data.xspace_to_tool_data([path], tool, params={})
    if isinstance(data, bytes):
        data = data.decode("utf-8", errors="replace")
    print(f"# content_type={content_type}", file=sys.stderr)

    if tool == "hlo_stats":
        # hlo_stats is JSON-ish ({"data": [ [cols...], ...]}); fall back to
        # raw dump if the schema differs across versions
        try:
            payload = json.loads(data)
            rows = payload if isinstance(payload, list) else payload.get("data", [])
            # find header
            header = rows[0]
            idx_time = next(
                i for i, h in enumerate(header)
                if "self" in str(h).lower() and "time" in str(h).lower()
            )
            idx_name = next(
                i for i, h in enumerate(header) if "expression" in str(h).lower()
                or "name" in str(h).lower()
            )
            idx_cat = next(
                (i for i, h in enumerate(header) if "category" in str(h).lower()), None
            )
            body = rows[1:]
            body.sort(key=lambda r: -float(r[idx_time] or 0))
            total = sum(float(r[idx_time] or 0) for r in body)
            print(f"total self device time: {total:.0f} us")
            by_cat: dict = {}
            for r in body:
                cat = str(r[idx_cat]) if idx_cat is not None else "?"
                by_cat[cat] = by_cat.get(cat, 0.0) + float(r[idx_time] or 0)
            print("\nby category:")
            for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1]):
                print(f"  {t/max(total,1e-9)*100:5.1f}%  {t:10.0f} us  {cat}")
            print("\ntop 30 ops by self time:")
            for r in body[:30]:
                print(f"  {float(r[idx_time] or 0):10.0f} us  {str(r[idx_name])[:110]}")
            return
        except Exception as error:  # pragma: no cover - schema drift
            print(f"# structured parse failed ({error!r}); raw dump follows",
                  file=sys.stderr)
    print(data[:200000] if isinstance(data, str) else data)


if __name__ == "__main__":
    main()
