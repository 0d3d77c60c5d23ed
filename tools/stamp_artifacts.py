#!/usr/bin/env python3
"""Round close-out hygiene: stamp driver-written artifacts with
self-evidencing metadata (ADVICE r8/r9 item: LEAKCHECK.json carries no
timestamp or commit hash, so a stale file is indistinguishable from a
fresh scan). Adds/refreshes `stamped_ts` (UTC ISO) and `stamped_at_commit`
(current git HEAD) on each artifact that exists, preserving all other
fields. Run before the end-of-round snapshot commit:

    python3 tools/stamp_artifacts.py [files...]   # default: LEAKCHECK.json
"""
import datetime
import json
import subprocess
import sys


def main(paths):
    head = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                          capture_output=True, text=True).stdout.strip()
    ts = datetime.datetime.now(datetime.timezone.utc).isoformat()
    for p in paths:
        try:
            with open(p) as f:
                d = json.load(f)
        except FileNotFoundError:
            print(f"skip {p}: not found")
            continue
        d["stamped_ts"] = ts
        d["stamped_at_commit"] = head
        with open(p, "w") as f:
            json.dump(d, f, indent=2)
            f.write("\n")
        print(f"stamped {p} @ {head} {ts}")


if __name__ == "__main__":
    main(sys.argv[1:] or ["LEAKCHECK.json"])
