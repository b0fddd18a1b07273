#!/usr/bin/env python3
"""Turn a check_correctness.py stdout capture into a committed
CORRECTNESS_*.json artifact (the CORRECTNESS_sf0001.json shape), so
out-of-band gates — the RocksDB state-store replay, extra scale
points — leave a diffable record instead of a README sentence.

Usage:
    emit_correctness_artifact.py <checker_stdout_file> <out_json> \
        --sf=sf0.01 --round=12 [--state-store=rocksdb] \
        [--command="..."]
"""
import json
import re
import sys


def main() -> int:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(a[2:].split("=", 1) for a in sys.argv[1:]
                if a.startswith("--") and "=" in a)
    stdout_path, out_path = argv[0], argv[1]
    queries, n_pass, n_skip, n_fail = {}, 0, 0, 0
    with open(stdout_path) as f:
        for line in f:
            m = re.match(r"^(PASS|SKIP|FAIL|ERROR) (q_\w+)", line)
            if not m:
                continue
            status, name = m.group(1), m.group(2)
            if status == "PASS":
                queries[name] = {"status": "pass_strict"}
                n_pass += 1
            elif status == "SKIP":
                queries[name] = {"status": "skip_sf_pinned"}
                n_skip += 1
            else:
                queries[name] = {
                    "status": status.lower(),
                    "detail": line.strip()[:300]}
                n_fail += 1
    art = {
        "sf": opts.get("sf", "sf0.01"),
        "mode": "strict (full-precision float compare)",
        "command": opts.get("command", ""),
        "n_pass": n_pass,
        "n_skip_pinned": n_skip,
        "n_fail": n_fail,
        "round": int(opts.get("round", 0)),
    }
    if "state-store" in opts:
        art["state_store"] = opts["state-store"]
    art["queries"] = dict(sorted(queries.items()))
    with open(out_path, "w") as f:
        json.dump(art, f, indent=1)
        f.write("\n")
    print(f"wrote {out_path}: {n_pass} pass, {n_skip} skip, "
          f"{n_fail} fail/error over {len(queries)} queries")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
