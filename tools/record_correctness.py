#!/usr/bin/env python3
"""Convert a check_oracle.py transcript into a committed JSON record.

Usage: record_correctness.py <oracle_output.txt> <out.json> [meta...]
where meta are key=value pairs stamped into "_meta".

Dev tool for out-of-band suite records (e.g. the sf1 run) — the
driver's own CORRECTNESS_r{N}.json stays the per-round gate; this
preserves the same per-query verdicts for runs the driver doesn't
take.
"""
import json
import re
import sys


def main():
    src, dst = sys.argv[1], sys.argv[2]
    meta = dict(kv.split("=", 1) for kv in sys.argv[3:])
    rec = {}
    for line in open(src):
        m = re.match(r"PASS (\S+) \((\d+) rows\)", line)
        if m:
            rec[m.group(1)] = {"pass": True, "rows": int(m.group(2))}
            continue
        m = re.match(r"FAIL (\S+): (.*)", line)
        if m:
            rec[m.group(1)] = {"pass": False, "err": m.group(2).strip()}
    n_pass = sum(1 for v in rec.values() if v["pass"])
    out = {"_meta": {**meta, "n": len(rec), "pass": n_pass,
                     "fail": len(rec) - n_pass}}
    out.update(dict(sorted(rec.items())))
    json.dump(out, open(dst, "w"), indent=1)
    print(f"{dst}: {n_pass}/{len(rec)} pass")


if __name__ == "__main__":
    main()
