#!/usr/bin/env python3
"""Cross-round per-query bench regression table (judge r14 item 7).

Compares two Bench walls artifacts (the first JSON line of
BENCH_WALLS_LATEST.json — `detail:"full"` with per-query seconds in
`queries` and per-query [start_epoch, loadavg1m] in `query_ctx`) and
emits a markdown table of every query whose wall moved more than
THRESHOLD in either direction, with the loadavg context needed to
adjudicate load vs plan.

Usage:
  python3 tools/bench_regression.py OLD.json NEW.json [--threshold 1.5]

Accepts plain file paths or git revs (REV:path), e.g.
  python3 tools/bench_regression.py 2c5a159:BENCH_WALLS_LATEST.json \
      BENCH_WALLS_LATEST.json
"""
import json
import subprocess
import sys


def load_walls(spec: str) -> dict:
    if ":" in spec and not spec.startswith("/") and not spec.startswith("."):
        text = subprocess.check_output(["git", "show", spec], text=True)
    else:
        with open(spec) as f:
            text = f.read()
    line = text.splitlines()[0]
    d = json.loads(line)
    if "queries" not in d:
        sys.exit(f"{spec}: first line has no 'queries' object")
    return d


def main() -> None:
    argv = sys.argv[1:]
    args, thr, i = [], 1.5, 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--threshold"):
            if "=" in a:
                thr = float(a.split("=", 1)[1])
            elif i + 1 < len(argv):
                i += 1
                thr = float(argv[i])
        else:
            args.append(a)
        i += 1
    if len(args) != 2:
        sys.exit(__doc__)
    old, new = load_walls(args[0]), load_walls(args[1])
    oq, nq = old["queries"], new["queries"]
    octx, nctx = old.get("query_ctx", {}), new.get("query_ctx", {})

    shared = sorted(set(oq) & set(nq))
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    tot_old = sum(oq[q] for q in shared)
    tot_new = sum(nq[q] for q in shared)
    print(f"shared queries: {len(shared)}  "
          f"(+{len(added)} new, -{len(removed)} removed)")
    print(f"shared-set total: {tot_old:.1f}s -> {tot_new:.1f}s "
          f"({tot_new / tot_old:.2f}x); "
          f"run-level load_end {old.get('load_end')} -> {new.get('load_end')}")
    if added:
        print(f"new queries: {', '.join(added)} "
              f"({sum(nq[q] for q in added):.1f}s)")
    print()
    # walls are rounded to 2dp, so a sub-5ms query can record 0.0 —
    # floor both sides at 0.01s to keep the ratio finite
    movers = [(q, max(nq[q], 0.01) / max(oq[q], 0.01)) for q in shared
              if max(oq[q], nq[q]) >= 0.2
              and (max(nq[q], 0.01) / max(oq[q], 0.01) > thr
                   or max(oq[q], 0.01) / max(nq[q], 0.01) > thr)]
    movers.sort(key=lambda kv: -kv[1])
    print(f"| query | old s | new s | ratio | old load | new load |")
    print(f"|---|---|---|---|---|---|")
    for q, r in movers:
        ol = octx.get(q, [None, "?"])[1]
        nl = nctx.get(q, [None, "?"])[1]
        print(f"| {q} | {oq[q]:.2f} | {nq[q]:.2f} | {r:.2f}x | {ol} | {nl} |")
    if not movers:
        print(f"| (none over {thr}x with either wall >= 0.2s) | | | | | |")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # e.g. piped into head
        pass
