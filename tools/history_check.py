#!/usr/bin/env python3
"""Bench-history monotonicity gate (VERDICT r16 #1).

Round 16 committed an upward revision of a recorded best
(corpus_card 322ms -> 867ms, commit 129f13e) that neither sanctioned
rebaseline arm accounts for, silently loosening that query's
regression-tripwire threshold ~2.7x. The writer-side guard
(Bench.writeHistoryGuarded) now clamps unattributed upward moves at
write time; THIS tool is the commit-time half of the same contract:

  - diff the working-tree bench_history.json against a committed
    snapshot (argv[1], default HEAD);
  - every key whose value moved UP must have a matching record in
    bench_adoptions.jsonl (key + adopted value exactly) — the ledger
    Bench appends for every adoption that takes effect;
  - any unattributed upward move fails the gate (exit 1).

Run as part of the round-close gates (consistency_check.py invokes
it); also useful manually with e.g. `history_check.py HEAD~1` after
a round lands.
"""
import json
import re
import subprocess
import sys


def parse_hist(txt: str) -> dict:
    return {m.group(1): int(m.group(2))
            for m in re.finditer(r'"([^"]+)":\s*(\d+)', txt)}


def main() -> int:
    ref = sys.argv[1] if len(sys.argv) > 1 else "HEAD"
    proc = subprocess.run(["git", "show", f"{ref}:bench_history.json"],
                          capture_output=True, text=True)
    if proc.returncode != 0:
        print(f"history_check: no bench_history.json at {ref} — nothing to diff")
        return 0
    old = parse_hist(proc.stdout)
    try:
        cur = parse_hist(open("bench_history.json", encoding="utf-8").read())
    except FileNotFoundError:
        print("history_check: bench_history.json missing in working tree")
        return 1

    adoptions = {}
    try:
        for line in open("bench_adoptions.jsonl", encoding="utf-8"):
            line = line.strip()
            if line:
                rec = json.loads(line)
                adoptions[rec["key"]] = rec["adopted"]
    except FileNotFoundError:
        pass

    bad = []
    attributed = 0
    for key, val in sorted(cur.items()):
        prev = old.get(key)
        if prev is None or val <= prev:
            continue
        if adoptions.get(key) == val:
            attributed += 1
        else:
            bad.append(f"UNATTRIBUTED UPWARD MOVE: {key} {prev} -> {val} "
                       f"(no matching bench_adoptions.jsonl record)")
    if bad:
        for b in bad:
            print(b)
        return 1
    print(f"history_check vs {ref}: {len(cur)} entries, "
          f"{attributed} attributed upward moves, 0 unattributed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
