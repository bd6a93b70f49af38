#!/usr/bin/env python3
"""Scan a graft.Explain dump for scale-killer operators.

Usage:
  sbt "runMain graft.Explain /root/testdata/sf0.001 /tmp/plans"
  python3 tools/plan_audit.py /tmp/plans [expected_plan_count]

Pass the registry size (the README's registered-query count) as the
second argument: graft.Explain swallows per-query failures (no .txt is
written), so a missing plan would otherwise escape the cartesian gate
silently — with the expected count, a partial dump exits 2.

Verdicts:
  - CartesianProduct: always a finding — no registered query may plan one.
  - BroadcastNestedLoopJoin: listed for eyeball audit. Most instances are
    crossJoin(broadcast(<one-row stats>)) — corpus constants riding a
    broadcast, scalable at any size — or documented bounded-side theta
    joins (cosine_topk's fixed query subset). A BNLJ whose broadcast side
    is data-scale IS a finding; the list keeps that check one glance away.
"""
import glob
import os
import sys


def main() -> int:
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/plans"
    files = sorted(glob.glob(f"{d}/*.txt"))
    if not files:
        print(f"no plans under {d} — run graft.Explain first", file=sys.stderr)
        return 2
    if len(sys.argv) > 2:
        expected = int(sys.argv[2])
        if len(files) != expected:
            print(f"PARTIAL DUMP: {len(files)} plans, expected {expected} — "
                  "some queries failed to explain (check Explain's stderr); "
                  "the missing plans are UNAUDITED", file=sys.stderr)
            return 2
    cart, bnlj = [], []
    for f in files:
        t = open(f, encoding="utf-8").read()
        name = os.path.basename(f)[:-4]
        if "CartesianProduct" in t:
            cart.append(name)
        if "BroadcastNestedLoopJoin" in t:
            bnlj.append(name)
    print(f"{len(files)} plans scanned")
    print(f"CartesianProduct: {cart if cart else 'none'}")
    print(f"BroadcastNestedLoopJoin ({len(bnlj)} — audit broadcast side):")
    for n in bnlj:
        print(f"  {n}")
    return 1 if cart else 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:  # `| head` closed stdout — not a finding
        sys.exit(0)
