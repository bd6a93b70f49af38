#!/usr/bin/env python3
"""Scan a graft.Explain dump for scale-killer operators.

Usage:
  sbt "runMain graft.Explain /root/testdata/sf0.001 /tmp/plans"
  python3 tools/plan_audit.py /tmp/plans

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
    sys.exit(main())
