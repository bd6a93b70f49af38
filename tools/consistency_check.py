#!/usr/bin/env python3
"""Docs-vs-registry consistency gate (round 11): the round-10 verdict's
"ledger drifted at round close" failure mode, automated. Cross-checks

  1. SparkEntry.queries keys  vs  SparkEntry.oracleSql keys
     (every query needs an oracle or a deliberate rows-only status),
  2. README's "<N> oracle-verified + <M> rows-only (<T> registered)"
     line against the actual registry,
  3. README's "other <K> registered queries" line (K == T - 2:
     wordcount and wordcount_x8 are the parity pair),
  4. every registered query name appears somewhere in SURVEY.md
     (the §8 ledger is the auditable coverage record).

Exit 0 = consistent; nonzero prints every drift. Run before the
end-of-round snapshot.
"""
import re
import sys

def main() -> int:
    src = open("src/main/scala/graft/SparkEntry.scala", encoding="utf-8").read()
    qstart = src.index("def queries")
    ostart = src.index("def oracleSql")
    queries = set(re.findall(r'"([a-z0-9_]+)" -> \(\(', src[qstart:ostart]))
    # Anchor oracle keys to actual map entries — line start at the
    # map's 4-space indent — so a quoted name followed by '->' inside
    # SQL text or a comment can't masquerade as an orphan oracle
    # (ADVICE r11: the old union-intersect line was a no-op).
    oracles = set(re.findall(r'^    "([a-z0-9_]+)" ->', src[ostart:], re.M))
    problems = []

    orphan_oracles = sorted(o for o in oracles if o not in queries)
    if orphan_oracles:
        problems.append(f"oracleSql keys with no query: {orphan_oracles}")
    rows_only = sorted(q for q in queries if q not in oracles)
    n_oracle = len(queries & oracles)

    readme = open("README.md", encoding="utf-8").read()
    m = re.search(r"\*\*(\d+) oracle-verified \+ (\d+) rows-only queries \((\d+)\s*\nregistered\)\*\*", readme)
    if not m:
        problems.append("README counts line not found / reformatted")
    else:
        ro, rr, rt = map(int, m.groups())
        if ro != n_oracle:
            problems.append(f"README says {ro} oracle-verified, registry has {n_oracle}")
        if rr != len(rows_only):
            problems.append(f"README says {rr} rows-only, registry has {len(rows_only)}: {rows_only}")
        if rt != len(queries):
            problems.append(f"README says {rt} registered, registry has {len(queries)}")
    m2 = re.search(r"other (\d+) registered queries cover ground", readme)
    if m2 and int(m2.group(1)) != len(queries) - 2:
        problems.append(
            f"README 'other N' line says {m2.group(1)}, expected {len(queries) - 2}")

    survey = open("SURVEY.md", encoding="utf-8").read()
    unledgered = sorted(q for q in queries if f"`{q}`" not in survey and q not in survey)
    if unledgered:
        problems.append(f"registered queries absent from SURVEY.md: {unledgered}")

    # 5. bench-history monotonicity (VERDICT r16 #1): any upward best
    # revision vs HEAD must carry a bench_adoptions.jsonl record.
    import subprocess, os
    hc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "history_check.py")],
        capture_output=True, text=True)
    if hc.returncode != 0:
        problems.append("bench_history monotonicity: " + hc.stdout.strip())

    if problems:
        for p in problems:
            print(f"DRIFT: {p}")
        return 1
    print(f"consistent: {len(queries)} registered = {n_oracle} oracle + "
          f"{len(rows_only)} rows-only; README and SURVEY in sync")
    return 0

if __name__ == "__main__":
    sys.exit(main())
