#!/usr/bin/env python3
"""Compare two bench artifacts by per-query ratio, not by total.

Usage: benchcmp.py <old.json> <new.json> [threshold]

Host CPU allocation varies between sessions (PLANS.md round-10
telemetry note: a zero-steal quiet window still ran ~1.4x slower than
the round-8 artifact, uniformly), so totals are not comparable across
rounds. What IS comparable: the per-query ratio distribution. A
host-level shift moves every query by the same factor (tight ratio
spread); a plan regression moves specific queries (outliers above the
spread). This prints both, flagging queries whose ratio exceeds
<threshold> (default 1.5) times the median ratio.

Accepts either the raw Bench JSON line or the driver's wrapper
({"parsed": {...}}). Driver-side tooling only — never imported by the
Scala engine.
"""
import sys, json, statistics


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    return d


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    qo, qn = old["queries"], new["queries"]
    shared = sorted(k for k in qn if k in qo and qo[k] > 0)
    if not shared:
        print("no shared queries"); sys.exit(2)
    ratios = {k: qn[k] / qo[k] for k in shared}
    med = statistics.median(ratios.values())
    print(f"totals: {old.get('value')} -> {new.get('value')} "
          f"(old n={old.get('n_queries')}, new n={new.get('n_queries')})")
    print(f"attribution: old load={old.get('load_start')}->{old.get('load_end')} "
          f"steal={old.get('steal_frac')} | "
          f"new load={new.get('load_start')}->{new.get('load_end')} "
          f"steal={new.get('steal_frac')}")
    print(f"{len(shared)} shared queries; ratio median {med:.2f}, "
          f"min {min(ratios.values()):.2f}, max {max(ratios.values()):.2f}")
    only_old = sorted(set(qo) - set(qn))
    only_new = sorted(set(qn) - set(qo))
    if only_old: print(f"dropped ({len(only_old)}): {', '.join(only_old)}")
    if only_new: print(f"added ({len(only_new)}): {', '.join(only_new)}")
    flagged = {k: r for k, r in ratios.items() if r > threshold * med}
    if flagged:
        print(f"\nFLAGGED (> {threshold:.2f}x the median ratio — "
              "plan-level suspects, not host noise):")
        for k, r in sorted(flagged.items(), key=lambda x: -x[1]):
            print(f"  {k}: {qo[k]:.2f}s -> {qn[k]:.2f}s ({r:.2f}x vs median {med:.2f}x)")
        sys.exit(1)
    print("\nno per-query outliers: the shift (if any) is uniform -> host-level")
    sys.exit(0)


if __name__ == "__main__":
    main()
