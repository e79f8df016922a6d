#!/usr/bin/env python3
"""Round-end stale-number grep (VERDICT r17 item 3, made durable).

Usage: doccheck.py <expected_key_count>

Checks every doc line that historically went stale when the registry
grew — the SURVEY §2.12 running total, the IMPLEMENTATION.md Totals
paragraph, and README headline counts — against the expected graded-key
count. Exits nonzero listing each stale site. Driver-side tooling only —
never imported by the Scala engine.
"""
import re
import sys

SITES = [
    # (file, regex, description, first_match_only) — README is a
    # per-round changelog, so only its CURRENT headline (first match)
    # must track the registry; older rounds legitimately keep their
    # historical counts.
    ("SURVEY.md", r"Running totals: \*\*(\d+) graded keys\*\*",
     "SURVEY §2.12 running-total line", False),
    ("IMPLEMENTATION.md", r"\*\*Totals: (\d+) graded queries",
     "IMPLEMENTATION.md Totals paragraph", False),
    ("README.md", r"(\d+) graded (?:keys|queries)",
     "README headline count", True),
]


def main():
    expected = int(sys.argv[1])
    bad = []
    for path, pat, desc, first_only in SITES:
        try:
            text = open(path).read()
        except FileNotFoundError:
            continue
        hits = re.findall(pat, text)
        if not hits:
            bad.append(f"{path}: no match for {desc!r} — pattern drift?")
            continue
        if first_only:
            hits = hits[:1]
        for h in hits:
            if int(h) != expected:
                bad.append(f"{path}: {desc} says {h}, expected {expected}")
    # the historical staleness class: ANY 'NNN keys'/'NNN graded' mention
    # in the two living docs that is far from the current registry size
    for path in ("SURVEY.md",):
        for m in re.finditer(r"running total .*?\((\d+) keys",
                             open(path).read()):
            if int(m.group(1)) != expected:
                bad.append(f"{path}: §2.12 preamble parenthetical says "
                           f"{m.group(1)} keys, expected {expected}")
    if bad:
        print("DOCCHECK FAIL")
        for b in bad:
            print("  " + b)
        sys.exit(1)
    print(f"DOCCHECK PASS ({expected} keys)")


if __name__ == "__main__":
    main()
