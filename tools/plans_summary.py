#!/usr/bin/env python3
"""Summarize `runMain graft.tools.Explain` output into PLANS.md bullet
lines: join types, scans with pushed filters, hash/range exchanges,
generates, windows, window-group-limits per query.

Usage: sbt -batch "runMain graft.tools.Explain <sfDir>" 2>&1 \
         | python3 tools/plans_summary.py
Prints the bullet list to stdout; paste into PLANS.md.
"""
import re
import sys

text = sys.stdin.read()
sections = re.split(r"===== (\S+) =====", text)[1:]
for name, body in zip(sections[::2], sections[1::2]):
    # detail blocks look like "(12) Exchange"; count those, not the tree
    # the "[info] " prefix is optional: run/outputStrategy :=
    # StdoutOutput emits bare lines, plain `sbt run` prefixes them
    details = re.findall(r"^(?:\[info\] )?\((\d+)\) (\w+)", body, re.M)
    nodes = [n for _, n in details]
    joins = sorted({n for n in nodes if n.endswith("Join")})
    hash_ex = len(re.findall(r"Arguments: hashpartitioning\(", body))
    range_ex = len(re.findall(r"Arguments: rangepartitioning\(", body))
    scans_pushed = len(re.findall(
        r"PushedFilters: \[(?!\])", body))
    gens = nodes.count("Generate")
    wins = nodes.count("Window")
    wgl = nodes.count("WindowGroupLimit")
    extra = f", windowGroupLimits={wgl}" if wgl else ""
    print(f"- **{name}**: joins={joins or ['none']}, "
          f"scansWithPushedFilters={scans_pushed}, "
          f"hashExchanges={hash_ex}, rangeExchanges={range_ex}, "
          f"generates={gens}, windows={wins}{extra}")
