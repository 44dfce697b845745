"""Diff PLANS.md plan-shape FACTS between two git revisions.

The full formatted plans churn cosmetically (expression ids, AQE plan
ids), so a raw diff is noise. This extracts the stable per-query fact
lines (pushdown, read schema, join strategies, exchange count, top-k
node, AQE) and reports per-query changes — the signal a plan
regression review needs.

Usage:
    python tools/diff_plans.py                # HEAD vs working tree
    python tools/diff_plans.py REV            # REV vs working tree
    python tools/diff_plans.py REV1 REV2
"""

from __future__ import annotations

import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def facts_by_query(text: str) -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for sec in re.split(r"^## ", text, flags=re.M)[1:]:
        name = sec.split("\n", 1)[0].strip()
        # fact lines sit between the header and the ``` plan block
        body = sec.split("```", 1)[0]
        out[name] = [
            ln.strip()
            for ln in body.splitlines()
            if ln.strip().startswith("- ")
        ]
    return out


def load(rev: str | None) -> dict[str, list[str]]:
    if rev is None:
        return facts_by_query((REPO / "PLANS.md").read_text())
    blob = subprocess.run(
        ["git", "show", f"{rev}:PLANS.md"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    return facts_by_query(blob)


def main() -> int:
    args = sys.argv[1:]
    if len(args) == 0:
        old, new = load("HEAD"), load(None)
        label = "HEAD vs working tree"
    elif len(args) == 1:
        old, new = load(args[0]), load(None)
        label = f"{args[0]} vs working tree"
    else:
        old, new = load(args[0]), load(args[1])
        label = f"{args[0]} vs {args[1]}"

    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    changed = {
        q: (old[q], new[q])
        for q in sorted(set(old) & set(new))
        if sorted(old[q]) != sorted(new[q])  # order-insensitive
    }
    print(f"# PLANS diff: {label}")
    if added:
        print(f"added queries ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed queries ({len(removed)}): {', '.join(removed)}")
    for q, (o, n) in changed.items():
        print(f"\n## {q}")
        for ln in o:
            if ln not in n:
                print(f"  - {ln}")
        for ln in n:
            if ln not in o:
                print(f"  + {ln}")
    if not (added or removed or changed):
        print("no plan-shape changes")
    else:
        print(
            f"\n{len(changed)} queries changed,"
            f" {len(added)} added, {len(removed)} removed"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
