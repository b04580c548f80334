"""Compute the next driver-check window under the r11+ standing
rotation policy (operators/__init__.py ledger): the 50 registry
entries whose most recent driver check is OLDEST win the window —
never-checked first (round 0), then by last-checked round ascending,
ties broken by registry order.  Ops whose code/oracle changed in the
current round should be moved to slot 1 by hand (the tool can't see
the diff).

    python tools/next_window.py [window_size]

Prints the window as a ready-to-paste _PRIORITY block plus a summary
of staleness by round, so post-r10 rounds reorder mechanically.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def last_checked() -> dict[str, int]:
    """name -> most recent round it appeared in a CORRECTNESS artifact
    (0 = never driver-checked)."""
    latest: dict[str, int] = {}
    for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r[0-9]*.json")):
        rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
        for name in json.load(open(f)):
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def main() -> None:
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    from parquet_batch_spark.operators import all_queries

    names = list(all_queries())
    seen = last_checked()
    order = sorted(range(len(names)), key=lambda i: (seen.get(names[i], 0), i))
    window = [names[i] for i in order[:size]]
    by_round: dict[int, int] = {}
    for n in names:
        by_round[seen.get(n, 0)] = by_round.get(seen.get(n, 0), 0) + 1
    print("# staleness (last-checked round -> count):", dict(sorted(by_round.items())))
    print(f"# next {size}-slot window, stalest first:")
    for n in window:
        print(f'    "{n}",')


if __name__ == "__main__":
    main()
