"""Regenerate __spark_entry__.DRIVER_PRIORITY for the next round.

The driver caps each round's CORRECTNESS run at ~50 registry entries,
taken in dict order.  This tool reads every CORRECTNESS_r*.json in the
repo root and orders the registry so that:

1. queries whose LATEST driver row is not fully green (err, or any of
   rows/schema/hash false) come first — these are fixed-and-requeued
   re-checks and must land inside the next 50-row window, then
2. queries with NO driver row in any round so far (oracle-bearing
   before rows-only, preserving current registry order within each
   group), then
3. everything already green, oldest-checked first (regression
   rotation).

Prints the new list as Python source to paste into __spark_entry__.py
(it does not edit the file — the list is load-bearing and reviewed).

Usage: python tools/rotate_priority.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aiven_challenge2_cdc_sharing_spark.queries import load_registry


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    registry = load_registry()
    checked: dict[str, tuple[int, bool]] = {}  # name -> (round, ok)
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int("".join(c for c in os.path.basename(path) if c.isdigit()))
        for name, row in json.load(open(path)).items():
            # fully green = no (real) error AND no explicit false on
            # any of the three matches.  A 'no_oracle' row counted as
            # a verdict ONLY while the query still has no oracle: once
            # an oracle exists, the old rows-only row no longer
            # attests anything and the query must re-check (this is
            # exactly how agg_approx_count_distinct went invisible
            # for two rounds — judge finding, round 3).
            has_oracle = (
                name in registry and registry[name].oracle is not None
            )
            ok = (
                row.get("err") is None
                or (row.get("err") == "no_oracle" and not has_oracle)
            ) and not any(
                row.get(k) is False
                for k in ("rows_match", "schema_match", "hash_match")
            )
            prev = checked.get(name)
            if prev is None or rnd >= prev[0]:
                checked[name] = (rnd, ok)

    names = list(registry)
    never = [n for n in names if n not in checked]
    never_oracle = [n for n in never if registry[n].oracle is not None]
    never_rows_only = [n for n in never if registry[n].oracle is None]
    errored = [n for n in names if n in checked and not checked[n][1]]
    green = sorted(
        (n for n in names if n in checked and checked[n][1]),
        key=lambda n: checked[n][0],
    )

    ordered = errored + never_oracle + never_rows_only + green
    print(f"# {len(errored)} re-checks (latest row not green), "
          f"{len(never_oracle)} never-checked oracle-bearing, "
          f"{len(never_rows_only)} never-checked rows-only, "
          f"{len(green)} green (oldest first)")
    print("DRIVER_PRIORITY: list[str] = [")
    for n in ordered:
        print(f'    "{n}",')
    print("]")
    latest = max(
        (
            int("".join(c for c in os.path.basename(p) if c.isdigit()))
            for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
        ),
        default=0,
    )
    # the round-8 close-out bug was a rotation pasted WITHOUT the stamp
    # bump: test_window_has_no_already_green_fillers evaluates the
    # window against rounds < ROTATION_ROUND, so a stale stamp makes a
    # correct rotation look like green-filler padding (or vice versa)
    print(f"ROTATION_ROUND = {latest + 1}  "
          f"# paste BOTH lines; latest CORRECTNESS is r{latest:02d}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
