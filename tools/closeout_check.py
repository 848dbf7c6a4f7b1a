"""End-of-round close-out gate — run before the snapshot commit.

Round 8 proved the individual gates only work when remembered: its
final snapshot commit added 3 registry queries that were absent from
DRIVER_PRIORITY (rotation starvation), one of which also failed the
plan audit, while COVERAGE.md and the PREFLIGHT sweep were skipped
entirely (round-8 verdict items 1/2/5).  This tool makes the ritual
one command whose failure blocks the snapshot commit:

  python tools/closeout_check.py            # all gates incl. plan audit
  python tools/closeout_check.py --fast     # skip the (slow) plan audit

Gates:
  1. DRIVER_PRIORITY set == registry set, no duplicates.
  2. COVERAGE.md documents the current registry count (the literal
     ``**<count>**`` must appear).
  3. PREFLIGHT_r{ROTATION_ROUND}.log exists, attests >= the registry
     count of ok-lines-or-equivalent via its ``0 failures`` trailer,
     and is newer than every query module (a stale sweep attests
     nothing).
  4. Full plan audit reports 0 warnings (skipped with --fast; the
     non-fast run is the one that counts for close-out).
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    fast = "--fast" in sys.argv
    failures: list[str] = []

    import __spark_entry__ as se
    from aiven_challenge2_cdc_sharing_spark.queries import load_registry

    registry = load_registry()
    prio = se.DRIVER_PRIORITY
    rotation_round = getattr(se, "ROTATION_ROUND", None)

    # gate 1 — priority covers registry exactly
    missing = sorted(set(registry) - set(prio))
    stale = sorted(set(prio) - set(registry))
    if missing:
        failures.append(f"gate1: registry names absent from "
                        f"DRIVER_PRIORITY: {missing}")
    if stale:
        failures.append(f"gate1: DRIVER_PRIORITY names not in "
                        f"registry: {stale}")
    if len(prio) != len(set(prio)):
        failures.append("gate1: duplicate names in DRIVER_PRIORITY")

    # gate 2 — COVERAGE.md documents the current count
    cov = open(os.path.join(ROOT, "COVERAGE.md")).read()
    if f"**{len(registry)}**" not in cov:
        failures.append(f"gate2: COVERAGE.md does not mention the "
                        f"current registry count **{len(registry)}**")

    # gate 3 — this round's full-registry sweep log exists and is fresh
    if rotation_round is None:
        failures.append("gate3: __spark_entry__.ROTATION_ROUND missing")
    else:
        log = os.path.join(ROOT, f"PREFLIGHT_r{rotation_round:02d}.log")
        if not os.path.exists(log):
            failures.append(f"gate3: {os.path.basename(log)} missing — "
                            f"run the full-registry oracle sweep and "
                            f"tee it there")
        else:
            text = open(log, errors="replace").read()
            if "0 failures" not in text:
                failures.append(f"gate3: {os.path.basename(log)} does "
                                f"not end with '0 failures'")
            n_ok = len(re.findall(r"\bok\s+\w+:", text))
            if n_ok < len(registry):
                failures.append(f"gate3: sweep log attests {n_ok} "
                                f"queries < registry {len(registry)}")
            qdir = os.path.join(
                ROOT, "aiven_challenge2_cdc_sharing_spark", "queries")

            def _age(path: str) -> float:
                # A fresh `git checkout` stamps every file with the same
                # mtime, so prefer the committed timestamp; fall back to
                # mtime for uncommitted edits (git returns empty there,
                # and an uncommitted edit must count as newest).
                proc = subprocess.run(
                    ["git", "log", "-1", "--format=%ct", "--",
                     os.path.relpath(path, ROOT)],
                    capture_output=True, text=True, cwd=ROOT)
                ts = proc.stdout.strip()
                dirty = subprocess.run(
                    ["git", "status", "--porcelain", "--",
                     os.path.relpath(path, ROOT)],
                    capture_output=True, text=True, cwd=ROOT).stdout.strip()
                if ts and not dirty:
                    return float(ts)
                return os.path.getmtime(path)

            newest_src = max(
                _age(os.path.join(qdir, f))
                for f in os.listdir(qdir) if f.endswith(".py"))
            if _age(log) < newest_src:
                failures.append(f"gate3: {os.path.basename(log)} is "
                                f"older than the newest query module — "
                                f"re-run the sweep after the last edit")

    # gate 4 — plan audit 0 warnings
    if fast:
        print("gate4: SKIPPED (--fast) — the close-out run must not skip it")
    else:
        proc = subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools", "plan_audit.py")],
            capture_output=True, text=True, cwd=ROOT)
        tail = (proc.stdout or "").strip().splitlines()
        last = tail[-1] if tail else ""
        if proc.returncode != 0 or not last.startswith("0 warnings"):
            failures.append(f"gate4: plan audit not clean — last line: "
                            f"{last!r} (rc={proc.returncode})")
        else:
            print(f"gate4: {last}")

    for f in failures:
        print(f"FAIL {f}")
    if not failures:
        print(f"CLOSEOUT OK — registry {len(registry)}, priority "
              f"{len(prio)}, rotation round {rotation_round}")
        return 0
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
