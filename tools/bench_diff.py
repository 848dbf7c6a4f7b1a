"""Per-query bench diff — the regression triage the round-7/8 verdicts
performed by hand ("my full per-query diff"), committed as a tool so
every round runs the same protocol.

Compares two bench JSON files (either ``BENCH_FULL.json`` shape with a
top-level ``queries`` dict, or a driver ``BENCH_r{N}.json`` with the
timings under ``parsed.queries``) and reports:

- the host factor: when BOTH payloads carry a host probe
  (``host_probe_par8_sec`` preferred — round-9 measured the contention
  as multi-core — else ``host_probe_sec``), every per-query ratio is
  divided by the probe ratio, so a uniformly slower VM does not read
  as hundreds of regressions (round-9 verdict task 2; rounds 7-9 each
  burned a hand-attribution cycle proving exactly this);
- movers OUTSIDE the same-code variance band: the three committed
  round-9 same-code suite runs (856.9 / 795.5 / 996.0 s) put
  same-code per-query swings at +-100% on sub-2s queries and suite
  totals at +-25% (BASELINE.md round-9 notes), so the default band
  flags only queries whose PROBE-NORMALIZED ratio exceeds
  ``--band`` (default 2.0) in either direction AND whose normalized
  delta exceeds ``--reg-abs`` seconds.  Deltas inside the band are
  not findings — re-measure a flagged query with
  ``python bench.py --only name --reps 3`` before attributing;
- legacy raw regressions/improvements at ``--reg-pct``/``--reg-abs``
  (printed only with ``--raw``, for payloads without probes);
- added / removed query names;
- totals over the shared subset, raw and probe-normalized.

Usage: python tools/bench_diff.py [OLD.json NEW.json] [--band 2.0]
       [--reg-abs 0.3] [--raw] [--reg-pct 15]

With no positional args, diffs the two newest round-stamped
``BENCH_FULL_r{N}.json`` files in the repo root (round-10 verdict task
5: bench.py stamps every suite run, so the cross-round diff no longer
depends on which copy of BENCH_FULL.json survived in the tree).
"""

from __future__ import annotations

import argparse
import glob
import json
import os


def load_payload(path: str) -> dict:
    with open(path) as fh:
        data = json.load(fh)
    if "parsed" in data and isinstance(data["parsed"], dict):
        data = data["parsed"]
    return data


def load_timings(path: str) -> dict[str, float]:
    qs = load_payload(path).get("queries") or {}
    return {k: float(v) for k, v in qs.items()}


def host_factor(old: dict, new: dict) -> tuple[float | None, str]:
    """probe_new / probe_old, preferring the 8-process probe.

    A -1.0 probe is the timed-out sentinel and is skipped."""
    for key in ("host_probe_par8_sec", "host_probe_sec"):
        po, pn = old.get(key), new.get(key)
        if po and pn and po > 0 and pn > 0:
            return float(pn) / float(po), key
    return None, "none"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old", nargs="?", default=None)
    ap.add_argument("new", nargs="?", default=None)
    ap.add_argument("--band", type=float, default=2.0,
                    help="same-code variance band on the probe-normalized "
                         "per-query ratio (round-9 same-code runs: +-100%% "
                         "on sub-2s queries; BASELINE.md round-9 notes)")
    ap.add_argument("--reg-abs", type=float, default=0.3)
    ap.add_argument("--raw", action="store_true",
                    help="also print raw (un-normalized) movers at "
                         "--reg-pct/--reg-abs")
    ap.add_argument("--reg-pct", type=float, default=15.0)
    args = ap.parse_args()

    if args.old is None or args.new is None:
        if args.old is not None:
            ap.error("pass both OLD and NEW, or neither")
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        # numeric round order, not lexicographic: r100 must sort after
        # r99, not between r10 and r11
        import re

        def _round_no(p: str) -> int:
            m = re.search(r"_r(\d+)\.json$", os.path.basename(p))
            return int(m.group(1)) if m else -1

        stamped = sorted(
            glob.glob(os.path.join(root, "BENCH_FULL_r*.json")),
            key=_round_no,
        )
        if len(stamped) < 2:
            ap.error("need two BENCH_FULL_r*.json files for the default "
                     "diff; pass paths explicitly")
        args.old, args.new = stamped[-2], stamped[-1]
        print(f"(default) diffing {os.path.basename(args.old)} -> "
              f"{os.path.basename(args.new)}")

    old_payload = load_payload(args.old)
    new_payload = load_payload(args.new)
    old = {k: float(v) for k, v in (old_payload.get("queries") or {}).items()}
    new = {k: float(v) for k, v in (new_payload.get("queries") or {}).items()}
    # -1.0 is bench.py's failed-query sentinel, not a timing
    shared = sorted(n for n in set(old) & set(new)
                    if old[n] > 0 and new[n] > 0)
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))

    hf, hf_key = host_factor(old_payload, new_payload)
    print(f"shared {len(shared)}  added {len(added)}  removed {len(removed)}")
    if hf is not None:
        print(f"host factor: {hf:.3f}x ({hf_key}: "
              f"{old_payload.get(hf_key)} -> {new_payload.get(hf_key)}); "
              f"per-query ratios below are divided by it")
    else:
        print("host factor: unavailable (a payload lacks probes — "
              "pre-round-9 artifact?); ratios are RAW and cross-round "
              "comparisons need hand normalization")
        hf = 1.0

    tot_old = sum(old[n] for n in shared)
    tot_new = sum(new[n] for n in shared)
    if tot_old:
        print(f"shared-subset total: {tot_old:.1f}s -> {tot_new:.1f}s "
              f"(raw {tot_new / tot_old:.2f}x, normalized "
              f"{tot_new / tot_old / hf:.2f}x; same-code totals swing "
              f"+-25% on this infra — inside that is not a finding)")

    regs, wins = [], []
    for name in shared:
        r = (new[name] / old[name]) / hf
        d = new[name] / hf - old[name]
        if abs(d) > args.reg_abs and (r > args.band or r < 1 / args.band):
            (regs if r > 1 else wins).append((r, d, name))

    print(f"\nOUTSIDE-BAND movers (normalized ratio >{args.band}x or "
          f"<{1 / args.band:.2f}x, |normalized delta| > {args.reg_abs}s) — "
          f"re-measure with bench.py --only before attributing:")
    print(f"REGRESSIONS: {len(regs)}")
    for r, d, name in sorted(regs, reverse=True):
        print(f"  {old[name]:7.2f} -> {new[name]:7.2f}  "
              f"(norm {r:4.2f}x, +{d:5.2f}s)  {name}")
    print(f"improvements: {len(wins)}")
    for r, d, name in sorted(wins):
        print(f"  {old[name]:7.2f} -> {new[name]:7.2f}  "
              f"(norm {r:4.2f}x, {d:5.2f}s)  {name}")

    if args.raw:
        rregs, rwins = [], []
        for name in shared:
            d = new[name] - old[name]
            if (abs(d) > args.reg_abs
                    and abs(d) > old[name] * args.reg_pct / 100):
                (rregs if d > 0 else rwins).append((d, name))
        print(f"\nRAW movers (> {args.reg_pct}% and > {args.reg_abs}s): "
              f"{len(rregs)} regressions / {len(rwins)} improvements")
        for d, name in sorted(rregs, reverse=True):
            print(f"  {old[name]:7.2f} -> {new[name]:7.2f}  (+{d:5.2f}s, "
                  f"{100 * d / old[name]:+5.0f}%)  {name}")
        for d, name in sorted(rwins):
            print(f"  {old[name]:7.2f} -> {new[name]:7.2f}  ({d:5.2f}s, "
                  f"{100 * d / old[name]:+5.0f}%)  {name}")

    if added:
        print(f"\nadded: {', '.join(added)}")
    if removed:
        print(f"removed: {', '.join(removed)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
