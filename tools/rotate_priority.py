"""Regenerate __spark_entry__.DRIVER_PRIORITY for the next round.

The driver caps each round's CORRECTNESS run at ~50 registry entries,
taken in dict order.  This tool reads every CORRECTNESS_r*.json in the
repo root and orders the registry so that:

1. queries whose LATEST driver row is not fully green (err, or any of
   rows/schema/hash false) come first — these are fixed-and-requeued
   re-checks and must land inside the next 50-row window, then
2. STALE-ATTESTATION greens (round-9 verdict task 1): queries whose
   registered function's source span changed in a commit AFTER the
   commit that landed their attestation round's CORRECTNESS file —
   the driver has green-hashed an implementation that no longer runs
   (e.g. the r9 BLAS registry-default swaps for ml_knn_classify /
   emb_density_core_points / emb_hubness_indegree, attested r6/r7/r8
   on the HOF paths).  Ranked by the volume of changed lines inside
   the function span (an implementation swap is tens of lines; an
   alias or docstring tweak is 1-2) so real promotions outrank
   cosmetic edits, capped (default 5, argv[1] overrides) so the
   never-checked queue keeps >=45 of the 50-row window and keeps
   draining; the uncapped remainder is
   printed so nothing hides.  Detection is per-function (git diff
   --unified=0 hunk ranges vs inspect.getsourcelines span), so
   edits to OTHER functions in the same 13k-line coverage module
   don't flood the tier.  Known blind spot, documented: a change
   confined to a shared operator module (e.g. operators/similarity
   .py) without touching the registered function body is not seen —
   promotion commits must touch the query function (they do: the
   default swap is a call-site edit), then
3. queries with NO driver row in any round so far (oracle-bearing
   before rows-only, preserving current registry order within each
   group — except EARLY_CHECK names, hoisted to the front of the
   never-checked block: environment-sensitive sources (tmp-file /
   PERMISSIVE / dead-letter machinery whose failure modes a local
   green can't fully attest) and the newest-authored batch, per the
   round-9 verdict task 7), then
4. everything already green, oldest-checked first (regression
   rotation).

Prints the new list as Python source to paste into __spark_entry__.py
(it does not edit the file — the list is load-bearing and reviewed).

Usage: python tools/rotate_priority.py [stale_cap]
"""

from __future__ import annotations

import glob
import inspect
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aiven_challenge2_cdc_sharing_spark.queries import load_registry


def _git(root: str, *args: str) -> str:
    return subprocess.run(
        ["git", "-C", root, *args], capture_output=True, text=True, check=True
    ).stdout


def _changed_new_ranges(root: str, sha: str, rel: str) -> list[tuple[int, int]]:
    """New-file line ranges touched between ``sha`` and HEAD for ``rel``."""
    out = _git(root, "diff", "--unified=0", sha, "HEAD", "--", rel)
    ranges: list[tuple[int, int]] = []
    for m in re.finditer(r"^@@ -\d+(?:,\d+)? \+(\d+)(?:,(\d+))? @@", out, re.M):
        start = int(m.group(1))
        count = int(m.group(2)) if m.group(2) is not None else 1
        ranges.append((start, start + max(count, 1) - 1))
    return ranges


def stale_greens(
    root: str,
    registry,
    checked: dict[str, tuple[int, bool]],
    green: list[str],
) -> dict[str, int]:
    """Greens whose registered function changed after their attestation.

    Returns name -> changed-line overlap (lines of the post-attestation
    diff that land inside the function's current source span).
    Attestation time is approximated by the commit that landed
    CORRECTNESS_r{N}.json (the driver commits it at next-round start,
    strictly after the code state it hashed — so any function-span
    change after that commit is definitely post-attestation).
    """
    sha_of_round: dict[int, str] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        rnd = int("".join(c for c in os.path.basename(path) if c.isdigit()))
        # Anchor to the ADD commit (round-10 advice): `git log -1`
        # returns the LAST commit touching it, so a later amend/
        # re-commit would silently advance the anchor and hide
        # post-attestation code changes made before the amend.  When
        # the file was deleted and re-ADDED (a re-attestation), the
        # MOST RECENT add commit is the right anchor — the old add
        # would over-flag functions legitimately re-attested by the
        # re-add and burn the stale tier on false positives
        # (round-11 advice).  git log prints newest-first: shas[0].
        shas = _git(
            root, "log", "--diff-filter=A", "--format=%H", "--",
            os.path.basename(path),
        ).split()
        touches = _git(
            root, "log", "--format=%H", "--", os.path.basename(path)
        ).split()
        if len(touches) > 1:
            print(f"# WARN: {os.path.basename(path)} touched by "
                  f"{len(touches)} commits; anchoring staleness to the "
                  f"newest ADD commit {shas[0][:10] if shas else '??'}")
        if shas:
            sha_of_round[rnd] = shas[0]
        elif touches:
            sha_of_round[rnd] = touches[-1]

    diff_cache: dict[tuple[str, str], list[tuple[int, int]]] = {}
    stale: dict[str, int] = {}
    for name in green:
        sha = sha_of_round.get(checked[name][0])
        if not sha:
            continue
        fn = registry[name].fn
        try:
            srcfile = inspect.getsourcefile(fn)
            lines, start = inspect.getsourcelines(fn)
        except (TypeError, OSError):
            continue
        if not srcfile:
            continue
        rel = os.path.relpath(os.path.abspath(srcfile), root)
        if rel.startswith(".."):
            continue
        key = (sha, rel)
        if key not in diff_cache:
            diff_cache[key] = _changed_new_ranges(root, sha, rel)
        lo, hi = start, start + len(lines) - 1
        overlap = sum(
            min(hi, b) - max(lo, a) + 1
            for a, b in diff_cache[key]
            if not (b < lo or a > hi)
        )
        if overlap:
            stale[name] = overlap
    return stale


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

    # Environment-sensitive / newest-authored never-checked names that a
    # driver attestation is worth more for than another local green
    # (round-9 verdict task 7: tmp-file CSV quarantine, the r9-authored
    # coverage_round12 batch).  Harmless no-op once they've been checked.
    early_check = [
        # round-11-authored serving/tokenizer batch (round-11 verdict
        # task 1: must land inside round 12's 50-row window, not the
        # tail — they sit at the natural end of the never-checked
        # queue otherwise)
        "text_bpe_token_budget_bins",
        "sim_ivf_serving_batch",
        "emb_int8_quantization_error",
        "text_chunk_sliding_windows",
        "src_csv_corrupt_recovery",
        "geo_geohash_rollup",
        "prep_quantile_binning",
        "ml_loo_target_encode",
        "cep_absence_timeout",
        "privacy_dp_exponential_topk",
        "agg_bitmap_distinct_rollup",
        "er_token_blocking_dice",
        "fn_bitwise_suite",
    ]

    names = list(registry)
    never = [n for n in names if n not in checked]
    never = [n for n in early_check if n in never] + [
        n for n in never if n not in early_check
    ]
    never_oracle = [n for n in never if registry[n].oracle is not None]
    never_rows_only = [n for n in never if registry[n].oracle is None]
    errored = [n for n in names if n in checked and not checked[n][1]]
    green = sorted(
        (n for n in names if n in checked and checked[n][1]),
        key=lambda n: checked[n][0],
    )

    stale_cap = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    overlaps = stale_greens(root, registry, checked, green)
    stale_all = sorted(
        overlaps, key=lambda n: (-overlaps[n], checked[n][0])
    )
    stale_top = stale_all[:stale_cap]
    if len(stale_all) > stale_cap:
        print(f"# NOTE: {len(stale_all) - stale_cap} stale-attestation "
              f"greens beyond the cap stay in the green tier (oldest-first "
              f"rotation reaches them): "
              f"{[(n, overlaps[n]) for n in stale_all[stale_cap:]]}")
    green = [n for n in green if n not in stale_top]

    ordered = errored + stale_top + never_oracle + never_rows_only + green
    print(f"# {len(errored)} re-checks (latest row not green), "
          f"{len(stale_top)} stale-attestation greens "
          f"(impl changed after last driver hash; cap {stale_cap}), "
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
