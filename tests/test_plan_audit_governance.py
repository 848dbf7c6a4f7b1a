"""Governance pins for tools/plan_audit.py's allowlists (VERDICT r7
task 5 + ADVICE r7 finding 1).

- No duplicate keys in any dict literal in the file: Python dict
  literals silently last-win, which is how ALLOWED_EXCHANGES carried a
  dead "search_err_cascade": 11 next to the live 12 for a round.
- Staleness: every allowlisted name must still be in the registry, and
  the rule itself must fire on a name that is not.
"""

from __future__ import annotations

import ast
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

AUDIT_PATH = os.path.join(ROOT, "tools", "plan_audit.py")


def test_no_duplicate_dict_keys_in_plan_audit():
    tree = ast.parse(open(AUDIT_PATH).read(), AUDIT_PATH)
    dupes = []
    for node in ast.walk(tree):
        if not isinstance(node, ast.Dict):
            continue
        seen: dict[object, int] = {}
        for key in node.keys:
            if key is None:  # **spread
                continue
            if not isinstance(key, ast.Constant):
                continue
            k = key.value
            if k in seen:
                dupes.append((k, seen[k], key.lineno))
            seen[k] = key.lineno
    assert not dupes, f"duplicate dict keys in plan_audit.py: {dupes}"


def test_allowlists_have_no_stale_entries():
    from aiven_challenge2_cdc_sharing_spark.queries import load_registry
    from tools.plan_audit import stale_allowlist_entries

    stale = stale_allowlist_entries(load_registry())
    assert stale == [], f"allowlisted names no longer in registry: {stale}"


def test_staleness_rule_fires_on_unknown_name():
    from tools.plan_audit import ALLOWLISTS, stale_allowlist_entries

    # a registry that lacks one allowlisted name -> exactly that entry
    # is reported, tagged with its allowlist's name
    some_list, entries = next(
        (ln, e) for ln, e in ALLOWLISTS.items() if len(e) > 0
    )
    victim = next(iter(entries))
    all_names = {n for e in ALLOWLISTS.values() for n in e}
    stale = stale_allowlist_entries(all_names - {victim})
    assert stale == sorted(
        f"{ln}:{victim}" for ln, e in ALLOWLISTS.items() if victim in e
    )


def test_every_allowlist_is_registered_for_governance():
    # adding a new ALLOWED_* dict/set without wiring it into ALLOWLISTS
    # would silently exempt it from the staleness rule
    import tools.plan_audit as pa

    declared = {
        name
        for name in vars(pa)
        if name.startswith("ALLOWED_") and name != "ALLOWLISTS"
    }
    assert declared == set(pa.ALLOWLISTS), (
        f"ALLOWLISTS out of sync with ALLOWED_* globals: "
        f"{declared ^ set(pa.ALLOWLISTS)}"
    )


def test_bucket_join_detector_sees_cap_marker_in_subplan_text():
    # dedup_minhash_near_pairs caps its band buckets ABOVE a
    # localCheckpoint, so the __bsz marker never reaches the final
    # explain — the round-12 audit loop concatenates the captured
    # pre-checkpoint subplan explains before running the detector.
    # Pin the string-level contract both ways.
    from tools.plan_audit import uncapped_bucket_joins

    main_plan = (
        "Left keys [2]: [band_idx#1, band_hash#2]\n"
        "Right keys [2]: [band_idx#3, band_hash#4]\n"
        "Location: InMemoryFileIndex [file:/x/documents.parquet]\n"
        "Location: InMemoryFileIndex [file:/x/documents.parquet]\n"
    )
    # main plan alone: capped nowhere in sight -> flagged
    assert uncapped_bucket_joins(main_plan) == ["documents"]
    # with the captured subplan text carrying the cap filter -> clean
    sub = "Filter (__bsz#9L <= 64)\n"
    assert uncapped_bucket_joins(main_plan + sub) == []
