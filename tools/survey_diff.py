#!/usr/bin/env python3
"""SURVEY §2 ↔ registry reconciliation (judge r9 item #6).

Extracts every backtick-quoted registry key from SURVEY.md's §2 tables and
diffs the set against the live registry (the key list dumped by
`graft.Verify`'s oracle_sql.json, or a plain newline list). Exit 1 on any
key present in exactly one of the two — so a judge (or the round close-out)
can check coverage mechanically instead of hand-walking the tables.

Usage:
    python3 tools/survey_diff.py [oracle_sql.json | keys.txt]

With no argument, reads the registry DIRECTLY from the `Q("key", ...)`
registrations in src/main/scala/graft/queries/*.scala — no dump needed.
When a dump IS passed, its key set is cross-checked against the source
registrations and REFUSED on mismatch: the judge r12 finding was that the
old most-recent-/tmp-dump default silently reconciled against a stale
prior-round dump, making the round-close exit-0 spoofable.

Rows marked "API-level, no standalone registry key" contribute no key, by
design (I1 pregel, R8 substrate_iterate).
"""
import json
import re
import sys
import glob
import os

KEY_RE = re.compile(r"`([a-z][a-z0-9_]+)`")


def survey_keys(path="SURVEY.md"):
    text = open(path).read()
    # §2 spans from the "## 2" heading to the next "## " heading.
    m = re.search(r"^##+\s*2[^\n]*$", text, re.M)
    if not m:
        sys.exit("survey_diff: cannot find §2 heading")
    rest = text[m.end():]
    nxt = re.search(r"^## (?!2)", rest, re.M)
    sec = rest[: nxt.start()] if nxt else rest
    keys = set()
    for line in sec.splitlines():
        if not line.startswith("|"):
            continue
        cells = line.split("|")
        if len(cells) < 3:
            continue
        key_cell = cells[2]
        if "API-level, no standalone registry key" in key_cell:
            continue
        for k in KEY_RE.findall(key_cell):
            keys.add(k)
    # Non-key backticked identifiers that legitimately appear in key cells.
    noise = {
        "num_vertices", "num_edges", "substrate_coGroup", "substrate_cogroup",
        "pregel", "pregelTyped", "binary", "containment", "multimodal_dedup",
        "reduceOnEdges", "reduceOnNeighbors",
    }
    # keep names that ARE real keys even if also listed in noise
    return keys - (noise - registry_keys_cache)


registry_keys_cache: set = set()


Q_RE = re.compile(r'\bQ\(\s*"([a-z][a-z0-9_]+)"')


def source_registry_keys(root="src/main/scala/graft/queries"):
    """The registry as declared in source — every `Q("key", ...)`
    registration across the family modules. This is the ground truth a
    dump must match; a Verify dump can only be STALE relative to it."""
    keys = set()
    for path in sorted(glob.glob(os.path.join(root, "*.scala"))):
        keys.update(Q_RE.findall(open(path).read()))
    if not keys:
        sys.exit(f"survey_diff: no Q(\"...\") registrations under {root}")
    return keys


def registry_keys(arg):
    src = source_registry_keys()
    if arg and arg.endswith(".json"):
        dump = set(json.load(open(arg)).keys())
    elif arg:
        dump = {l.strip() for l in open(arg) if l.strip()}
    else:
        print(f"using source registrations ({len(src)} Q(...) keys)")
        return src
    # Refuse stale dumps: a dump from a prior round reconciles cleanly
    # against that round's SURVEY and spoofs the close-out (judge r12 #3).
    if dump != src:
        extra = sorted(dump - src)[:5]
        miss = sorted(src - dump)[:5]
        sys.exit(f"survey_diff: dump {arg} is STALE — {len(dump)} keys vs "
                 f"{len(src)} source registrations "
                 f"(dump-only: {extra}; source-only: {miss}). "
                 "Re-run graft.Verify or omit the argument to use source.")
    return dump


def main():
    global registry_keys_cache
    arg = sys.argv[1] if len(sys.argv) > 1 else None
    reg = registry_keys(arg)
    registry_keys_cache = reg
    sv = survey_keys()
    missing_in_survey = sorted(reg - sv)
    missing_in_registry = sorted(sv - reg)
    print(f"registry keys: {len(reg)}; §2 keys: {len(sv)}")
    ok = True
    if missing_in_survey:
        ok = False
        print("keys in registry but NOT in SURVEY §2:")
        for k in missing_in_survey:
            print(f"  {k}")
    if missing_in_registry:
        ok = False
        print("keys in SURVEY §2 but NOT in registry:")
        for k in missing_in_registry:
            print(f"  {k}")
    if ok:
        print("SURVEY §2 and the registry agree 1:1 "
              "(modulo the declared API-level rows).")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
