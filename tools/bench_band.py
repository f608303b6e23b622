#!/usr/bin/env python3
"""Per-key bench-band regression guard (judge r7 item #8).

Compares a fresh bench.json against the last committed one and flags any
key whose time moved by more than BAND x in either direction — triaging
contention spikes / genuine regressions before a judge has to adjudicate
them. Run in the round close-out, after the full-board bench:

    python3 tools/bench_band.py [fresh_bench.json] [--band 3.0] [--wall]

When BOTH records carry a per-key "cpu" map (Bench emits executor task
CPU time since round 9), the band compares CPU seconds — on-CPU thread
time that box contention does not inflate — so a contended wall-clock run
no longer false-flags unchanged keys (the round-7/8 adjudication burden).
Pass --wall to force the old wall-clock comparison.

Exit code 1 when at least one key is out of band. Keys measured at -1
(failed) on either side are always flagged, including keys that are NEW
in the fresh run (a failed new key must not slip through as
informational, ADVICE r8). Removed keys and sub-threshold moves stay
informational.
"""
import json
import subprocess
import sys

FLOOR = 0.15  # seconds; below this, ratios are scheduler noise, not signal


def load_committed(path="bench.json", ref="HEAD"):
    out = subprocess.run(["git", "show", f"{ref}:{path}"],
                         capture_output=True, text=True, cwd=".")
    if out.returncode != 0:
        sys.exit(f"bench_band: cannot read {ref}:{path}: {out.stderr.strip()}")
    return json.loads(out.stdout)


def main():
    argv = sys.argv[1:]
    band = 3.0
    if "--band" in argv:
        i = argv.index("--band")
        if i + 1 >= len(argv):
            sys.exit("bench_band: --band needs a value")
        band = float(argv[i + 1])
        del argv[i:i + 2]  # the value must not leak into positionals
    force_wall = "--wall" in argv
    if force_wall:
        argv.remove("--wall")
    if any(a.startswith("--") for a in argv):
        sys.exit(f"bench_band: unknown flag in {argv}")
    fresh_path = argv[0] if argv else "bench.json"
    with open(fresh_path) as f:
        fresh = json.load(f)
    base = load_committed()

    use_cpu = (not force_wall) and "cpu" in fresh and "cpu" in base
    metric = "cpu" if use_cpu else "queries"
    fq, bq = fresh[metric], base[metric]
    # DUAL-METRIC band (r13 adjudication): when both records carry both
    # maps, a key is flagged only when CPU AND wall are both out of band.
    # A genuine code regression inflates both; box contention inflates
    # wall while CPU stays honest (the r9 reason CPU became primary); and
    # the r12 driver anomaly showed the dual failure — the executorCpuTime
    # counter swings 3-6x run-to-run on short spin-heavy parallel stages
    # (graph_rich_club CPU 6.8/22/21/17/36 s across five runs while its
    # WALL sat at 1.6-2.3 s on an idle box). Requiring both bounds the
    # false-flag rate of each counter by the other.
    dual = use_cpu and "queries" in fresh and "queries" in base
    fw, bw = (fresh.get("queries", {}), base.get("queries", {}))
    # Wall -1 and cpu -1 are set together by Bench, so failure detection is
    # metric-independent; keep using whichever map we compare on.
    print(f"comparing {'executor-CPU' if use_cpu else 'wall'} seconds"
          f"{' (wall-confirmed)' if dual else ''} "
          f"({len(set(fq) & set(bq))} shared keys, band {band}x)")

    flagged = []
    for key in sorted(set(fq) & set(bq)):
        f_t, b_t = fq[key], bq[key]
        if f_t < 0 or b_t < 0:
            flagged.append((key, b_t, f_t, "FAILED run"))
            continue
        if max(f_t, b_t) < FLOOR:
            continue
        ratio = f_t / max(b_t, 1e-9)
        if ratio > band or ratio < 1 / band:
            if dual and key in fw and key in bw and min(fw[key], bw[key]) >= 0:
                wratio = fw[key] / max(bw[key], 1e-9)
                if max(fw[key], bw[key]) < FLOOR or 1 / band <= wratio <= band:
                    print(f"  cpu-only move (wall in band, not flagged): "
                          f"{key}: cpu {b_t:.2f}s -> {f_t:.2f}s "
                          f"[{ratio:.2f}x], wall {bw[key]:.2f}s -> "
                          f"{fw[key]:.2f}s [{wratio:.2f}x]")
                    continue
            flagged.append((key, b_t, f_t, f"{ratio:.2f}x"))

    for key in sorted(set(fq) - set(bq)):
        if fq[key] < 0:
            # A key that is new AND failed must trip the gate, not print an
            # informational "-1.00s" line (ADVICE r8).
            flagged.append((key, float("nan"), fq[key], "FAILED run (new key)"))
        else:
            print(f"  new key (no band yet): {key} = {fq[key]:.2f}s")
    for key in sorted(set(bq) - set(fq)):
        print(f"  key gone from fresh run: {key}")

    if flagged:
        print(f"{len(flagged)} key(s) outside the {band}x band "
              f"(committed -> fresh):")
        for key, b_t, f_t, why in flagged:
            print(f"  {key}: {b_t:.2f}s -> {f_t:.2f}s  [{why}]")
        sys.exit(1)
    print(f"all {len(set(fq) & set(bq))} shared keys within the {band}x band "
          f"(total {base.get('value')}s -> {fresh.get('value')}s)")


if __name__ == "__main__":
    main()
