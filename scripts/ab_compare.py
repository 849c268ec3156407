"""Same-window A/B kernel comparison harness.

The TPU tunnel's per-window throughput swings up to 10x (a Keck indel
count phase measured 47/81/157/502 s across windows on IDENTICAL
code), so a perf claim comparing run X (yesterday) against run Y (now)
is meaningless.  The only sound protocol — the one behind every kernel
perf claim in BASELINE.md — is:

1. snapshot the baseline package tree into a shadow directory:
       git worktree add /tmp/abold <baseline-commit>
   (or `cp -r /root/repo /tmp/abold` before editing);
2. run the SAME probe against both trees, interleaved A B A B ...,
   in one process-per-run so jit caches can't leak between trees;
3. claim only the per-tree min across rounds (the tunnel only ever
   adds noise, never subtracts).

This script automates 2-3:

    python scripts/ab_compare.py /tmp/abold /root/repo \
        --rounds 4 -- scripts/ab_probe_count.py

Each probe run is `python <probe> <tree> [probe-args]` with the tree
prepended to sys.path by the probe itself (see ab_probe_count.py); the
probe must print a final line `ABRESULT <seconds> [label=value ...]`.
ab_compare interleaves the trees, parses those lines, and reports
per-tree min / all samples, plus a tree-to-tree ratio of the mins.

Reference analogue: the reproducible /usr/bin/time protocol of
/root/reference/README.md:726-755 (its numbers are min-style "best
observed" on dedicated hardware; ours must interleave because the
hardware is shared).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys


def run_probe(probe: str, tree: str, extra: list[str]) -> tuple[float, str]:
    env = dict(os.environ)
    # keep the axon plugin's sitecustomize on the path (CLAUDE.md:
    # never replace PYTHONPATH, prepend)
    env["PYTHONPATH"] = tree + ":" + env.get(
        "PYTHONPATH", "/root/.axon_site"
    )
    proc = subprocess.run(
        [sys.executable, probe, tree, *extra],
        env=env, capture_output=True, text=True,
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout + proc.stderr)
        raise SystemExit(f"probe failed under tree {tree}")
    result = None
    for line in proc.stdout.splitlines():
        if line.startswith("ABRESULT "):
            result = line
    if result is None:
        sys.stderr.write(proc.stdout + proc.stderr)
        raise SystemExit(f"probe under {tree} printed no ABRESULT line")
    secs = float(result.split()[1])
    return secs, result


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        description="interleaved same-window A/B perf comparison"
    )
    ap.add_argument("tree_a", help="baseline package tree (shadow copy)")
    ap.add_argument("tree_b", help="candidate package tree")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument(
        "probe", nargs="+",
        help="probe script (+args); printed line 'ABRESULT <secs> ...' "
             "is the sample",
    )
    args = ap.parse_args(argv)

    samples: dict[str, list[float]] = {args.tree_a: [], args.tree_b: []}
    for rnd in range(args.rounds):
        for tree in (args.tree_a, args.tree_b):
            secs, line = run_probe(args.probe[0], tree, args.probe[1:])
            samples[tree].append(secs)
            print(f"round {rnd} tree={tree}: {line}", flush=True)

    mins = {t: min(v) for t, v in samples.items()}
    print()
    for tree, vals in samples.items():
        print(f"{tree}: min={min(vals):.3f}s  samples="
              + " ".join(f"{v:.3f}" for v in vals))
    ratio = mins[args.tree_a] / mins[args.tree_b]
    print(f"speedup (A_min / B_min): {ratio:.3f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
