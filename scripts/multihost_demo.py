"""Multi-host execution demo: per-host input sharding + matrix merge.

Each simulated host runs the full CLI with COMPAIRR_INPUT_SHARD=k/n —
the native parser reads only its deterministic line-aligned chunk of
set 1 (native/airr_parser.cpp range_k/range_n) — against the full
set 2, producing a partial overlap matrix in 3-column format. The
partial matrices merge by (repertoire_1, repertoire_2) key, which is
exact because every matched pair is counted by exactly one host (set-1
rows partition across hosts). The merged result is asserted equal to a
single-process run.

This automates the reference README's manual split-and-merge advice
(/root/reference/README.md:766-771) and is the host-level half of the
multi-host story; the chip-level half is the device mesh
(parallel/mesh.py, engine._sparse_devices), and
`initialize_distributed` (called by the CLI under COMPAIRR_DISTRIBUTED)
joins real pods into one global mesh.

Usage: python scripts/multihost_demo.py [--hosts N] [--n ROWS] [-d D]
"""

import argparse
import os
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, HERE)
sys.path.insert(0, REPO)


def run_cli(args, extra_env=None):
    env = dict(os.environ)
    if extra_env:
        env.update(extra_env)
    t0 = time.perf_counter()
    subprocess.run(
        [sys.executable, "-m", "compairr_tpu", *args],
        check=True, cwd=REPO, env=env,
    )
    return time.perf_counter() - t0


def read_threecol(path):
    out = {}
    with open(path) as f:
        header = f.readline()
        assert header.startswith("#")
        for line in f:
            r1, r2, v = line.rstrip("\n").split("\t")
            out[(r1, r2)] = out.get((r1, r2), 0.0) + float(v)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=4)
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("-d", type=int, default=1)
    args = ap.parse_args()

    from scale_demo import generate

    with tempfile.TemporaryDirectory() as td:
        a = os.path.join(td, "a.tsv")
        b = os.path.join(td, "b.tsv")
        generate(a, args.n, reps=24, seed=51)
        generate(b, args.n, reps=24, seed=52)

        flags = ["-m", "-d", str(args.d), "-a", a, b]

        full = os.path.join(td, "full.tsv")
        t_full = run_cli(flags + ["-o", full, "-l", os.devnull])
        merged = {}
        t_hosts = []
        for k in range(args.hosts):
            part = os.path.join(td, f"part{k}.tsv")
            t = run_cli(
                flags + ["-o", part, "-l", os.devnull],
                extra_env={
                    "COMPAIRR_INPUT_SHARD": f"{k}/{args.hosts}"
                },
            )
            t_hosts.append(t)
            for key, v in read_threecol(part).items():
                merged[key] = merged.get(key, 0.0) + v

        want = read_threecol(full)
        # hosts whose chunk lacks a repertoire contribute no rows for
        # it; zero cells must compare equal either way
        keys = set(want) | set(merged)
        for key in keys:
            got = merged.get(key, 0.0)
            exp = want.get(key, 0.0)
            assert got == exp, (key, got, exp)

        print(
            f"multihost_demo: OK — {args.hosts} sharded runs merge "
            f"byte-exactly into the single-run matrix "
            f"({len(keys)} cells).\n"
            f"single-process wall: {t_full:.1f}s; per-host walls: "
            + ", ".join(f"{t:.1f}s" for t in t_hosts)
            + f"; max {max(t_hosts):.1f}s (on a multi-host cluster "
            f"these run concurrently)"
        )


if __name__ == "__main__":
    main()
