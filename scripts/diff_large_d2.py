"""Large-scale byte-identity check vs the reference binary.

Subsets the bench's Keck synthetic to N rows (planted near-duplicates
included, so the run produces real matched pairs), writes an AIRR TSV,
runs `<ref> -m -d D` and `python -m compairr_tpu -m -d D` on it, and
byte-compares the matrix (and optionally a pairs file). Closes the
round-3 proof gap: the double-substitution enumeration
(/root/reference/src/variants.cc:357-400) had only been byte-compared
at fuzz scale (<= ~700 rows).

Usage:
  python scripts/diff_large_d2.py [N] [D] [--pairs]

Writes /tmp/diff_large_<N>_d<D>/{input.tsv,ref.tsv,our.tsv,...} and
prints MATCH/MISMATCH lines. The reference run at 1.5M rows / d=2
takes tens of minutes on this host; run under nohup.
"""

import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/tmp/refbuild/src/compairr"


def write_tsv(path: str, db, n: int) -> None:
    from compairr_tpu.constants import AA_CHARS

    dec = np.frombuffer(AA_CHARS.encode() + b"X", dtype="S1")
    t0 = time.time()
    with open(path, "w", buffering=1 << 22) as f:
        f.write(
            "repertoire_id\tsequence_id\tduplicate_count\tv_call\t"
            "j_call\tjunction_aa\n"
        )
        seqs = np.asarray(db.seqs[:n])
        lens = np.asarray(db.lengths[:n])
        counts = np.asarray(db.counts[:n])
        reps = np.asarray(db.rep_no[:n])
        vs = np.asarray(db.v_no[:n])
        js = np.asarray(db.j_no[:n])
        step = 200_000
        for s0 in range(0, n, step):
            s1 = min(s0 + step, n)
            chunk = np.minimum(seqs[s0:s1], 20)
            chars = dec[chunk]  # [rows, lmax] bytes
            rows = []
            for i in range(s1 - s0):
                seq = chars[i, : lens[s0 + i]].tobytes().decode()
                rows.append(
                    f"R{reps[s0 + i]:03d}\tS{s0 + i}\t{counts[s0 + i]}"
                    f"\tTRBV{vs[s0 + i]}\tTRBJ{js[s0 + i]}\t{seq}\n"
                )
            f.write("".join(rows))
    sys.stderr.write(f"wrote {path} ({n} rows) in {time.time()-t0:.0f}s\n")


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_500_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    pairs = "--pairs" in sys.argv
    outdir = f"/tmp/diff_large_{n}_d{d}"
    os.makedirs(outdir, exist_ok=True)
    tsv = os.path.join(outdir, "input.tsv")
    if not os.path.exists(tsv):
        from bench import _headline_db

        db = _headline_db(24_205_557)
        write_tsv(tsv, db, n)

    def run(tag, cmd, env=None):
        t0 = time.time()
        e = dict(os.environ)
        if env:
            e.update(env)
        r = subprocess.run(cmd, env=e, cwd="/root/repo")
        sys.stderr.write(f"{tag}: rc={r.returncode} {time.time()-t0:.0f}s\n")
        return r.returncode

    base = ["-m", "-d", str(d), tsv, tsv]
    pr = ["-p", os.path.join(outdir, "{}_pairs.tsv")] if pairs else []
    rc1 = run(
        "ref",
        [REF, *base, "-o", os.path.join(outdir, "ref.tsv"),
         "-l", os.path.join(outdir, "ref.log")]
        + [a.format("ref") for a in pr],
    )
    rc2 = run(
        "ours",
        [sys.executable, "-m", "compairr_tpu", *base,
         "-o", os.path.join(outdir, "our.tsv"),
         "-l", os.path.join(outdir, "our.log")]
        + [a.format("our") for a in pr],
    )
    if rc1 or rc2:
        print("RUN_FAILED")
        return 1
    ok = True
    a = open(os.path.join(outdir, "ref.tsv"), "rb").read()
    b = open(os.path.join(outdir, "our.tsv"), "rb").read()
    print(("MATCH" if a == b else "MISMATCH"), "matrix", n, "d", d)
    ok &= a == b
    if pairs:
        pa = open(os.path.join(outdir, "ref_pairs.tsv"), "rb").read()
        pb = open(os.path.join(outdir, "our_pairs.tsv"), "rb").read()
        print(("MATCH" if pa == pb else "MISMATCH"), "pairs")
        ok &= pa == pb
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
