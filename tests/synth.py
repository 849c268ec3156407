"""Synthetic AIRR TSV generator for differential testing."""

import random

AA = "ACDEFGHIKLMNPQRSTVWY"
NT = "acgt"


def make_tsv(
    path,
    n_seqs,
    n_reps,
    seed,
    *,
    nt=False,
    n_v=4,
    n_j=3,
    len_range=(8, 14),
    alphabet_sub=6,
    dup_fraction=0.1,
    max_count=50,
):
    """Random repertoire file. A small alphabet subset plus narrow
    length range forces plenty of near-matches at d=1/2."""
    rng = random.Random(seed)
    alpha = (NT if nt else AA)[:alphabet_sub]
    rows = []
    seqs = []
    for i in range(n_seqs):
        if seqs and rng.random() < dup_fraction:
            s = rng.choice(seqs)  # exact duplicate sequence text
        else:
            L = rng.randint(*len_range)
            s = "".join(rng.choice(alpha) for _ in range(L))
        seqs.append(s)
        rep = f"R{rng.randrange(n_reps):02d}"
        v = f"TRBV{rng.randrange(n_v)}"
        j = f"TRBJ{rng.randrange(n_j)}"
        cnt = rng.randint(1, max_count)
        junction = s if nt else "".join(rng.choice(NT) for _ in range(12))
        junction_aa = "".join(rng.choice(AA) for _ in range(5)) if nt else s
        rows.append(
            f"{rep}\tS{i:05d}\t{cnt}\t{v}\t{j}\t{junction}\t{junction_aa}"
            f"\textra{i}\tmore{i % 7}"
        )
    header = (
        "repertoire_id\tsequence_id\tduplicate_count\tv_call\tj_call\t"
        "junction\tjunction_aa\tcolx\tcoly"
    )
    with open(path, "w") as f:
        f.write(header + "\n")
        f.write("\n".join(rows) + "\n")
    return path
