#!/usr/bin/env python3
"""Generate a clusters-small.fasta-like dataset (SURVEY.md §4: the reference
ships R generators, test/clusters-tb.R, that simulate sequences down a
phylogeny; the actual clusters-small.fasta is an absent LFS blob).

Output: FASTA with sequences named ``S<i>-C<j>`` (sequence i of class j) in
the same 4-line periodic layout the reference quick start's awk filters rely
on (README.md:91): odd-index sequences are training, even-index test.
"""

from __future__ import annotations

import sys

import numpy as np

BASES = np.array(list("ACGT"))


def make(
    path: str,
    n_classes: int = 10,
    per_class: int = 20,
    length: int = 300,
    class_mut: int = 60,
    seq_mut: int = 12,
    seed: int = 20260817,
) -> None:
    rng = np.random.default_rng(seed)
    root = rng.integers(0, 4, size=length)

    def mutate(g: np.ndarray, n: int) -> np.ndarray:
        g = g.copy()
        pos = rng.choice(length, size=n, replace=False)
        g[pos] = (g[pos] + rng.integers(1, 4, size=n)) % 4
        return g

    ancestors = [mutate(root, class_mut) for _ in range(n_classes)]
    idx = 0
    with open(path, "w") as f:
        # 4-line blocks: [train header, train seq, test header, test seq],
        # both of the same class — the layout README.md:91's awk expects
        for _ in range(per_class // 2):
            for c in range(n_classes):
                for _half in range(2):
                    idx += 1
                    seq = "".join(BASES[mutate(ancestors[c], seq_mut)])
                    f.write(">S%d-C%d\n%s\n" % (idx, c + 1, seq))


if __name__ == "__main__":
    args = sys.argv[1:]
    per_class = 20
    if "--per-class" in args:
        i = args.index("--per-class")
        per_class = int(args[i + 1])
        del args[i : i + 2]
    make(args[0] if args else "clusters.fasta", per_class=per_class)
