import numpy as np
import pytest

from kpop_tpu.core.kmers import (
    KmerSpace,
    encode_dna,
    encode_protein,
)


def brute_force_kmers(seq: str, k: int, canonical: bool):
    """Golden reference: string-based k-mer enumeration."""
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    out = []
    for i in range(len(seq) - k + 1):
        w = seq[i : i + k]
        if any(c not in "ACGT" for c in w):
            continue
        if canonical:
            rc = "".join(comp[c] for c in reversed(w))
            w = min(w, rc)
        out.append(w)
    return out


def code_of_string(w: str) -> int:
    v = 0
    for c in w:
        v = v * 4 + "ACGT".index(c)
    return v


@pytest.mark.parametrize("k", [1, 2, 3, 5, 12, 15, 30])
@pytest.mark.parametrize("canonical", [False, True])
def test_window_codes_match_bruteforce(k, canonical):
    rng = np.random.default_rng(42 + k)
    seq = "".join(rng.choice(list("ACGTN"), p=[0.24, 0.24, 0.24, 0.24, 0.04], size=200))
    space = KmerSpace("DNA-ds" if canonical else "DNA-ss", k)
    got = space.window_codes(encode_dna(seq))
    want = [code_of_string(w) for w in brute_force_kmers(seq, k, canonical)]
    assert got.tolist() == want


def test_lexicographic_equals_numeric_canonical():
    # the encoding makes numeric min == lexicographic min
    space = KmerSpace("DNA-ds", 4)
    codes = space.window_codes(encode_dna("ACGTACGT"))
    # ACGT is its own revcomp -> canonical = itself
    assert space.code_to_string(int(codes[0])) == "ACGT"


def test_linting():
    # dashes removed (joining flanks), lowercase accepted, U->T, N breaks
    space = KmerSpace("DNA-ss", 3)
    a = space.window_codes(encode_dna("AC-GT"))
    b = space.window_codes(encode_dna("acgu"))
    assert a.tolist() == b.tolist()
    c = space.window_codes(encode_dna("ACNGT"))
    assert len(c) == 0  # all 3-windows span the N


def test_hex_roundtrip_and_width():
    space = KmerSpace("DNA-ds", 5)
    assert space.hex_width == 3  # 4^5-1 = 0x3ff
    assert space.code_to_hex(0) == "000"
    assert space.code_to_hex(1023) == "3ff"
    assert space.hex_to_code(space.code_to_hex(577)) == 577


def test_protein_space():
    space = KmerSpace("protein", 3)
    codes = space.window_codes(encode_protein("ACDEF"))
    assert len(codes) == 3
    assert space.code_to_string(int(codes[0])) == "ACD"
    with pytest.raises(ValueError):
        KmerSpace("protein", 13)
    with pytest.raises(ValueError):
        KmerSpace("DNA-ds", 31)


def test_dna_k30_uses_uint64_safely():
    space = KmerSpace("DNA-ss", 30)
    seq = "A" * 29 + "T" * 30
    codes = space.window_codes(encode_dna(seq))
    # last window is T*30 = 4^30 - ... max code
    assert int(codes[-1]) == 4**30 - 1
