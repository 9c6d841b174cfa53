"""Error-free float32 transforms (double-double building blocks) on the VPU.

The sharded CA fit needs the standardized residual matrix to ~float64
accuracy, but uploading two f32 limbs of a host-computed f64 residual costs
8 bytes/entry over the host->device link (the measured bottleneck of the
fit).  When the raw table is *exactly representable* in one f32 limb
(integer k-mer counts < 2^24, or an already-f32 table), the residual

    S_ij = x_ij * alpha_i * beta_j - u_i * v_j

can instead be reconstructed ON DEVICE in double-double arithmetic from the
compact table plus dd-split vectors: only classic error-free transforms
(Dekker/Veltkamp, Knuth two-sum) over IEEE f32 elementwise ops, which the
TPU VPU provides.  This file implements those primitives in plain jnp so
XLA fuses them into the consuming matmul's pipeline.

All functions are elementwise and broadcast like jnp ops.  References:
T.J. Dekker, "A floating-point technique for extending the available
precision" (1971); the reference implementation of the CA math these feed
is src/KPopTwist:95-116 (R `ca`).
"""

from __future__ import annotations

import numpy as np

from ..config import jax_setup

jax = jax_setup()
import jax.numpy as jnp  # noqa: E402

# Veltkamp split constant for f32 (24-bit mantissa): 2^12 + 1
_SPLIT = np.float32(4097.0)


def two_sum(a, b):
    """s + e == a + b exactly (Knuth, branch-free)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b):
    """s + e == a + b exactly, REQUIRES |a| >= |b| (or a == 0)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _veltkamp_split(a):
    c = a * _SPLIT
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """p + e == a * b exactly (Dekker; no FMA needed)."""
    p = a * b
    ah, al = _veltkamp_split(a)
    bh, bl = _veltkamp_split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def dd_mul(ah, al, bh, bl):
    """(ah+al) * (bh+bl) as a dd pair, ~2 ulp^2 relative error."""
    p, e = two_prod(ah, bh)
    e = e + (ah * bl + al * bh)
    return quick_two_sum(p, e)


def dd_scale(x, gh, gl):
    """x * (gh+gl) with x exactly representable in f32."""
    p, e = two_prod(x, gh)
    e = e + x * gl
    return quick_two_sum(p, e)


def dd_sub(ah, al, bh, bl):
    """(ah+al) - (bh+bl) as a dd pair (Sloppy two-term subtraction)."""
    s, e = two_sum(ah, -bh)
    e = e + (al - bl)
    return quick_two_sum(s, e)


def residual_dd(x, ah, al, bh, bl, uh, ul, vh, vl):
    """Standardized CA residual ``x*alpha*beta - u v`` in dd from an exact
    f32 table block ``x`` and dd-split row/col vectors.

    ``x``: [..., R, C] f32 (exact values); alpha/u: [..., R] limb pairs;
    beta/v: [..., C] limb pairs (pre-broadcast by the caller or via
    ``[:, None]`` / ``[None, :]``).  Returns (hi, lo).
    """
    gh, gl = dd_mul(ah, al, bh, bl)
    th, tl = dd_scale(x, gh, gl)
    wh, wl = dd_mul(uh, ul, vh, vl)
    return dd_sub(th, tl, wh, wl)


def split_f64(a: np.ndarray):
    """Host-side dd split of a float64 vector into two f32 limbs."""
    hi = a.astype(np.float32)
    lo = (a - hi.astype(np.float64)).astype(np.float32)
    return hi, lo
