"""Sharded multi-chip compute paths: CA training, projection, distances.

These are the multi-device versions of the pipeline kernels, with explicit
``NamedSharding`` layouts over the (data, kmer) mesh; XLA inserts the
collectives:

- :func:`ca_fit_sharded`     — CA over a k-mer-sharded table: local Gram
  contributions are psum-reduced to a tiny replicated [ns, ns] matrix which
  is eigendecomposed on every device; the twister stays k-mer-sharded.
- :func:`project_sharded`    — [B, K] x [K, d] contraction with B sharded
  over "data" and K over "kmer" (psum over "kmer").
- :func:`pairwise_sharded`   — query rows sharded over the whole mesh,
  targets replicated.

This replaces the reference's manual multi-node scatter + ``-a`` file merges
(README.md:1049-1067) with one SPMD program.
"""

from __future__ import annotations

import os
import time

import numpy as np

from ..config import jax_setup

jax = jax_setup()
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from .mesh import (  # noqa: E402
    DATA_AXIS,
    KMER_AXIS,
    device_canonical,
    pad_to_multiple,
)


class _PhaseTimer:
    """Per-phase wall timers for :func:`ca_fit_sharded`, printed to stderr
    when ``KPOP_CA_DEBUG`` is set (the analogue of the reference's hidden
    ``--debug-twisting`` timing, bin/KPopTwistDB.ml:350)."""

    def __init__(self, label: str):
        self.on = bool(os.environ.get("KPOP_CA_DEBUG"))
        self.label = label
        self.t = time.perf_counter()

    def mark(self, phase: str) -> None:
        if self.on:
            now = time.perf_counter()
            import sys

            sys.stderr.write(
                "%s[%s]: %.2f s\n" % (self.label, phase, now - self.t)
            )
            sys.stderr.flush()
            self.t = now


def _host(arr) -> np.ndarray:
    """Fetch a jax.Array to host, gathering across processes when its shards
    are not all addressable (multi-host runs)."""
    if arr.is_fully_replicated or arr.is_fully_addressable:
        return np.asarray(arr)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))


# ---------------- CA ----------------


def _gram_dd_local(hi, lo, n_blocks: int = 16, axes: tuple = (), init=None):
    """Near-float64 ``S^T S`` from two float32 limbs of S (hi + lo == S to
    f64 accuracy), on one shard:

    - exact-product matmuls (``Precision.HIGHEST``: no bf16 decomposition),
    - the cross term ``hi'lo + lo'hi`` restores the bits lost casting S to
      f32 (the dominant error of a naive device Gram),
    - blocked Kahan accumulation bounds the f32 summation-chain error over
      a long k-mer axis.

    Returns ``(acc, comp)``; the caller combines ``acc - comp`` in float64.
    Measured on TPU v5e at [1M, 16]: 6.8e-8 max relative error vs 9.1e-6
    for a naive f32 dot, at ~2x the matmul cost (docs/PALLAS.md sidecar).

    ``init``: optional (acc, comp) carry from previous row blocks — the
    HBM-budgeted streaming path chains the compensated sum across blocks.
    """
    K, ns = hi.shape
    blk = max(1, -(-K // n_blocks))
    pad = (-K) % blk
    hi = jnp.pad(hi, ((0, pad), (0, 0)))
    lo = jnp.pad(lo, ((0, pad), (0, 0)))
    hb = hi.reshape(-1, blk, ns)
    lb = lo.reshape(-1, blk, ns)
    prec = jax.lax.Precision.HIGHEST

    def body(carry, x):
        acc, comp = carry
        h, l = x
        g = jnp.dot(h.T, h, preferred_element_type=jnp.float32, precision=prec)
        ghl = jnp.dot(h.T, l, preferred_element_type=jnp.float32, precision=prec)
        g = g + ghl + ghl.T
        y = g - comp
        t = acc + y
        comp = (t - acc) - y
        return (t, comp), None

    if init is None:
        init = (
            jnp.zeros((ns, ns), jnp.float32),
            jnp.zeros((ns, ns), jnp.float32),
        )
        if axes:
            # inside shard_map the carry must be marked device-varying
            init = tuple(jax.lax.pcast(x, axes, to="varying") for x in init)
    (acc, comp), _ = jax.lax.scan(body, init, (hb, lb))
    return acc, comp


def _ca_math(table, n_dims: int, d_full: int | None = None):
    """The CA factorization on a (possibly sharded) [K, ns] table.

    Pure jnp; sharding of ``table`` along axis 0 makes XLA compute the
    column sums and the Gram matrix with psums over the kmer axis.  This is
    the all-device "fast" path (dryruns, in-jit training steps); the
    higher-precision two-limb path lives in :func:`ca_fit_sharded`.
    """
    total = table.sum()
    P_ = table / total
    r = P_.sum(axis=1)  # [K] sharded
    c = P_.sum(axis=0)  # [ns] replicated (psum over kmer shards)
    r_safe = jnp.where(r > 0, r, 1.0)
    c_safe = jnp.where(c > 0, c, 1.0)
    S = (P_ - r[:, None] * c[None, :]) / jnp.sqrt(
        r_safe[:, None] * c_safe[None, :]
    )
    G = jnp.dot(
        S.T,
        S,
        preferred_element_type=S.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    evals, evecs = jnp.linalg.eigh(G)  # ascending
    # total inertia over the non-trivial spectrum (top min(nk,ns)-1: the
    # trailing eigenvalue is exactly zero in exact arithmetic), so n_dims
    # truncation reports each dim's share of the whole, matching R ca()'s
    # sv^2/sum(sv^2) over its nd = min(dim)-1 computed values
    nd = max(1, min(table.shape) - 1) if d_full is None else d_full
    total_in = jnp.maximum(evals[::-1][:nd], 0.0).sum()
    evals = evals[::-1][:n_dims]
    V = evecs[:, ::-1][:, :n_dims]
    evals = jnp.maximum(evals, 0.0)
    sv = jnp.sqrt(evals)
    # deterministic sign: largest-|.| component of each column positive
    amax = jnp.argmax(jnp.abs(V), axis=0)
    signs = jnp.sign(V[amax, jnp.arange(n_dims)])
    signs = jnp.where(signs == 0, 1.0, signs)
    V = V * signs[None, :]
    sample_coords = V * sv[None, :] / jnp.sqrt(c_safe)[:, None]
    sv_safe = jnp.where(sv > 0, sv, 1.0)
    phi = (
        jnp.dot(S, V / sv_safe[None, :], preferred_element_type=S.dtype)
        / jnp.sqrt(r_safe)[:, None]
    )
    phi = jnp.where((r > 0)[:, None], phi, 0.0)
    inertia = jnp.where(total_in > 0, evals / total_in, evals)
    return sample_coords, inertia, phi, sv  # phi [K, d] sharded over kmer


def _gram_dd_from_compact_local(
    x, ah, al, uh, ul, bh, bl, vh, vl,
    n_blocks: int = 16, axes: tuple = (), init=None,
):
    """Like :func:`_gram_dd_local`, but the two residual limbs are
    RECONSTRUCTED on device from a compact exact table shard ``x`` and
    dd-split scaling vectors (ops/dd.py), inside the scan body — so the
    host uploads 1-4 bytes/entry instead of the 8 bytes of precomputed
    limbs.  Returns ``(acc, comp)`` like :func:`_gram_dd_local`."""
    from ..ops.dd import residual_dd

    K, ns = x.shape
    blk = max(1, -(-K // n_blocks))
    pad = (-K) % blk
    x = jnp.pad(x, ((0, pad), (0, 0)))
    # padded rows: x == 0 and alpha == u == 0 -> residual == 0
    ah, al, uh, ul = (jnp.pad(t, (0, pad)) for t in (ah, al, uh, ul))
    xb = x.reshape(-1, blk, ns)
    rb = jnp.stack(
        [t.reshape(-1, blk) for t in (ah, al, uh, ul)], axis=1
    )  # [n_blocks, 4, blk]
    prec = jax.lax.Precision.HIGHEST

    def body(carry, inp):
        acc, comp = carry
        xq, rv = inp
        a1, a2, u1, u2 = rv[0], rv[1], rv[2], rv[3]
        h, l = residual_dd(
            xq.astype(jnp.float32),
            a1[:, None], a2[:, None],
            bh[None, :], bl[None, :],
            u1[:, None], u2[:, None],
            vh[None, :], vl[None, :],
        )
        g = jnp.dot(h.T, h, preferred_element_type=jnp.float32, precision=prec)
        ghl = jnp.dot(h.T, l, preferred_element_type=jnp.float32, precision=prec)
        g = g + ghl + ghl.T
        y = g - comp
        t = acc + y
        comp = (t - acc) - y
        return (t, comp), None

    if init is None:
        init = (
            jnp.zeros((ns, ns), jnp.float32),
            jnp.zeros((ns, ns), jnp.float32),
        )
        if axes:
            init = tuple(jax.lax.pcast(t, axes, to="varying") for t in init)
    (acc, comp), _ = jax.lax.scan(body, init, (xb, rb))
    return acc, comp


_CA_FN_CACHE: dict = {}


def _sds(shape, dtype, sharding):
    return jax.ShapeDtypeStruct(shape, dtype, sharding=sharding)


def _compile_parallel(items, cache: dict | None = None) -> None:
    """``items``: list of (cache_key, build_fn) where build_fn() returns a
    compiled executable; ``cache`` defaults to the CA function cache (the
    device digest passes its own).  Missing entries compile CONCURRENTLY
    in threads: the axon remote-compile service handles parallel requests
    (measured: two ~11 s compiles finish together in about the time of
    one), and the jit dispatch cache does NOT reuse AOT executables
    (measured: a jit call after .lower().compile() recompiled from
    scratch) — so the cold CA fit calls the compiled objects directly
    instead of the jits."""
    import threading

    if cache is None:
        cache = _CA_FN_CACHE
    missing = [(k, b) for k, b in items if k not in cache]
    if not missing:
        return
    if len(missing) == 1:
        k, b = missing[0]
        cache[k] = b()
        return
    results: dict = {}

    def run(k, b):
        try:
            results[k] = b()
        except Exception as e:  # re-raised on the main thread below
            results[k] = e

    threads = [
        threading.Thread(target=run, args=(k, b)) for k, b in missing
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for k, _b in missing:
        r = results[k]
        if isinstance(r, Exception):
            raise r
        cache[k] = r


def _mesh_key(mesh: Mesh) -> tuple:
    """Stable cache key for a mesh: axis layout + the devices' own stable
    identifiers (``id()`` values can be reused after GC, which could alias a
    rebuilt mesh onto a stale jitted function)."""
    return (
        tuple(mesh.shape.items()),
        tuple(
            (d.id, getattr(d, "process_index", 0), d.platform)
            for d in mesh.devices.flat
        ),
    )


def _gram_fn_cached(mesh: Mesh):
    """The jitted per-shard dd-Gram, cached per mesh: a fresh
    ``jax.jit(shard_map(...))`` every call would miss the jit cache and
    recompile (~13 s per CA fit over the remote-compile tunnel)."""
    key = ("gram", _mesh_key(mesh))
    if key not in _CA_FN_CACHE:

        def local_gram(hi, lo):
            acc, comp = _gram_dd_local(hi, lo, axes=(DATA_AXIS, KMER_AXIS))
            return acc[None], comp[None]

        _CA_FN_CACHE[key] = jax.jit(
            jax.shard_map(
                local_gram,
                mesh=mesh,
                in_specs=(P((DATA_AXIS, KMER_AXIS), None),) * 2,
                out_specs=(P((DATA_AXIS, KMER_AXIS), None, None),) * 2,
            )
        )
    return _CA_FN_CACHE[key]


def _gram_compact_fn_cached(mesh: Mesh, kind: str):
    """Jitted per-shard compact-table dd-Gram, cached per (mesh, dtype)."""
    key = ("gramc", kind, _mesh_key(mesh))
    if key not in _CA_FN_CACHE:

        def local(x, ah, al, uh, ul, bh, bl, vh, vl):
            acc, comp = _gram_dd_from_compact_local(
                x, ah, al, uh, ul, bh, bl, vh, vl,
                axes=(DATA_AXIS, KMER_AXIS),
            )
            return acc[None], comp[None]

        row = P((DATA_AXIS, KMER_AXIS))
        rep = P(None)
        _CA_FN_CACHE[key] = jax.jit(
            jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(P((DATA_AXIS, KMER_AXIS), None),)
                + (row,) * 4
                + (rep,) * 4,
                out_specs=(P((DATA_AXIS, KMER_AXIS), None, None),) * 2,
            )
        )
    return _CA_FN_CACHE[key]


def _phi_compact_fn_cached(mesh: Mesh, kind: str):
    """Jitted phi matmul with the f32 residual limb reconstructed on device
    from the compact table (no second upload of S)."""
    key = ("phic", kind, _mesh_key(mesh))
    if key not in _CA_FN_CACHE:
        from ..ops.dd import residual_dd

        x_sharding = NamedSharding(mesh, P((DATA_AXIS, KMER_AXIS), None))

        def fn(x, ah, al, uh, ul, bh, bl, vh, vl, vs, rs):
            h, _l = residual_dd(
                x.astype(jnp.float32),
                ah[:, None], al[:, None],
                bh[None, :], bl[None, :],
                uh[:, None], ul[:, None],
                vh[None, :], vl[None, :],
            )
            return (
                jnp.dot(
                    h,
                    vs,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                * rs
            )

        _CA_FN_CACHE[key] = jax.jit(fn, out_shardings=x_sharding)
    return _CA_FN_CACHE[key]


def _aot_compact_fns(mesh: Mesh, kind: str, rows: int, ns: int, d: int,
                     wire_dt):
    """AOT-compiled (gram, phi) executables for the resident compact path
    at a concrete shape, compiled CONCURRENTLY (see :func:`_compile_parallel`
    — the two remote compiles dominate the cold fit wall and the service
    runs them in parallel).  Falls back to the lazily-jitted functions if
    AOT lowering is unavailable."""
    x_sh = NamedSharding(mesh, P((DATA_AXIS, KMER_AXIS), None))
    row_sh = NamedSharding(mesh, P((DATA_AXIS, KMER_AXIS)))
    rep_sh = NamedSharding(mesh, P(None))
    rep2 = NamedSharding(mesh, P(None, None))
    mk = _mesh_key(mesh)
    gk = ("gramc-aot", kind, rows, ns, mk)
    pk = ("phic-aot", kind, rows, ns, d, mk)
    vec_specs = (
        (_sds((rows,), np.float32, row_sh),) * 4
        + (_sds((ns,), np.float32, rep_sh),) * 4
    )

    def build_gram():
        fn = _gram_compact_fn_cached(mesh, kind)
        return fn.lower(
            _sds((rows, ns), wire_dt, x_sh), *vec_specs
        ).compile()

    def build_phi():
        fn = _phi_compact_fn_cached(mesh, kind)
        return fn.lower(
            _sds((rows, ns), wire_dt, x_sh),
            *vec_specs,
            _sds((ns, d), np.float32, rep2),
            _sds((rows, 1), np.float32, x_sh),
        ).compile()

    try:
        _compile_parallel([(gk, build_gram), (pk, build_phi)])
        return _CA_FN_CACHE[gk], _CA_FN_CACHE[pk]
    except Exception:  # pragma: no cover - AOT unsupported: lazy jits
        return (
            _gram_compact_fn_cached(mesh, kind),
            _phi_compact_fn_cached(mesh, kind),
        )


def _aot_limb_fns(mesh: Mesh, rows: int, ns: int, d: int):
    """AOT (gram, phi) pair for the two-limb fallback path at the per-block
    shape (both limb blocks and phi blocks share it)."""
    x_sh = NamedSharding(mesh, P((DATA_AXIS, KMER_AXIS), None))
    rep2 = NamedSharding(mesh, P(None, None))
    mk = _mesh_key(mesh)
    gk = ("gram-aot", rows, ns, mk)
    pk = ("phi-aot", rows, ns, d, mk)

    def build_gram():
        fn = _gram_fn_cached(mesh)
        s = _sds((rows, ns), np.float32, x_sh)
        return fn.lower(s, s).compile()

    def build_phi():
        fn = _phi_fn_cached(mesh)
        return fn.lower(
            _sds((rows, ns), np.float32, x_sh),
            _sds((ns, d), np.float32, rep2),
            _sds((rows, 1), np.float32, x_sh),
        ).compile()

    try:
        _compile_parallel([(gk, build_gram), (pk, build_phi)])
        return _CA_FN_CACHE[gk], _CA_FN_CACHE[pk]
    except Exception:  # pragma: no cover
        return _gram_fn_cached(mesh), _phi_fn_cached(mesh)


def _aot_stream_fns(
    mesh: Mesh, kind: str | None, rows: int, ns: int, d: int, wire_dt
):
    """AOT (gram-with-carry, phi) pair for the streamed path at the fixed
    block shape, compiled concurrently before the first upload."""
    x_sh = NamedSharding(mesh, P((DATA_AXIS, KMER_AXIS), None))
    row_sh = NamedSharding(mesh, P((DATA_AXIS, KMER_AXIS)))
    rep_sh = NamedSharding(mesh, P(None))
    rep2 = NamedSharding(mesh, P(None, None))
    car_sh = NamedSharding(mesh, P((DATA_AXIS, KMER_AXIS), None, None))
    n_sh = mesh.devices.size
    mk = _mesh_key(mesh)
    car_specs = (_sds((n_sh, ns, ns), np.float32, car_sh),) * 2
    if kind is not None:
        gk = ("gramc-carry-aot", kind, rows, ns, mk)
        pk = ("phic-aot", kind, rows, ns, d, mk)
        vec_specs = (
            (_sds((rows,), np.float32, row_sh),) * 4
            + (_sds((ns,), np.float32, rep_sh),) * 4
        )

        def build_gram():
            fn = _gram_compact_carry_fn_cached(mesh, kind)
            return fn.lower(
                _sds((rows, ns), wire_dt, x_sh), *vec_specs, *car_specs
            ).compile()

        def build_phi():
            fn = _phi_compact_fn_cached(mesh, kind)
            return fn.lower(
                _sds((rows, ns), wire_dt, x_sh),
                *vec_specs,
                _sds((ns, d), np.float32, rep2),
                _sds((rows, 1), np.float32, x_sh),
            ).compile()

    else:
        gk = ("gram-carry-aot", rows, ns, mk)
        pk = ("phi-aot", rows, ns, d, mk)

        def build_gram():
            fn = _gram_limbs_carry_fn_cached(mesh)
            s = _sds((rows, ns), np.float32, x_sh)
            return fn.lower(s, s, *car_specs).compile()

        def build_phi():
            fn = _phi_fn_cached(mesh)
            return fn.lower(
                _sds((rows, ns), np.float32, x_sh),
                _sds((ns, d), np.float32, rep2),
                _sds((rows, 1), np.float32, x_sh),
            ).compile()

    try:
        _compile_parallel([(gk, build_gram), (pk, build_phi)])
        return _CA_FN_CACHE[gk], _CA_FN_CACHE[pk]
    except Exception:  # pragma: no cover
        if kind is not None:
            return (
                _gram_compact_carry_fn_cached(mesh, kind),
                _phi_compact_fn_cached(mesh, kind),
            )
        return _gram_limbs_carry_fn_cached(mesh), _phi_fn_cached(mesh)


#: set by the last dd-path ca_fit_sharded call: "u8"/"u16"/"f32" when the
#: compact on-device-residual upload was used, "limbs" for the two-limb
#: host-residual fallback (introspection for tests and KPOP_CA_DEBUG).
LAST_DD_UPLOAD: str | None = None


def _compact_exact_cast(table: np.ndarray):
    """Return ``(compact_array, kind)`` when every table value is exactly
    representable in float32 — ``kind`` in {"u8", "u16", "f32"} picks the
    smallest wire dtype — else ``(None, None)``.  One blocked pass."""
    if table.dtype == np.float32:
        # the compact residual path masks alpha to rows with r > 0, which is
        # only equivalent to the fallback's divide-by-r_safe when entries
        # cannot cancel — require nonnegativity (counts are nonnegative by
        # construction; signed tables take the exact two-limb fallback)
        if table.size and not (table >= 0).all():
            return None, None
        kind_arr = table
        is_int, mx, mn = False, None, None
        # still probe integrality/range for a smaller wire dtype
        is_int = bool((table == np.floor(table)).all())
        if is_int and table.size:
            mx = float(table.max())
    elif np.issubdtype(table.dtype, np.integer):
        mn = int(table.min()) if table.size else 0
        mx = int(table.max()) if table.size else 0
        if mn < 0 or mx >= (1 << 24):
            return None, None
        is_int, kind_arr = True, table
    elif table.dtype == np.float64:
        step = max(1, (8 << 20) // max(1, int(table.shape[1])))
        is_int, mx = True, 0.0
        for i in range(0, table.shape[0], step):
            blk = table[i : i + step]
            if not np.array_equal(blk, blk.astype(np.float32)):
                return None, None
            if blk.size and not (blk >= 0).all():  # see float32 case above
                return None, None
            if is_int and not (blk == np.floor(blk)).all():
                is_int = False
            m = float(blk.max()) if blk.size else 0.0
            mx = m if m > mx else mx
        kind_arr = table
    else:
        return None, None
    if is_int and mx is not None and mx < 256:
        return kind_arr.astype(np.uint8), "u8"
    if is_int and mx is not None and mx < 65536:
        return kind_arr.astype(np.uint16), "u16"
    return kind_arr.astype(np.float32), "f32"


#: stats of the last HBM-budgeted streamed CA fit (None when the resident
#: path ran): wire kind, block geometry, budget, per-device block bytes.
LAST_CA_STREAM: dict | None = None


def _hbm_budget(mesh: Mesh) -> int | None:
    """Per-device CA residency budget in bytes.

    ``KPOP_CA_HBM_BYTES`` overrides; otherwise 60% of the device's reported
    memory limit when the backend exposes one (TPU), else None (unbudgeted
    — CPU meshes).  The reference's CA is bounded only by host RAM
    (src/KPopTwist:95-96, R ``ca()``); this is the device-side equivalent
    of that bound, turning would-be OOMs at the k=12 flagship table
    (~16.7M k-mers x 1000 samples, README.md:530) into streamed fits.
    """
    env = os.environ.get("KPOP_CA_HBM_BYTES")
    if env:
        try:
            val = int(float(env))
        except ValueError:
            # an unparseable override must not silently DISABLE budgeting
            # (that is the opposite of what the user asked for): warn and
            # fall through to the default
            import sys

            sys.stderr.write(
                "ca_fit_sharded: ignoring unparseable KPOP_CA_HBM_BYTES=%r; "
                "using the default budget\n" % env
            )
        else:
            # an explicit 0 (or negative) disables budgeting
            return val if val > 0 else None
    try:
        stats = mesh.devices.flat[0].memory_stats()
        limit = (stats or {}).get("bytes_limit")
        if limit:
            return int(limit * 0.6)
    except Exception:
        pass
    try:
        if mesh.devices.flat[0].platform == "tpu":
            # a TPU that doesn't report memory_stats (e.g. reached through
            # the dev tunnel plugin) must still be budgeted: unbudgeted
            # means an OOM instead of a streamed fit at flagship shapes.
            # Assume the smallest current generation (v5e, 16 GB) — a
            # too-low guess only streams earlier than strictly needed.
            return int(16e9 * 0.6)
    except Exception:
        pass
    return None


def _stream_block_rows(
    budget_dev: int, ns: int, d: int, wire_bytes: int, n_shards: int
) -> int:
    """Rows per streamed block such that per-device residency stays within
    ``budget_dev``: two blocks in flight (upload of b+1 overlaps compute of
    b) plus fixed carries/vectors plus scan-temporary headroom."""
    # fixed per device: up to 3 live (acc, comp) carries at [ns, ns] f32,
    # the replicated [ns, d] f32 V/sigma factor, dd column vectors
    fixed = 3 * 2 * ns * ns * 4 + ns * d * 4 + 4 * ns * 4
    # per row, spread over all shards: the wire block, the [*, d] f32 phi
    # output, 4 f32 dd row-vector slices, ~ns/2 B of live scan temporaries
    # (the h/l limb pair of one 1/16 sub-block)
    per_row = (ns * wire_bytes + 4 * d + 16 + ns // 2 + 1) / n_shards
    avail = max(0.0, (budget_dev - fixed) * 0.45)
    rows_dev = int(avail / per_row)
    if rows_dev < 1:
        import sys

        sys.stderr.write(
            "ca_fit_sharded: KPOP_CA_HBM_BYTES=%d is below the minimum "
            "streamable block (~%d B/device); clamping to %d rows/block\n"
            % (budget_dev, int(fixed + per_row * n_shards), n_shards)
        )
        rows_dev = 1
    return rows_dev * n_shards


def _gram_compact_carry_fn_cached(mesh: Mesh, kind: str):
    """Jitted per-shard compact dd-Gram with an explicit (acc, comp) carry:
    the streamed path chains the compensated sum across row blocks."""
    key = ("gramc-carry", kind, _mesh_key(mesh))
    if key not in _CA_FN_CACHE:

        def local(x, ah, al, uh, ul, bh, bl, vh, vl, acc, comp):
            acc2, comp2 = _gram_dd_from_compact_local(
                x, ah, al, uh, ul, bh, bl, vh, vl,
                axes=(DATA_AXIS, KMER_AXIS),
                init=(acc[0], comp[0]),
            )
            return acc2[None], comp2[None]

        row = P((DATA_AXIS, KMER_AXIS))
        rep = P(None)
        car = P((DATA_AXIS, KMER_AXIS), None, None)
        _CA_FN_CACHE[key] = jax.jit(
            jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(P((DATA_AXIS, KMER_AXIS), None),)
                + (row,) * 4
                + (rep,) * 4
                + (car, car),
                out_specs=(car, car),
            )
        )
    return _CA_FN_CACHE[key]


def _gram_limbs_carry_fn_cached(mesh: Mesh):
    """Two-limb variant of :func:`_gram_compact_carry_fn_cached`."""
    key = ("gram-carry", _mesh_key(mesh))
    if key not in _CA_FN_CACHE:

        def local(hi, lo, acc, comp):
            acc2, comp2 = _gram_dd_local(
                hi, lo, axes=(DATA_AXIS, KMER_AXIS), init=(acc[0], comp[0])
            )
            return acc2[None], comp2[None]

        car = P((DATA_AXIS, KMER_AXIS), None, None)
        _CA_FN_CACHE[key] = jax.jit(
            jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(P((DATA_AXIS, KMER_AXIS), None),) * 2 + (car, car),
                out_specs=(car, car),
            )
        )
    return _CA_FN_CACHE[key]


def _zero_carry(mesh: Mesh, ns: int):
    car_sh = NamedSharding(mesh, P((DATA_AXIS, KMER_AXIS), None, None))
    z = np.zeros((mesh.devices.size, ns, ns), np.float32)
    return (jax.device_put(z, car_sh), jax.device_put(np.copy(z), car_sh))


def _ca_fit_streamed(
    mesh: Mesh,
    N: np.ndarray,
    compact,
    kind: str | None,
    d: int,
    masses: tuple,
    w,
    phi: str,
    budget_dev: int,
    tm: "_PhaseTimer",
    verbose: bool = False,
    on_block=None,
):
    """HBM-budgeted CA fit: upload -> accumulate -> DISCARD row blocks for
    the Gram pass, then a second streamed pass re-uploading each block for
    phi.  Device residency stays within ``budget_dev`` per device instead
    of pinning the whole padded table (the resident fast path), so tables
    bigger than the mesh's combined HBM train instead of OOMing.

    The budget bounds the *wire and intermediate* residency.  With
    ``phi="device"`` the full ``[K, d]`` float32 twister additionally
    accumulates on the mesh — it IS the requested output; when its
    estimated footprint exceeds the budget a warning points at
    ``phi="host"`` (host-resident twister) or the kmer-sharded serving
    layout (``parallel/serving.py``).

    ``on_block`` (test hook): called after each block's backpressure step —
    the bounded-residency test probes ``jax.live_arrays()`` there.
    """
    from collections import deque

    from ..ops.dd import split_f64
    from ..utils.progress import Progress

    (total, r, c, r_safe, c_safe, inv_sr, inv_sc, u, v) = masses
    nk, ns = N.shape
    n_shards = mesh.devices.size
    x_sharding = NamedSharding(mesh, P((DATA_AXIS, KMER_AXIS), None))
    row_sh = NamedSharding(mesh, P((DATA_AXIS, KMER_AXIS)))
    rep_sh = NamedSharding(mesh, P(None))
    wire_bytes = {"u8": 1, "u16": 2, "f32": 4}.get(kind, 8)
    blkK = _stream_block_rows(budget_dev, ns, d, wire_bytes, n_shards)
    n_blocks = -(-nk // blkK)
    global LAST_CA_STREAM
    LAST_CA_STREAM = {
        "wire": kind if kind is not None else "limbs",
        "block_rows": blkK,
        "n_blocks": n_blocks,
        "budget_bytes_per_device": budget_dev,
        "block_bytes_per_device": blkK * ns * wire_bytes // n_shards,
        "max_live_blocks": 2,
    }

    compact_mode = compact is not None
    if compact_mode:
        beta = (w if w is not None else 1.0) / (total * np.sqrt(c_safe))
        bh, bl = (jax.device_put(t, rep_sh) for t in split_f64(beta))
        vh, vl = (jax.device_put(t, rep_sh) for t in split_f64(v))
        alpha = inv_sr * (r > 0)

    def _host_residual(i0: int, i1: int) -> np.ndarray:
        """Standardized residual rows [i0, i1) in host float64 (the limb
        wire), zero-padded to blkK rows."""
        Sb = np.array(N[i0:i1], dtype=np.float64)
        if w is not None:
            Sb *= w[None, :]
        Sb /= total
        Sb *= inv_sr[i0:i1, None]
        Sb *= inv_sc[None, :]
        Sb -= u[i0:i1, None] * v[None, :]
        if i1 - i0 < blkK:
            Sb = np.concatenate(
                [Sb, np.zeros((blkK - (i1 - i0), ns))], axis=0
            )
        return Sb

    def _block_arrays(b: int, for_phi: bool):
        """Upload block b's device arrays; returns (args tuple, refs list)."""
        i0, i1 = b * blkK, min(nk, (b + 1) * blkK)
        pad = blkK - (i1 - i0)
        if compact_mode:
            xb = compact[i0:i1]
            if pad:
                xb = np.concatenate(
                    [xb, np.zeros((pad, ns), dtype=xb.dtype)], axis=0
                )
            xd = jax.device_put(xb, x_sharding)
            # alpha == 0 on padded rows kills their residual contribution
            rv = []
            for vec in (alpha, u):
                hi, lo = split_f64(np.pad(vec[i0:i1], (0, pad)))
                rv.append(jax.device_put(hi, row_sh))
                rv.append(jax.device_put(lo, row_sh))
            refs = [xd] + rv
            return (xd, *rv, bh, bl, vh, vl), refs
        Sb = _host_residual(i0, i1)
        hi = Sb.astype(np.float32)
        hi_d = jax.device_put(hi, x_sharding)
        if for_phi:
            return (hi_d,), [hi_d]
        np.subtract(Sb, hi, out=Sb)
        lo_d = jax.device_put(Sb.astype(np.float32), x_sharding)
        return (hi_d, lo_d), [hi_d, lo_d]

    def _drain(pending: deque, keep: int, sync_idx: int = -1) -> None:
        """Backpressure: once more than ``keep`` blocks are in flight,
        wait for the oldest block's result and DELETE its uploads."""
        while len(pending) > keep:
            refs, result = pending.popleft()
            jax.block_until_ready(
                result[sync_idx] if isinstance(result, tuple) else result
            )
            for a in refs:
                a.delete()
            if on_block is not None:
                on_block()

    # ---- pass 1: streamed Gram (gram + phi compiled concurrently) ----
    gram_fn, phi_fn = _aot_stream_fns(
        mesh, kind if compact_mode else None, blkK, ns, d,
        compact.dtype if compact_mode else None,
    )
    tm.mark("compile")
    carry = _zero_carry(mesh, ns)
    pending: deque = deque()
    prog = Progress(
        "ca_fit_sharded", "Streaming Gram blocks", n_blocks,
        enabled=True if verbose else None,
    )
    for b in range(n_blocks):
        # retire block b-2 BEFORE uploading block b: at most two blocks
        # (b-1 computing, b uploading) are ever device-resident, which is
        # what _stream_block_rows sizes the budget for
        _drain(pending, keep=1, sync_idx=0)
        args, refs = _block_arrays(b, for_phi=False)
        carry = gram_fn(*args, *carry)
        pending.append((refs, carry))
        prog.update(b + 1)
    _drain(pending, keep=0, sync_idx=0)
    prog.done()
    accs, comps = carry
    G = (
        np.asarray(_host(accs), dtype=np.float64)
        - np.asarray(_host(comps), dtype=np.float64)
    ).sum(axis=0)
    tm.mark("gram-streamed[%d blocks]" % n_blocks)
    # ---- host eigendecomposition (tiny) ----
    sample_coords, inertia, sv, V, sv_safe = _factor_gram_host(
        G, d, c_safe, max(1, min(nk, ns) - 1)
    )
    tm.mark("eigh")
    # ---- pass 2: streamed phi (re-upload each block, then discard) ----
    Vs_d = jax.device_put(
        (V / sv_safe[None, :]).astype(np.float32),
        NamedSharding(mesh, P(None, None)),
    )
    rs_full = (inv_sr * (r > 0)).astype(np.float32)
    if phi == "device":
        out_dev_bytes = n_blocks * blkK * d * 4 // n_shards
        if out_dev_bytes > budget_dev:
            import sys

            sys.stderr.write(
                "ca_fit_sharded: phi='device' keeps the full [%d, %d] f32 "
                "twister device-resident (~%d B/device, above the %d B "
                "budget); use phi='host' or serve through the kmer-sharded "
                "layout (parallel/serving.py)\n"
                % (nk, d, out_dev_bytes, budget_dev)
            )
    host_blocks: list = []
    dev_blocks: list = []
    pending = deque()
    prog = Progress(
        "ca_fit_sharded", "Streaming phi blocks", n_blocks,
        enabled=True if verbose else None,
    )
    for b in range(n_blocks):
        # as in the Gram pass: retire block b-2 before uploading block b so
        # at most two wire blocks are in flight
        if phi == "device":
            _drain(pending, keep=1)
        elif len(pending) > 1:
            # the host fetch blocks on ph: natural backpressure
            oldrefs, oldph = pending.popleft()
            host_blocks.append(np.asarray(_host(oldph), dtype=np.float64))
            for a in oldrefs:
                a.delete()
            oldph.delete()
            if on_block is not None:
                on_block()
        args, refs = _block_arrays(b, for_phi=True)
        rs_blk = np.zeros((blkK, 1), np.float32)
        seg = rs_full[b * blkK : min(nk, (b + 1) * blkK)]
        rs_blk[: seg.shape[0], 0] = seg
        rs_d = jax.device_put(rs_blk, x_sharding)
        if compact_mode:
            ph = phi_fn(*args, Vs_d, rs_d)
        else:
            ph = phi_fn(args[0], Vs_d, rs_d)
        refs = refs + [rs_d]
        if phi == "device":
            dev_blocks.append(ph)
        pending.append((refs, ph))
        prog.update(b + 1)
    if phi == "device":
        _drain(pending, keep=0)
        tw = _concat_fn_cached(mesh, len(dev_blocks))(*dev_blocks)[:nk]
    else:
        while pending:
            oldrefs, oldph = pending.popleft()
            host_blocks.append(np.asarray(_host(oldph), dtype=np.float64))
            for a in oldrefs:
                a.delete()
            oldph.delete()
            if on_block is not None:
                on_block()
        tw = np.concatenate(host_blocks)[:nk].T
    prog.done()
    tm.mark("phi-streamed[%d blocks]" % n_blocks)
    return (sample_coords, inertia, tw, sv)


def _phi_fn_cached(mesh: Mesh):
    """Jitted phi matmul, cached per mesh (same recompile trap as the Gram)."""
    key = ("phi", _mesh_key(mesh))
    if key not in _CA_FN_CACHE:
        x_sharding = NamedSharding(mesh, P((DATA_AXIS, KMER_AXIS), None))
        _CA_FN_CACHE[key] = jax.jit(
            lambda hi, vs, rs: jnp.dot(
                hi,
                vs,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            * rs,
            out_shardings=x_sharding,
        )
    return _CA_FN_CACHE[key]


def _concat_fn_cached(mesh: Mesh, n_blocks: int):
    """Jitted row-wise concat of the per-block phi results, cached per
    (mesh, block count) so the device twister stays sharded end to end."""
    key = ("concat", n_blocks, _mesh_key(mesh))
    if key not in _CA_FN_CACHE:
        if n_blocks == 1:
            _CA_FN_CACHE[key] = lambda x: x
        else:
            x_sharding = NamedSharding(mesh, P((DATA_AXIS, KMER_AXIS), None))
            _CA_FN_CACHE[key] = jax.jit(
                lambda *xs: jnp.concatenate(xs, axis=0),
                out_shardings=x_sharding,
            )
    return _CA_FN_CACHE[key]


def _factor_gram_host(G: np.ndarray, d: int, c_safe: np.ndarray,
                      d_full: int):
    """Host float64 eigendecomposition of the [ns, ns] Gram + the CA output
    conventions (descending order, deterministic column signs, principal
    sample coordinates) — shared by both dd upload paths.

    ``d_full`` = min(nk, ns) - 1, the non-trivial spectrum size: inertia is
    normalized over the top ``d_full`` eigenvalues BEFORE truncating to
    ``d``, so n_dims-truncated fits report each dim's share of the whole
    (R ca()'s sv^2/sum(sv^2)), not of the kept dims — and the trailing
    eigenvalue (exactly zero in exact arithmetic) stays out of the total.
    """
    evals, evecs = np.linalg.eigh(G)
    order = np.argsort(evals)[::-1]
    ev_desc = evals[order]
    total_in = float(np.maximum(ev_desc[: max(1, d_full)], 0.0).sum())
    evals, evecs = ev_desc[:d], evecs[:, order][:, :d]
    evals = np.maximum(evals, 0.0)
    sv = np.sqrt(evals)
    signs = np.sign(evecs[np.argmax(np.abs(evecs), axis=0), np.arange(d)])
    signs = np.where(signs == 0, 1.0, signs)
    V = evecs * signs[None, :]
    sample_coords = V * sv[None, :] / np.sqrt(c_safe)[:, None]
    sv_safe = np.where(sv > 0, sv, 1.0)
    inertia = evals / total_in if total_in > 0 else evals
    return sample_coords, inertia, sv, V, sv_safe


def ca_fit_sharded(
    mesh: Mesh,
    table: np.ndarray,
    n_dims: int | None = None,
    precision: str = "dd",
    phi: str = "host",
    block_bytes: int = 64 << 20,
    col_weights: np.ndarray | None = None,
    hbm_bytes: int | None = None,
    verbose: bool = False,
    _stream_probe=None,
):
    """Fit CA with the k-mer axis sharded across the whole mesh.

    ``table``: host [n_kmers, n_samples].  Returns
    (sample_coords, inertia, twister, sv) — host float64 arrays, except that
    with ``phi="device"`` the twister comes back as the device-resident
    ``[K, d]`` float32 row matrix (k-mers x dims, table row order, sharded
    over the mesh) instead of the host ``[d, K]`` transpose.  The device
    form feeds straight into serving (``ClassifierParams.twister``) without
    a download+re-upload round trip — at a 221K x 512 training table that
    skips ~0.5 GB of host traffic.

    ``precision="dd"`` (default): near-float64 CA factors with all heavy
    FLOPs on device.  When every table value is exactly f32-representable
    (integer k-mer counts < 2^24, or an f32 table) the table is uploaded
    ONCE in the smallest exact wire dtype (uint8/uint16/f32) and the
    standardized residual limbs are reconstructed on device in double-double
    arithmetic (ops/dd.py) — 2-8x less transfer than the fallback, which
    computes the residuals on the host in float64 and ships TWO float32
    limbs block by block.  Either way each shard accumulates its Gram
    contribution with exact-product matmuls + Kahan blocks, the per-shard
    (acc, comp) pairs are combined in float64 on the host, and the tiny
    eigendecomposition runs in host float64.  :data:`LAST_DD_UPLOAD` records
    which wire path ran.
    ``precision="fast"``: everything on device in float32 (:func:`_ca_math`).

    ``col_weights``: optional per-column multipliers applied to the table
    (the KPopTwist driver's per-spectrum normalization, src/KPopTwist:92-94)
    — passing them separately keeps an integer table on the compact path
    instead of forcing a float64 materialization.

    ``hbm_bytes``: per-device residency budget (default: the
    ``KPOP_CA_HBM_BYTES`` env var, else 60% of the device memory limit when
    the backend reports one, else unbudgeted).  When the resident dd paths
    would exceed it, the fit switches to :func:`_ca_fit_streamed`: Gram
    blocks are uploaded, accumulated, and DISCARDED, then a second streamed
    pass re-uploads each block for phi — bounded device memory at any table
    size (:data:`LAST_CA_STREAM` records the block geometry).
    ``verbose`` adds live block progress on stderr; ``_stream_probe`` is a
    test hook called once per retired block.
    """
    nk, ns = table.shape
    # cap at the non-trivial spectrum (see core/ca.py::fit_ca): an
    # over-large n_dims would keep a pure-noise phi column
    d_full = max(1, min(nk, ns) - 1)
    d = d_full if n_dims is None else max(1, min(n_dims, d_full))
    n_shards = mesh.devices.size
    x_sharding = NamedSharding(mesh, P((DATA_AXIS, KMER_AXIS), None))
    if precision == "fast":
        if col_weights is not None:
            table = np.asarray(table) * np.asarray(col_weights)[None, :]
        padded, orig = pad_to_multiple(device_canonical(table), 0, n_shards)
        xs = jax.device_put(padded, x_sharding)
        d_full = max(1, min(nk, ns) - 1)  # from the UNPADDED row count
        key = ("fast", d, d_full, _mesh_key(mesh))
        if key not in _CA_FN_CACHE:
            _CA_FN_CACHE[key] = jax.jit(
                lambda t: _ca_math(t, d, d_full),
                out_shardings=(
                    NamedSharding(mesh, P(None, None)),
                    NamedSharding(mesh, P(None)),
                    x_sharding,
                    NamedSharding(mesh, P(None)),
                ),
            )
        coords, inertia, phi_d, sv = _CA_FN_CACHE[key](xs)
        tw = phi_d[:orig] if phi == "device" else _host(phi_d)[:orig].T
        return (_host(coords), _host(inertia), tw, _host(sv))
    if precision != "dd":
        raise ValueError(f"unknown CA precision {precision!r}")
    global LAST_DD_UPLOAD
    tm = _PhaseTimer("ca_fit_sharded")
    N = np.asarray(table)
    w = (
        None
        if col_weights is None
        else np.asarray(col_weights, dtype=np.float64)
    )
    # ---- masses in host float64 (one pass; weights folded, not applied) --
    if w is None:
        roww = N.sum(axis=1, dtype=np.float64)
        colw = N.sum(axis=0, dtype=np.float64)
    else:
        # blocked N @ w: a whole-table astype(float64) would double the
        # table's memory (8 B/entry) exactly at the flagship shapes the
        # streaming paths exist for
        roww = np.empty(N.shape[0], dtype=np.float64)
        step = max(1, (64 << 20) // max(1, N.shape[1] * 8))
        for i in range(0, N.shape[0], step):
            roww[i : i + step] = N[i : i + step].astype(np.float64) @ w
        colw = N.sum(axis=0, dtype=np.float64) * w
    total = float(roww.sum())
    r = roww / total
    c = colw / total
    r_safe = np.where(r > 0, r, 1.0)
    c_safe = np.where(c > 0, c, 1.0)
    inv_sr = 1.0 / np.sqrt(r_safe)
    inv_sc = 1.0 / np.sqrt(c_safe)
    u = r * inv_sr  # sqrt(r), 0 where r == 0
    v = c * inv_sc
    tm.mark("masses")
    # ---- compact upload path: when the table is exactly f32-representable
    # (integer counts, f32 tables), upload it ONCE at 1-4 bytes/entry and
    # reconstruct the dd residual limbs on device (ops/dd.py) — vs the
    # 8 bytes/entry of host-computed limbs.  The transfer is the measured
    # bottleneck of a big fit, so this is a 2-8x cut of its dominant cost. --
    compact, kind = _compact_exact_cast(N)
    # ---- HBM budget guard: the resident paths below pin the whole wire
    # table (compact) or every hi limb (fallback) plus the full [K, d] phi
    # on device; when that exceeds the per-device budget, stream instead --
    global LAST_CA_STREAM
    LAST_CA_STREAM = None
    budget = hbm_bytes if hbm_bytes is not None else _hbm_budget(mesh)
    if budget:
        pad_rows = -(-nk // n_shards) * n_shards
        wire_b = {"u8": 1, "u16": 2, "f32": 4}[kind] if kind else 4
        resident_dev = pad_rows * (ns * wire_b + d * 4) / n_shards
        if resident_dev > budget:
            LAST_DD_UPLOAD = kind if kind else "limbs"
            masses = (total, r, c, r_safe, c_safe, inv_sr, inv_sc, u, v)
            return _ca_fit_streamed(
                mesh, N, compact, kind, d, masses, w, phi, budget, tm,
                verbose=verbose, on_block=_stream_probe,
            )
    if compact is not None:
        from ..ops.dd import split_f64

        LAST_DD_UPLOAD = kind
        beta = (w if w is not None else 1.0) / (total * np.sqrt(c_safe))
        Xp, _ = pad_to_multiple(compact, 0, n_shards)
        row_sh = NamedSharding(mesh, P((DATA_AXIS, KMER_AXIS)))
        rep_sh = NamedSharding(mesh, P(None))
        pad_rows = Xp.shape[0] - nk
        # compile gram + phi CONCURRENTLY before uploading (the two remote
        # compiles dominate the cold wall; the service parallelizes them)
        gram_fn, phi_fn = _aot_compact_fns(
            mesh, kind, Xp.shape[0], ns, d, Xp.dtype
        )
        tm.mark("compile")

        def _rowvec(a64):  # dd-split, zero-padded, uploaded
            hi, lo = split_f64(np.pad(a64, (0, pad_rows)))
            return (
                jax.device_put(hi, row_sh),
                jax.device_put(lo, row_sh),
            )

        def _colvec(a64):
            hi, lo = split_f64(a64)
            return (
                jax.device_put(hi, rep_sh),
                jax.device_put(lo, rep_sh),
            )

        Xd = jax.device_put(Xp, x_sharding)
        ah, al = _rowvec(inv_sr * (r > 0))  # alpha == 0 on padded rows
        uh, ul = _rowvec(u)
        bh, bl = _colvec(beta)
        vh, vl = _colvec(v)
        tm.mark("compact-upload")
        accs, comps = gram_fn(Xd, ah, al, uh, ul, bh, bl, vh, vl)
        G = (
            np.asarray(_host(accs), dtype=np.float64)
            - np.asarray(_host(comps), dtype=np.float64)
        ).sum(axis=0)
        tm.mark("gram")
        sample_coords, inertia, sv, V, sv_safe = _factor_gram_host(
            G, d, c_safe, max(1, min(nk, ns) - 1)
        )
        tm.mark("eigh")
        rs = np.pad((inv_sr * (r > 0)), (0, pad_rows)).astype(np.float32)
        phi_d = phi_fn(
            Xd, ah, al, uh, ul, bh, bl, vh, vl,
            jax.device_put(
                (V / sv_safe[None, :]).astype(np.float32),
                NamedSharding(mesh, P(None, None)),
            ),
            jax.device_put(rs[:, None], x_sharding),
        )
        tw = (
            phi_d[:nk]
            if phi == "device"
            else np.asarray(_host(phi_d), dtype=np.float64)[:nk].T
        )
        tm.mark("phi")
        return (sample_coords, inertia, tw, sv)
    # ---- two-limb fallback: host float64 standardized residuals, computed
    # and uploaded block by block: device_put and the jitted Gram dispatch
    # are asynchronous, so the transfers and the dd-Gram matmuls of block b
    # overlap the host arithmetic of block b+1 ----
    LAST_DD_UPLOAD = "limbs"
    if w is not None:
        N = N * w[None, :]
    # ~block_bytes of float32 per block, rounded to the shard count
    target = max(1, block_bytes // max(1, ns * 4))
    blkK = max(
        n_shards,
        min(-(-nk // n_shards) * n_shards, -(-target // n_shards) * n_shards),
    )
    n_blocks = -(-nk // blkK)
    gram_fn, phi_fn = _aot_limb_fns(mesh, blkK, ns, d)
    tm.mark("compile")
    hi_blocks = []  # device-resident hi limbs, reused for phi
    gram_parts = []
    for b in range(n_blocks):
        i0, i1 = b * blkK, min(nk, (b + 1) * blkK)
        Sb = np.array(N[i0:i1], dtype=np.float64)
        Sb /= total
        Sb *= inv_sr[i0:i1, None]
        Sb *= inv_sc[None, :]
        Sb -= u[i0:i1, None] * v[None, :]
        if i1 - i0 < blkK:  # zero rows: no Gram contribution, phi dropped
            Sb = np.concatenate(
                [Sb, np.zeros((blkK - (i1 - i0), ns))], axis=0
            )
        hi = Sb.astype(np.float32)
        hi_d = jax.device_put(hi, x_sharding)
        np.subtract(Sb, hi, out=Sb)
        lo_d = jax.device_put(Sb.astype(np.float32), x_sharding)
        hi_blocks.append(hi_d)
        gram_parts.append(gram_fn(hi_d, lo_d))
    tm.mark("residuals+uploads")
    # per-block per-shard (acc, comp) pairs combined in host float64
    G = np.zeros((ns, ns))
    for accs, comps in gram_parts:
        G += (
            np.asarray(_host(accs), dtype=np.float64)
            - np.asarray(_host(comps), dtype=np.float64)
        ).sum(axis=0)
    tm.mark("gram")
    # ---- tiny factorization in host float64 (matches core.ca.fit_ca) ----
    sample_coords, inertia, sv, V, sv_safe = _factor_gram_host(
        G, d, c_safe, max(1, min(nk, ns) - 1)
    )
    tm.mark("eigh")
    # ---- phi = D_r^-1/2 S V Sigma^-1: the big matmul, on device f32,
    # per hi block (kept device-resident above, so no re-upload) ----
    Vs_d = jax.device_put(
        (V / sv_safe[None, :]).astype(np.float32),
        NamedSharding(mesh, P(None, None)),
    )
    rs_full = (inv_sr * (r > 0)).astype(np.float32)
    phi_blocks = []
    for b, hi_d in enumerate(hi_blocks):
        rs_blk = np.zeros((blkK, 1), np.float32)
        seg = rs_full[b * blkK : min(nk, (b + 1) * blkK)]
        rs_blk[: seg.shape[0], 0] = seg
        phi_blocks.append(
            phi_fn(hi_d, Vs_d, jax.device_put(rs_blk, x_sharding))
        )
    if phi == "device":
        tw = _concat_fn_cached(mesh, len(phi_blocks))(*phi_blocks)[:nk]
    else:
        tw = np.concatenate(
            [np.asarray(_host(p), dtype=np.float64) for p in phi_blocks]
        )[:nk].T
    tm.mark("phi")
    return (sample_coords, inertia, tw, sv)


# ---------------- projection ----------------


def project_sharded(
    mesh: Mesh,
    spectra: np.ndarray,
    twister_t: np.ndarray,
    normalize: bool = True,
):
    """[B, K] spectra x [K, d] twister^T with B over "data", K over "kmer"."""
    n_data = mesh.shape[DATA_AXIS]
    n_kmer = mesh.shape[KMER_AXIS]
    xs, B = pad_to_multiple(device_canonical(spectra), 0, n_data)
    xs, K = pad_to_multiple(xs, 1, n_kmer)
    tw, _ = pad_to_multiple(device_canonical(twister_t), 0, n_kmer)
    x_sh = NamedSharding(mesh, P(DATA_AXIS, KMER_AXIS))
    w_sh = NamedSharding(mesh, P(KMER_AXIS, None))
    xs = jax.device_put(xs, x_sh)
    tw = jax.device_put(tw, w_sh)

    def fn(x, w):
        if normalize:
            sums = x.sum(axis=1, keepdims=True)  # psum over kmer shards
            x = x / jnp.where(sums == 0.0, 1.0, sums)
        return jnp.dot(x, w, preferred_element_type=x.dtype)

    out = jax.jit(
        fn, out_shardings=NamedSharding(mesh, P(DATA_AXIS, None))
    )(xs, tw)
    return _host(out)[:B]


# ---------------- pairwise distances ----------------


def pairwise_sharded(
    mesh: Mesh,
    queries: np.ndarray,
    targets: np.ndarray,
    metric: np.ndarray,
    normalize: bool = True,
):
    """Metric-weighted euclidean distances [B, T]: queries sharded over the
    whole mesh (both axes), targets replicated — the layout for the
    classification workload where T (classes) << B (sequences)."""
    n_shards = mesh.devices.size
    q, B = pad_to_multiple(device_canonical(queries), 0, n_shards)
    q_sh = NamedSharding(mesh, P((DATA_AXIS, KMER_AXIS), None))
    rep = NamedSharding(mesh, P(None, None))
    qd = jax.device_put(q, q_sh)
    td = jax.device_put(device_canonical(targets), rep)
    md = jax.device_put(device_canonical(metric), NamedSharding(mesh, P(None)))

    def fn(a, b, m):
        if normalize:
            na = jnp.sqrt((a * a * m[None, :]).sum(axis=1))
            na = jnp.where(na == 0.0, 1.0, na)
            a = a / na[:, None]
            nb = jnp.sqrt((b * b * m[None, :]).sum(axis=1))
            nb = jnp.where(nb == 0.0, 1.0, nb)
            b = b / nb[:, None]
        am = a * m[None, :]
        cross = jnp.dot(am, b.T, preferred_element_type=a.dtype)
        na2 = (am * a).sum(axis=1)
        nb2 = (b * b * m[None, :]).sum(axis=1)
        d2 = jnp.maximum(na2[:, None] + nb2[None, :] - 2.0 * cross, 0.0)
        return jnp.sqrt(d2)

    out = jax.jit(fn, out_shardings=q_sh)(qd, td, md)
    return _host(out)[:B]
