"""Sequence-parallel (context-parallel) linear attention.

The long-context scaling layer (SURVEY.md §5.7): the reference's sequence
story is purely algorithmic (O(N) linear attention); on a TPU slice we can
ALSO shard the sequence dimension itself, because kernelised attention's
global summaries are plain sums:

    kv    = sum_j phi(k_j)^T v_j        -> psum over the sequence axis
    k_sum = sum_j phi(k_j)              -> psum over the sequence axis
    out_i = phi(q_i) kv / (phi(q_i) k_sum + eps)   (fully local per shard)

Each device holds N/P tokens, computes its local [F, D] / [F] summaries,
one `lax.psum` over the 'seq' mesh axis (two tiny tensors, independent of
N), and finishes locally. Exact — not an approximation — and the
communication volume is O(F*D) per device versus O(N*D) for ring/all-gather
softmax attention. This is the reason linear attention composes so well
with context parallelism.

Implemented with `shard_map` over a Mesh axis; tested against the
single-device oracle on the 8-device CPU simulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.attention_core import EPS

# Finite mask for padded ring-softmax columns: keeps the running max finite
# (a -inf max would make the online correction exp(m - m_new) produce NaN).
_MASK = -0.7 * float(jnp.finfo(jnp.float32).max)


def _pad_seq(x, p: int):
    """Zero-pad the sequence axis (2) up to a multiple of p."""
    pad = (-x.shape[2]) % p
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[2] = (0, pad)
    return jnp.pad(x, widths)


def _local_linear_attention(q_prime, k_prime, v, axis_name: str):
    """Per-shard body: local summaries -> psum -> local normalised output.

    Args:
        q_prime, k_prime: [B, H, n_local, F].
        v: [B, H, n_local, D].
    Returns:
        [B, H, n_local, D].
    """
    kv = jnp.einsum("bhnf,bhnd->bhfd", k_prime, v,
                    preferred_element_type=jnp.float32)
    k_sum = jnp.sum(k_prime, axis=2)  # [B, H, F]
    kv = jax.lax.psum(kv, axis_name)
    k_sum = jax.lax.psum(k_sum, axis_name)
    num = jnp.einsum("bhnf,bhfd->bhnd", q_prime, kv,
                     preferred_element_type=jnp.float32)
    den = jnp.einsum("bhnf,bhf->bhn", q_prime, k_sum,
                     preferred_element_type=jnp.float32)
    return (num / (den[..., None] + EPS)).astype(v.dtype)


def seq_parallel_linear_attention(q_prime, k_prime, v, mesh: Mesh,
                                  axis: str = "data"):
    """Linear attention with the SEQUENCE dimension sharded over `axis`.

    Args:
        q_prime, k_prime: [B, H, N, F] feature-mapped queries/keys.
        v: [B, H, N, D].
        mesh: device mesh containing `axis`. Any N works: the sequence is
            zero-padded up to a multiple of the axis size (zero phi(k) rows
            add nothing to the summaries; padded query rows are sliced off).
    Returns:
        [B, H, N, D], numerically equal to
        `ops.attention_core.linear_attention` on one device.
    """
    n = q_prime.shape[2]
    p = mesh.shape[axis]
    q_prime, k_prime, v = (_pad_seq(t, p) for t in (q_prime, k_prime, v))
    spec = P(None, None, axis, None)
    fn = jax.shard_map(
        functools.partial(_local_linear_attention, axis_name=axis),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    put = lambda x: jax.device_put(x, NamedSharding(mesh, spec))
    return fn(put(q_prime), put(k_prime), put(v))[:, :, :n]


# ------------------------------------------------ ring softmax attention ---

def _ring_softmax_body(q, k_local, v_local, *, axis_name: str,
                       n_devices: int, scale: float, n_valid: int):
    """Ring softmax attention with cross-shard ONLINE-SOFTMAX statistics:
    (k, v) blocks rotate via ppermute; each device keeps running max m,
    normaliser l, and output accumulator o for its local queries, applying
    the exp(m_old - m_new) correction as new blocks arrive — the flash
    recurrence across devices instead of tiles. Key columns at global index
    >= n_valid (sequence padding) are masked to a large negative finite
    value so they contribute exactly zero probability."""
    idx = jax.lax.axis_index(axis_name)
    B, H, nl, D = q.shape
    m = jnp.full((B, H, nl, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((B, H, nl, 1), jnp.float32)
    o = jnp.zeros((B, H, nl, D), jnp.float32)
    k_blk, v_blk = k_local, v_local
    perm = [(i, (i + 1) % n_devices) for i in range(n_devices)]
    j_loc = jnp.arange(nl)

    for step in range(n_devices):  # static unroll
        src = (idx - step) % n_devices  # origin shard of the block we hold
        s = jnp.einsum("bhnd,bhmd->bhnm", q, k_blk,
                       preferred_element_type=jnp.float32) * scale
        j_global = src * nl + j_loc
        s = jnp.where(j_global[None, None, None, :] < n_valid, s, _MASK)
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_curr)
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        o = alpha * o + jnp.einsum("bhnm,bhmd->bhnd", p,
                                   v_blk.astype(jnp.float32),
                                   preferred_element_type=jnp.float32)
        m = m_new
        if step < n_devices - 1:
            k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
            v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
    return (o / jnp.where(l == 0.0, 1.0, l)).astype(v_local.dtype)


def ring_softmax_attention(q, k, v, scale: float, mesh: Mesh,
                           axis: str = "data"):
    """softmax(q k^T * scale) v with the sequence sharded over `axis`.

    Ring attention (non-causal): per-device memory O((N/P)^2), per-step
    communication O(N/P * D) point-to-point over the ring, overlapped with
    compute by XLA. Numerically equal to single-device softmax attention
    via the online-softmax correction.

    Args:
        q, k, v: [B, H, N, D]. Any N works: the sequence is zero-padded to a
            multiple of the axis size and padded key columns are masked.
    Returns:
        [B, H, N, D].
    """
    n = q.shape[2]
    p = mesh.shape[axis]
    q, k, v = (_pad_seq(t, p) for t in (q, k, v))
    spec = P(None, None, axis, None)
    fn = jax.shard_map(
        functools.partial(_ring_softmax_body, axis_name=axis, n_devices=p,
                          scale=scale, n_valid=n),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    put = lambda x: jax.device_put(x, NamedSharding(mesh, spec))
    return fn(put(q), put(k), put(v))[:, :, :n]


# ------------------------------------------------- ring KERPLE attention ---

def _ring_kerple_body(q_prime, k_prime, v, coeffs, *, axis_name: str,
                      n_devices: int, n_global: int):
    """Per-shard ring body: rotate (k', v) blocks around the ring with
    ppermute, accumulating Toeplitz-weighted partial sums. Unlike ring
    softmax attention there is NO online-max correction — the weights
    T_ij * (phi(q_i).phi(k_j)) are positive products, so partial numerators
    and denominators just add. Communication per step is the (k', v) block;
    compute on the current block overlaps the next block's transfer (XLA
    schedules the ppermute concurrently with the einsums).
    """
    idx = jax.lax.axis_index(axis_name)
    B, H, n_local, F = q_prime.shape
    D = v.shape[-1]

    i_loc = jnp.arange(n_local)[:, None]
    j_loc = jnp.arange(n_local)[None, :]

    num = jnp.zeros((B, H, n_local, D), jnp.float32)
    den = jnp.zeros((B, H, n_local), jnp.float32)
    k_blk, v_blk = k_prime, v
    perm = [(i, (i + 1) % n_devices) for i in range(n_devices)]

    for step in range(n_devices):  # static unroll — n_devices is trace-time
        src = (idx - step) % n_devices  # origin shard of the block we hold
        # T_ij = coeffs[h, (j_global - i_global) + N - 1]
        rel = (src - idx) * n_local + (j_loc - i_loc) + (n_global - 1)
        T = jnp.take(coeffs, rel, axis=-1)  # [H, n_local, n_local]
        A = jnp.einsum("bhif,bhjf->bhij", q_prime, k_blk,
                       preferred_element_type=jnp.float32)
        W = A * T[None]
        num = num + jnp.einsum("bhij,bhjd->bhid", W,
                               v_blk.astype(jnp.float32),
                               preferred_element_type=jnp.float32)
        den = den + jnp.sum(W, axis=-1)
        if step < n_devices - 1:
            k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
            v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
    return (num / (den[..., None] + EPS)).astype(v.dtype)


def ring_kerple_attention(q_prime, k_prime, v, coeffs, mesh: Mesh,
                          axis: str = "data"):
    """KERPLE attention with the sequence sharded over `axis`, computed as a
    ring: (k', v) blocks rotate via `ppermute` while each device accumulates
    its Toeplitz-masked partial sums against its local queries.

    The global [N, N] weight matrix never exists anywhere; per-device memory
    is O((N/P)^2) and per-step communication is O(N/P * (F + D)) — the
    ring-attention recipe specialised to positive-weight linear attention
    (no online softmax statistics needed).

    Args:
        q_prime, k_prime: [B, H, N, F].
        v: [B, H, N, D].
        coeffs: [H, 2N-1] positive Toeplitz coefficients (replicated).
            Any N works: sequences zero-pad to a multiple of the axis size
            (zero phi(k) rows give W = 0 regardless of the Toeplitz value)
            and coeffs re-centre into a [H, 2*Npad-1] table.
    Returns:
        [B, H, N, D], equal to `ops.kerple_linear_attention` on one device.
    """
    n = q_prime.shape[2]
    p = mesh.shape[axis]
    q_prime, k_prime, v = (_pad_seq(t, p) for t in (q_prime, k_prime, v))
    n_pad = q_prime.shape[2]
    if n_pad != n:
        # re-centre: padded_coeffs[:, d + n_pad - 1] = coeffs[:, d + n - 1]
        # for relative offsets d in [-(n-1), n-1]; out-of-range offsets only
        # ever multiply zero-padded phi(k), so their value is irrelevant.
        padded = jnp.zeros((coeffs.shape[0], 2 * n_pad - 1), coeffs.dtype)
        coeffs = jax.lax.dynamic_update_slice(
            padded, coeffs, (0, n_pad - n)
        )
    spec = P(None, None, axis, None)
    cspec = P()  # coeffs replicated
    fn = jax.shard_map(
        functools.partial(_ring_kerple_body, axis_name=axis, n_devices=p,
                          n_global=n_pad),
        mesh=mesh,
        in_specs=(spec, spec, spec, cspec),
        out_specs=spec,
    )
    put = lambda x, s: jax.device_put(x, NamedSharding(mesh, s))
    return fn(put(q_prime, spec), put(k_prime, spec), put(v, spec),
              put(coeffs, cspec))[:, :, :n]
