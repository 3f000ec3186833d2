"""Device-side condensation + horizon-parallel operators (SURVEY.md §2b
``dist/condense_shard`` and §5 "long-context / sequence parallelism").

The horizon is this framework's sequence axis. Three tools:

  * ``affine_scan_rollout`` — state response as a log-depth
    ``lax.associative_scan`` over per-step affine maps (x⁺ = A x + b_k):
    the ring-attention analogue; batched over scenarios with vmap.
  * ``condense_device`` — the full prediction-operator build (Φ, Γv, Γω,
    Γc for both the x̃ and x frames) as one jitted program. Unlike the
    host fp64 build (ops/condense.py — the accuracy path), this one is
    traceable and vmappable over model instances, so per-scenario model
    variations (parameter sweeps) condense in one batched XLA call.
  * ``condense_horizon_sharded`` — block-row condensation over a mesh
    axis: device d computes the Γ block-rows for its horizon slice from
    the shared power table (all devices hold A^k — tiny), writing an
    N/P-row shard. Memory per device drops from O(N²) to O(N²/P).

Math (SURVEY.md §3.2): Γv[k, j] = A^{k−j} Bv (j ≤ k) for X = [x_1…x_N];
the x̃ frame shifts by one. Powers come from the associative scan, the
block-Toeplitz gather from a power-index lookup (k−j), which XLA turns
into one batched gather + reshape — no Python N² loop on device.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp

from pyhybridcontrol_tpu.mld.model import MldModel


def matrix_power_scan(A: jnp.ndarray, N: int) -> jnp.ndarray:
    """(N+1, nx, nx) power table [I, A, …, A^N] via associative scan."""
    nx = A.shape[-1]
    As = jnp.broadcast_to(A, (N,) + A.shape)
    prefix = jax.lax.associative_scan(
        lambda a, b: jnp.matmul(b, a, precision="highest"), As)
    return jnp.concatenate([jnp.eye(nx, dtype=A.dtype)[None], prefix], 0)


def affine_scan_rollout(model: MldModel, x0, v_seq, omega_seq=None):
    """All states x_1..x_N in log depth: scan over affine maps
    (M, c) ∘ (M', c') = (M M', M c' + c). Exact same trajectory as
    ``MldModel.lsim`` but parallel-in-time — use for long-horizon
    simulation of *known* decision sequences (post-solve reconstruction,
    scenario evaluation), where sequential feedback is not needed."""
    info = model.info
    m = model.mats
    N = v_seq.shape[0]
    Bv = jnp.concatenate([m.B1, m.B2, m.B3], axis=1)
    b = jnp.matmul(v_seq, Bv.T, precision="highest") + m.b5[:, 0]
    if omega_seq is not None and info.nomega:
        b = b + jnp.matmul(omega_seq, m.B4.T, precision="highest")
    Ms = jnp.broadcast_to(m.A, (N,) + m.A.shape)

    def comb(l, r):
        Ml, cl = l
        Mr, cr = r
        return (jnp.matmul(Mr, Ml, precision="highest"),
                jnp.einsum("...ij,...j->...i", Mr, cl,
                            precision="highest") + cr)

    Mp, cp = jax.lax.associative_scan(comb, (Ms, b))
    xs = jnp.einsum("kij,j->ki", Mp, x0, precision="highest") + cp
    return xs


@partial(jax.jit, static_argnames=("N",))
def condense_device(model: MldModel, N: int):
    """Jitted prediction-operator build. Returns dict with
    Phi (N·nx, nx), Gv (N·nx, N·nv), Gw, Gc and the x̃-frame variants
    (suffix _t). vmap over stacked model leaves for batched instances."""
    info = model.info
    m = model.mats
    nx, nv, nw = info.nx, info.nv, info.nomega
    Bv = jnp.concatenate([m.B1, m.B2, m.B3], axis=1)
    pw = matrix_power_scan(m.A, N)            # (N+1, nx, nx)

    Phi = pw[1 : N + 1].reshape(N * nx, nx)
    Phi_t = pw[0:N].reshape(N * nx, nx)

    k = jnp.arange(N)[:, None]
    j = jnp.arange(N)[None, :]
    d = k - j                                  # power index for block (k,j)
    mask = (d >= 0)
    d0 = jnp.where(mask, d, 0)

    def toeplitz(power_offset, B):
        # block (k, j) = A^{k−j+offset} @ B where k−j+offset ≥ 0
        mk = (d + power_offset >= 0) & (d >= (0 if power_offset == 0 else 1))
        dd = jnp.clip(d + power_offset, 0, N)
        blocks = jnp.einsum("kjab,bc->kjac", pw[dd], B,
                            precision="highest")
        blocks = jnp.where(mk[:, :, None, None], blocks, 0.0)
        return blocks.transpose(0, 2, 1, 3).reshape(N * nx,
                                                    N * B.shape[1])

    Gv = toeplitz(0, Bv)                      # x-frame: A^{k−j} Bv, j ≤ k
    Gw = toeplitz(0, m.B4) if nw else jnp.zeros((N * nx, 0))
    Gv_t = toeplitz(-1, Bv)                   # x̃-frame: A^{k−1−j}, j < k
    Gw_t = toeplitz(-1, m.B4) if nw else jnp.zeros((N * nx, 0))

    b5 = m.b5[:, 0]
    # Gc_k = Σ_{i≤k} A^{k−i} b5  (x frame);  Gc̃_k = Σ_{i<k} A^{k−1−i} b5
    contrib = jnp.einsum("kjab,b->kja", pw[d0], b5,
                         precision="highest")
    contrib = jnp.where(mask[:, :, None], contrib, 0.0)
    Gc = contrib.sum(axis=1).reshape(N * nx)
    mask_t = d >= 1
    contrib_t = jnp.einsum("kjab,b->kja", pw[jnp.where(mask_t, d - 1, 0)],
                           b5, precision="highest")
    contrib_t = jnp.where(mask_t[:, :, None], contrib_t, 0.0)
    Gc_t = contrib_t.sum(axis=1).reshape(N * nx)

    return dict(Phi=Phi, Gv=Gv, Gw=Gw, Gc=Gc,
                Phi_t=Phi_t, Gv_t=Gv_t, Gw_t=Gw_t, Gc_t=Gc_t)


def condense_horizon_sharded(model: MldModel, N: int, mesh, axis: str = "hz"):
    """Γ operators with block-ROWS sharded over ``mesh[axis]``: device d
    builds rows for steps [d·N/P, (d+1)·N/P). The power table (N+1 small
    (nx,nx) matrices) is replicated — the sequence-parallel memory win is
    in the O(N²) Γ blocks, not the O(N) powers. Returns arrays sharded
    on their first axis (N·nx rows)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    P_ = mesh.shape[axis]
    if N % P_ != 0:
        raise ValueError(f"N={N} must divide by mesh axis {P_}")
    info = model.info
    nx, nv = info.nx, info.nv
    Nl = N // P_

    def shard_body(model_):
        d = jax.lax.axis_index(axis)
        m = model_.mats
        Bv = jnp.concatenate([m.B1, m.B2, m.B3], axis=1)
        pw = matrix_power_scan(m.A, N)
        k_local = d * Nl + jnp.arange(Nl)[:, None]     # global step ids
        j = jnp.arange(N)[None, :]
        dd = k_local - j
        mask = dd >= 0
        blocks = jnp.einsum("kjab,bc->kjac",
                            pw[jnp.where(mask, dd, 0)], Bv,
                            precision="highest")
        blocks = jnp.where(mask[:, :, None, None], blocks, 0.0)
        Gv_rows = blocks.transpose(0, 2, 1, 3).reshape(Nl * nx, N * nv)
        Phi_rows = jax.lax.dynamic_slice_in_dim(
            pw, 1 + d * Nl, Nl).reshape(Nl * nx, nx)
        return Phi_rows, Gv_rows

    fn = jax.shard_map(shard_body, mesh=mesh, in_specs=(P(),),
                       out_specs=(P(axis), P(axis)), check_vma=False)
    return fn(model)
