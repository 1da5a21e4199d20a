"""Associative-scan (parallel-prefix) Riccati backward pass — B=1 latency path.

The reference backward pass is a strictly sequential N-step recursion
(``iLQR.cpp:133-191``); its ``lax.scan`` port bounds single-solve latency at
N sequential dependency steps.  For the latency-critical serving case (one
vehicle replanning, B=1) this module computes all value functions
V_j = (V_xx, V_x) in O(log N) sequential depth with
``jax.lax.associative_scan``, then recovers every step's gains (k_j, K_j) in
one batched pass.

Math.  Each backward step maps the successor value function (P', p') to

    P = l_xx + A^T P' (I + C P')^-1 A            C = B R~^-1 B^T
    p = l_x  + A^T (I + P' C)^-1 (p' + P' b)     b = -B R~^-1 l_u

with A = fx, B = fu, R~ = l_uu + lambda*I (the LM-damped control Hessian;
l_ux == 0 here, Constraints.cpp:501-506).  Maps of this 5-parameter family
e = (A, b, C, eta, J) are closed under composition — for z = y∘x (x applied
first, i.e. x is the later-in-time step):

    L  = (I + C_y J_x)^-1
    A_z   = A_x L A_y
    b_z   = b_x + A_x L (b_y - C_y eta_x)
    C_z   = C_x + A_x L C_y A_x^T
    eta_z = eta_y + A_y^T L^T (eta_x + J_x b_y)
    J_z   = J_y + A_y^T L^T J_x A_y

(the parallel-LQT element algebra of Sarkka & Garcia-Fernandez, "Temporal
Parallelization of Dynamic Programming and Linear Quadratic Control";
derivation re-done from scratch for this cost convention — gradients, not
half-quadratics).  A constant seed element (A=0, J=V_xx0, eta=V_x0) makes
each inclusive prefix directly equal to the V consumed by that step's gains;
the seed reproduces the quirk that step N-1's running cost both seeds the
recursion and re-enters it (iLQR.cpp:108-113,133).

SEMANTICS DIVERGENCE (documented, opt-in): the reference propagates the
value function through the *regularized-inverse sandwich*
V_xx <- Q_xx - Q_ux^T M Q_uu M Q_ux with M = (clamp(eig(Q_uu)) + lambda)^-1
(iLQR.cpp:164-181).  That map is not a linear-fractional transform of V_xx
(the lambda*M^2 correction is rational of higher degree), so it admits NO
exact associative decomposition.  This module therefore propagates the
*textbook* damped recursion V_xx <- Q_xx - Q_ux^T M Q_ux (identical at
lambda -> 0 and whenever the solve has converged); the per-step GAINS still
use the reference's clamped regularized inverse exactly.  The sequential
path (``models/solver.py``) remains the parity-locked default;
``SolverParams.backward_impl='pscan'`` opts in.  ``backward_standard_seq``
below is the sequential oracle for the pscan algebra itself (tests lock
pscan == sequential-standard to machine precision, and pscan ~= reference at
small lambda).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cilqr_tpu.ops.eig2x2 import regularized_inverse


def _inv2x2(M):
    """Closed-form inverse of symmetric-ish 2x2 (batched ...x2x2)."""
    a, b = M[..., 0, 0], M[..., 0, 1]
    c, d = M[..., 1, 0], M[..., 1, 1]
    det = a * d - b * c
    inv = jnp.stack(
        [jnp.stack([d, -b], -1), jnp.stack([-c, a], -1)], -2
    )
    return inv / det[..., None, None]


def _elements(d, fx, fu, lamb):
    """Per-step scan elements from cost derivatives and Jacobians.

    d: CostDerivs-like with l_x (N,4), l_xx (N,4,4), l_u (N,2), l_uu (N,2,2);
    fx (N,4,4), fu (N,4,2) at successor states (iLQR.cpp:102-106).
    Returns the (N+1)-long element pytree: seed first, then steps
    N-1, N-2, ..., 1 (step 0's element is never consumed — its V is the
    prefix of step 1).
    """
    N = fx.shape[0]
    dtype = fx.dtype
    I2 = jnp.eye(2, dtype=dtype)
    Rt = d.l_uu + lamb * I2                      # (N, 2, 2), PSD + lamb > 0
    Rinv = _inv2x2(Rt)
    fuR = jnp.einsum("nij,njk->nik", fu, Rinv)   # (N, 4, 2)
    C = jnp.einsum("nik,njk->nij", fuR, fu)      # (N, 4, 4) = fu Rinv fu^T
    b = -jnp.einsum("nik,nk->ni", fuR, d.l_u)    # (N, 4)
    A = fx
    eta = d.l_x
    J = d.l_xx

    # reversed step order N-1 .. 1 (drop step 0), seed element in front
    sl = slice(N - 1, 0, -1)
    z4 = jnp.zeros((1, 4, 4), dtype)
    seed_A = z4
    seed_C = z4
    seed_b = jnp.zeros((1, 4), dtype)
    seed_eta = d.l_x[N - 1 : N]
    seed_J = d.l_xx[N - 1 : N]
    return (
        jnp.concatenate([seed_A, A[sl]], 0),
        jnp.concatenate([seed_b, b[sl]], 0),
        jnp.concatenate([seed_C, C[sl]], 0),
        jnp.concatenate([seed_eta, eta[sl]], 0),
        jnp.concatenate([seed_J, J[sl]], 0),
    )


def _combine(x, y):
    """z = y ∘ x (x applied first); batched over the leading axis."""
    Ax, bx, Cx, ex, Jx = x
    Ay, by, Cy, ey, Jy = y
    n = Ax.shape[-1]
    I = jnp.eye(n, dtype=Ax.dtype)
    hp = jax.lax.Precision.HIGHEST

    def mm(a, b):
        return jnp.matmul(a, b, precision=hp)

    CyJx = mm(Cy, Jx)
    # L = (I + Cy Jx)^-1 applied to [Ay | Cy | (by - Cy ex)]
    rhs = jnp.concatenate([Ay, Cy, (by - jnp.einsum("...ij,...j->...i", Cy, ex))[..., None]], axis=-1)
    sol = jnp.linalg.solve(I + CyJx, rhs)
    LAy = sol[..., :n]
    LCy = sol[..., n : 2 * n]
    Lb = sol[..., 2 * n]
    # L^T = (I + Jx Cy)^-1 applied to [(ex + Jx by) | Jx Ay]
    rhsT = jnp.concatenate(
        [(ex + jnp.einsum("...ij,...j->...i", Jx, by))[..., None], mm(Jx, Ay)], axis=-1
    )
    solT = jnp.linalg.solve(I + mm(Jx, Cy), rhsT)
    Lte = solT[..., 0]
    LtJA = solT[..., 1:]

    Az = mm(Ax, LAy)
    bz = bx + jnp.einsum("...ij,...j->...i", Ax, Lb)
    Cz = Cx + mm(Ax, mm(LCy, jnp.swapaxes(Ax, -1, -2)))
    ez = ey + jnp.einsum("...ji,...j->...i", Ay, Lte)
    Jz = Jy + mm(jnp.swapaxes(Ay, -1, -2), LtJA)
    # C/J are symmetric by construction; re-symmetrize against float drift
    Cz = 0.5 * (Cz + jnp.swapaxes(Cz, -1, -2))
    Jz = 0.5 * (Jz + jnp.swapaxes(Jz, -1, -2))
    return (Az, bz, Cz, ez, Jz)


def backward_pscan(p, d, X, U, lamb):
    """Parallel-prefix backward pass -> (k (N,2), K (N,2,4)).

    Drop-in for ``solver._backward_from_derivs`` (same seeding and
    successor-state Jacobian quirks; value propagation per the module
    docstring).  Sequential depth O(log N) instead of O(N).
    """
    from cilqr_tpu.models import dynamics

    N = p.horizon
    with jax.default_matmul_precision("highest"):
        fx, fu = dynamics.jacobians(p, X[1:, 2], X[1:, 3], U[:, 0])
        elems = _elements(d, fx, fu, lamb)
        _, _, _, p_all, P_all = jax.lax.associative_scan(_combine, elems)
        # prefix i is the V consumed by step j = N-1-i; flip to j order
        P = P_all[::-1]  # (N, 4, 4), P[j] = V_xx at j+1
        pv = p_all[::-1]  # (N, 4)

        Qu = d.l_u + jnp.einsum("nji,nj->ni", fu, pv)
        Quu = d.l_uu + jnp.einsum("nji,njk,nkl->nil", fu, P, fu)
        Qux = jnp.einsum("nji,njk,nkl->nil", fu, P, fx)
        M = regularized_inverse(Quu, jnp.broadcast_to(lamb, (N,)))
        k = -jnp.einsum("nij,nj->ni", M, Qu)
        K = -jnp.einsum("nij,njk->nik", M, Qux)
    return k, K


def backward_standard_seq(p, d, X, U, lamb):
    """Sequential oracle of the SAME textbook damped recursion the pscan
    propagates (V_xx <- Q_xx - Q_ux^T M~ Q_ux, M~ = (Q_uu + lambda)^-1,
    gains via the clamped regularized inverse).  Exists to lock the pscan
    algebra: pscan == this to machine precision for any lambda."""
    from cilqr_tpu.models import dynamics

    N = p.horizon
    with jax.default_matmul_precision("highest"):
        fx, fu = dynamics.jacobians(p, X[1:, 2], X[1:, 3], U[:, 0])

        def step(carry, inp):
            V_x, V_xx = carry
            l_x, l_xx, l_u, l_uu, fx_j, fu_j = inp
            Q_x = l_x + fx_j.T @ V_x
            Q_u = l_u + fu_j.T @ V_x
            Q_xx = l_xx + fx_j.T @ V_xx @ fx_j
            Q_ux = fu_j.T @ V_xx @ fx_j
            Q_uu = l_uu + fu_j.T @ V_xx @ fu_j
            M = regularized_inverse(Q_uu, lamb)
            k_j = -M @ Q_u
            K_j = -M @ Q_ux
            Mt = _inv2x2(Q_uu + lamb * jnp.eye(2, dtype=Q_uu.dtype))
            V_x_n = Q_x - Q_ux.T @ (Mt @ Q_u)
            V_xx_n = Q_xx - Q_ux.T @ (Mt @ Q_ux)
            V_xx_n = 0.5 * (V_xx_n + V_xx_n.T)
            return (V_x_n, V_xx_n), (k_j, K_j)

        inputs = (d.l_x, d.l_xx, d.l_u, d.l_uu, fx, fu)
        (_, _), (k_rev, K_rev) = jax.lax.scan(
            step, (d.l_x[N - 1], d.l_xx[N - 1]),
            jax.tree.map(lambda a: a[::-1], inputs),
        )
    return k_rev[::-1], K_rev[::-1]
