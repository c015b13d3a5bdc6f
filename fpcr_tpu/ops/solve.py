"""Rigid-motion solvers: point-to-point (Kabsch) and point-to-plane (6x6).

Point-to-point replaces the reference's cuBLAS/cuSolver sequence — centroids
via ones-vector Sgemv (/root/reference/src/CUDA/ICP_point_to_point_clean.cu:348-365),
cross-covariance via Sgemm(N,T) 3x3xN (:386-394), 3x3 SVD via cusolverDnSgesvd
(:400-407), R = U·Vᵀ (:410-418), T = q̄ - R·p̄ (:420-429) — with masked
matmul reductions (MXU) and an on-device 3x3 SVD. Every reduction takes an
optional ``axis_name`` so the same code psums moments over an ICI mesh axis
under shard_map (the 3x3 / 6x6 moment matrices are tiny — ideal all-reduce
payloads).

The reference omits the det(R) reflection correction (SURVEY.md §8);
``det_correction=True`` is the default here, with ``False`` available for
strict reference parity.

Point-to-plane replaces the ``Cxb`` per-point outer-product kernel +
ones-vector Sgemv reduction + cusolverDnSpotrf/Spotrs Cholesky
(/root/reference/src/CUDA/ICP_point_to_plane_clean.cu:240-283,608-645): here
J = [p x n, n] is formed vectorized, C = JᵀJ and b = -Jᵀr are masked matmuls,
and the 6x6 Cholesky solve runs on device — eliminating the reference's
per-iteration device→host→device round trip (:627-665).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.transforms import RigidTransform, rotation_zyx


def _psum(x, axis_name):
    return jax.lax.psum(x, axis_name) if axis_name is not None else x


def _weights(mask: Optional[jnp.ndarray], n: int, dtype):
    if mask is None:
        return jnp.ones((n,), dtype=dtype)
    return mask.astype(dtype)


def masked_centroid(
    x: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """Mean of valid points — the reference computes this as ``(1/N)·P·1``
    with a ones-vector Sgemv; here it is a masked sum (psum-able)."""
    w = _weights(mask, x.shape[0], x.dtype)
    s = _psum(jnp.sum(x * w[:, None], axis=0), axis_name)
    c = _psum(jnp.sum(w), axis_name)
    return s / jnp.maximum(c, 1.0)


def cross_covariance(
    p: jnp.ndarray,
    q: jnp.ndarray,
    p_bar: jnp.ndarray,
    q_bar: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """``W = Σ_i (q_i - q̄)(p_i - p̄)ᵀ`` as a [3,N]x[N,3] MXU matmul
    (reference: deviation kernel + Sgemm(N,T),
    /root/reference/src/CUDA/ICP_point_to_point_clean.cu:87-101,386-394)."""
    w = _weights(mask, p.shape[0], p.dtype)
    dev_p = (p - p_bar) * w[:, None]
    dev_q = q - q_bar
    W = jax.lax.dot_general(
        dev_q, dev_p,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # f32 moments, not bf16 passes
    )
    return _psum(W, axis_name)


def rotation_from_svd(W: jnp.ndarray, det_correction: bool = True) -> jnp.ndarray:
    """Kabsch rotation ``R = U·Vᵀ`` from the 3x3 cross-covariance, with the
    optional det(R)=+1 reflection fix the reference lacks."""
    hi = jax.lax.Precision.HIGHEST
    U, _, Vt = jnp.linalg.svd(W, full_matrices=False)
    R = jnp.matmul(U, Vt, precision=hi)
    if det_correction:
        d = jnp.sign(jnp.linalg.det(R))
        # flip the singular direction with the smallest singular value (last)
        U_fix = U.at[:, 2].multiply(d)
        R = jnp.matmul(U_fix, Vt, precision=hi)
    return R


def rotation_polar_newton_schulz(W: jnp.ndarray, iterations: int = 16) -> jnp.ndarray:
    """Orthogonal polar factor of W by Newton–Schulz iteration — matmul-only,
    MXU/jit friendly, no SVD custom call. Equals U·Vᵀ (the reference's
    uncorrected Kabsch rotation) for nonsingular W.

    Degenerate guard (fuzz-found): on rank-deficient W (e.g. a 1-D line
    cloud — the registration itself is underdetermined there) NS drives
    the null singular values to 0, leaving a non-orthogonal limit. A
    relative ridge keeps every singular value positive so the limit is a
    proper rotation (for well-conditioned W the perturbation is ~1e-6
    relative, far below f32 solve noise), and a final finite-check falls
    back to identity rather than poisoning the loop with NaN."""
    norm = jnp.sqrt(jnp.sum(W * W)) + 1e-30
    # Scale so all singular values < sqrt(3) (NS convergence region).
    X = W / norm + 1e-6 * jnp.eye(3, dtype=W.dtype)

    hi = jax.lax.Precision.HIGHEST

    def body(_, X):
        XtX = jnp.matmul(X.T, X, precision=hi)
        return 1.5 * X - 0.5 * jnp.matmul(X, XtX, precision=hi)

    R = jax.lax.fori_loop(0, iterations, body, X)
    # a rank-deficient W leaves null singular values near 0 after 16
    # NS steps (σ grows ~1.5×/step — the tiny ridge cannot recover them
    # in time); detect the non-orthogonal limit and fall back to the
    # identity rather than returning a projection matrix as a "rotation"
    ortho_err = jnp.max(jnp.abs(
        jnp.matmul(R, R.T, precision=hi) - jnp.eye(3, dtype=W.dtype)))
    good = jnp.isfinite(R).all() & (ortho_err < 1e-3)
    return jnp.where(good, R, jnp.eye(3, dtype=W.dtype))


def kabsch_transform(
    p: jnp.ndarray,
    q: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    *,
    solver: str = "svd",
    det_correction: bool = True,
    axis_name: Optional[str] = None,
) -> RigidTransform:
    """Closed-form least-squares rigid transform aligning p onto q.

    Computes centroids, cross-covariance (all psum-able across shards), then
    R via 3x3 SVD (or Newton–Schulz polar) and ``t = q̄ - R·p̄``.
    """
    p_bar = masked_centroid(p, mask, axis_name)
    q_bar = masked_centroid(q, mask, axis_name)
    W = cross_covariance(p, q, p_bar, q_bar, mask, axis_name)
    if solver == "svd":
        R = rotation_from_svd(W, det_correction=det_correction)
    elif solver == "polar":
        R = rotation_polar_newton_schulz(W)
    else:
        raise ValueError(f"unknown solver {solver!r}")
    t = q_bar - jnp.matmul(R, p_bar, precision=jax.lax.Precision.HIGHEST)
    return RigidTransform(R, t)


def umeyama_transform(
    p: jnp.ndarray,
    q: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    *,
    with_scale: bool = True,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, RigidTransform]:
    """Umeyama (TPAMI 1991) similarity alignment for known correspondences:
    returns ``(scale, RigidTransform)`` minimizing
    ``Σ w_i ‖q_i − (s·R·p_i + t)‖²``.

    Beyond-reference capability (the reference solves rigid-only Kabsch);
    ``with_scale=False`` reduces to Kabsch with the determinant-consistent
    reflection handling of the Umeyama paper. All reductions are masked and
    psum-able, same as ``kabsch_transform``.
    """
    hi = jax.lax.Precision.HIGHEST
    p = p.astype(jnp.float32)
    q = q.astype(jnp.float32)
    w = _weights(mask, p.shape[0], jnp.float32)
    wsum = jnp.maximum(_psum(jnp.sum(w), axis_name), 1.0)
    p_bar = masked_centroid(p, mask, axis_name)
    q_bar = masked_centroid(q, mask, axis_name)
    # normalized cross-covariance Σ w (q−q̄)(p−p̄)ᵀ / Σw and source variance
    W = cross_covariance(p, q, p_bar, q_bar, mask, axis_name) / wsum
    dev_p = p - p_bar
    var_p = _psum(jnp.sum(w * jnp.sum(dev_p * dev_p, axis=1)),
                  axis_name) / wsum
    U, D, Vt = jnp.linalg.svd(W, full_matrices=False)
    d = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    d = jnp.where(d == 0, 1.0, d)
    U_fix = U.at[:, 2].multiply(d)
    R = jnp.matmul(U_fix, Vt, precision=hi)
    if with_scale:
        s = (D[0] + D[1] + d * D[2]) / jnp.maximum(var_p, 1e-30)
    else:
        s = jnp.float32(1.0)
    t = q_bar - s * jnp.matmul(R, p_bar, precision=hi)
    return s, RigidTransform(R, t)


def plane_normal_equations(
    p: jnp.ndarray,
    q: jnp.ndarray,
    normals: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build the 6x6 normal equations ``C x = b`` for point-to-plane ICP.

    Per point: ``c_i = p_i × n_i``, J row ``[c_i, n_i]``, residual
    ``r_i = (p_i - q_i)·n_i``; then ``C = Σ w_i J_iᵀJ_i`` and
    ``b = -Σ w_i J_iᵀ r_i`` as masked MXU matmuls (reference: ``Cxb`` kernel +
    36xN/6xN ones-vector Sgemv,
    /root/reference/src/CUDA/ICP_point_to_plane_clean.cu:240-283,608-625).
    """
    c = jnp.cross(p, normals)
    J = jnp.concatenate([c, normals], axis=1)  # [N, 6]
    r = jnp.sum((p - q) * normals, axis=1)  # [N]
    w = _weights(mask, p.shape[0], p.dtype)
    Jw = J * w[:, None]
    C = jax.lax.dot_general(
        Jw, J,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # f32 moments, not bf16 passes
    )
    b = -jnp.sum(Jw * r[:, None], axis=0)
    return _psum(C, axis_name), _psum(b, axis_name)


def plane_solve_update(
    C: jnp.ndarray,
    b: jnp.ndarray,
    damping: float = 0.0,
) -> Tuple[RigidTransform, jnp.ndarray]:
    """Solve ``C x = b`` (6x6 Cholesky, on device) and rebuild the incremental
    transform: full Euler Rz·Ry·Rx from x[0:3] (the reference reconstructs the
    full — not small-angle — rotation,
    /root/reference/src/CUDA/ICP_point_to_plane_clean.cu:648-657), t = x[3:6].
    """
    if damping:
        C = C + damping * jnp.eye(6, dtype=C.dtype)
    # relative floor keeps the factorization finite even if the inlier set
    # collapses to (near-)empty — the solve then returns x ~ 0 (identity
    # update) instead of NaN
    floor = 1e-7 * (jnp.trace(C) / 6.0) + 1e-30
    C = C + floor * jnp.eye(6, dtype=C.dtype)
    chol, lower = jax.scipy.linalg.cho_factor(C)
    x = jax.scipy.linalg.cho_solve((chol, lower), b)
    # degenerate-geometry guard: identity update instead of NaN poisoning
    # (same rationale as gicp_solve_update; fuzz-found on 1-D line clouds)
    x = jnp.where(jnp.isfinite(x).all(), x, jnp.zeros_like(x))
    R = rotation_zyx(x[0], x[1], x[2]).astype(C.dtype)
    t = x[3:6]
    return RigidTransform(R, t), x


def point_to_plane_transform(
    p: jnp.ndarray,
    q: jnp.ndarray,
    normals: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    *,
    damping: float = 0.0,
    axis_name: Optional[str] = None,
) -> RigidTransform:
    """One linearized point-to-plane solve: p, matched q and matched target
    normals → incremental rigid transform."""
    C, b = plane_normal_equations(p, q, normals, mask, axis_name)
    transform, _ = plane_solve_update(C, b, damping)
    return transform
