"""Marginalization: absorb factors into a dense FEJ prior via Schur complement.

Re-derivation of the reference MarginalizationError
(/root/reference/okvis_ceres/src/MarginalizationError.cpp):

- addResidualBlock (:127-435): residuals are evaluated at **first-estimate
  (FEJ) linearization points** — each parameter block's point is frozen when
  it first joins the prior — with Ceres-corrector loss handling; J^T J / J^T r
  accumulate into H/b. Here this is one `evaluate()` call on a problem whose
  factor tables hold exactly the to-be-absorbed factors and whose states are
  the FEJ points (the host estimator selects both).
- marginalizeOut (:506-802): diagonal-sqrt preconditioning, landmark blocks
  eliminated via 3x3 eigendecomposition pseudo-inverse (tolerance
  eps·dim·λmax), then one dense Schur for the removed pose/speed-bias dims.
- The prior is kept in (H, b0 = -Jᵀe0, c0 = |e0|²) form over the window's
  dense parameter vector — equivalent to the reference's eigendecomposed
  J/e0 form (updateErrorComputation, :806-846), but GN consumes H/b directly.

All functions here are jit-friendly: the *selection* of what to marginalize
arrives as masks; shapes never change.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from ..solver.assemble import NormalEqs
from ..solver.structure import WindowConfig


def pinv_sym(A: jnp.ndarray, active_mask: jnp.ndarray = None) -> jnp.ndarray:
    """Eigendecomposition pseudo-inverse of a symmetric PSD matrix with the
    reference tolerance eps·dim·λmax (MarginalizationError.cpp:818-832) and
    diagonal-sqrt preconditioning (:621-626).

    active_mask (n,) optionally restricts to a principal submatrix: inactive
    rows/cols are replaced by identity before the eigh and zeroed after —
    keeping the shape static under jit.
    """
    dtype = A.dtype
    n = A.shape[-1]
    if active_mask is not None:
        # inactive rows/cols -> unit diagonal (their eigenpairs decouple and
        # are zeroed again below), keeping shapes static under jit
        m = active_mask.astype(dtype)
        A = A * m[..., :, None] * m[..., None, :] + jnp.diag(1.0 - m)
    diag = jnp.diagonal(A, axis1=-2, axis2=-1)
    p = jnp.where(diag > 1e-9, jnp.sqrt(jnp.abs(diag) + 1e-300), 1e-3)
    p_inv = 1.0 / p
    As = A * p_inv[..., :, None] * p_inv[..., None, :]
    As = 0.5 * (As + jnp.swapaxes(As, -1, -2))
    w, V = jnp.linalg.eigh(As)
    eps = jnp.finfo(dtype).eps
    tol = eps * n * jnp.max(w, axis=-1, keepdims=True)
    w_pinv = jnp.where(w > tol, 1.0 / jnp.where(w > tol, w, 1.0), 0.0)
    Ainv_s = jnp.einsum("...ik,...k,...jk->...ij", V, w_pinv, V)
    Ainv = Ainv_s * p_inv[..., :, None] * p_inv[..., None, :]
    if active_mask is not None:
        m = active_mask.astype(dtype)
        Ainv = Ainv * m[..., :, None] * m[..., None, :]
    return Ainv


class MargResult(NamedTuple):
    H: jnp.ndarray  # (D, D) prior information over kept dense dims
    b0: jnp.ndarray  # (D,)
    c0: jnp.ndarray  # scalar


def marginalize_system(
    cfg: WindowConfig,
    eqs: NormalEqs,
    marg_dense_mask: jnp.ndarray,  # (D,) dims to eliminate
    keep_dense_mask: jnp.ndarray,  # (D,) dims the prior will cover
    marg_lm_mask: jnp.ndarray,  # (L,) landmarks to eliminate
    c0_in: jnp.ndarray,
) -> MargResult:
    """Schur-eliminate landmarks (blockwise 3x3 pinv) then dense dims.

    `eqs` must be the FEJ-linearized joint system of (absorbed factors +
    existing prior). Landmarks in marg_lm_mask are fully eliminated; their
    W/H_ll rows must only involve absorbed observations.
    """
    dtype = eqs.H_dd.dtype
    D = cfg.dense_dim

    # --- landmark elimination (blockwise, MarginalizationError.cpp:633-686) ---
    lm_f = marg_lm_mask.astype(dtype)[:, None, None]
    V_pinv = pinv_sym(eqs.H_ll) * lm_f  # (L,3,3); inactive blocks contribute 0
    H = eqs.H_dd - jnp.einsum("lda,lab,leb->de", eqs.W, V_pinv, eqs.W)
    b = eqs.b_d - jnp.einsum("lda,lab,lb->d", eqs.W, V_pinv, eqs.b_l)
    c0 = c0_in - jnp.einsum("la,lab,lb->", eqs.b_l, V_pinv, eqs.b_l)

    # --- dense elimination (MarginalizationError.cpp:698-741) ---
    mm = marg_dense_mask.astype(dtype)
    km = keep_dense_mask.astype(dtype)
    H_mm_pinv = pinv_sym(H, active_mask=marg_dense_mask)
    H_km = H * km[:, None] * mm[None, :]
    b_m = b * mm
    H_new = H * km[:, None] * km[None, :] - H_km @ H_mm_pinv @ H_km.T
    b_new = b * km - H_km @ (H_mm_pinv @ b_m)
    c0_new = c0 - b_m @ H_mm_pinv @ b_m

    H_new = 0.5 * (H_new + H_new.T)

    # --- PSD sanitization ---
    # In f32 the Schur complement can come out slightly indefinite and b can
    # leave range(H); the prior cost ½(c0 - 2bᵀΔχ + ΔχᵀHΔχ) then has
    # unbounded-below directions and the trust-region loop runs away (the
    # reference works in f64 where this never bites; its eigendecomposed
    # J/e0 form is PSD by construction — updateErrorComputation,
    # MarginalizationError.cpp:806-846). Project H to PSD, b onto range(H),
    # and make c0 consistent (c0 ≥ bᵀH⁺b) so the prior is exactly
    # ½|e0 + JΔχ|² for some J, e0.
    w, V = jnp.linalg.eigh(H_new)
    tol = jnp.finfo(dtype).eps * D * jnp.maximum(jnp.max(w), 0.0)
    w_pos = jnp.where(w > tol, w, 0.0)
    H_psd = jnp.einsum("ik,k,jk->ij", V, w_pos, V)
    coeff = V.T @ b_new
    keep = w > tol
    coeff_in = jnp.where(keep, coeff, 0.0)
    b_psd = V @ coeff_in
    quad = jnp.sum(jnp.where(keep, coeff_in * coeff_in / jnp.where(keep, w_pos, 1.0), 0.0))
    c0_psd = jnp.maximum(c0_new, quad)
    return MargResult(H=H_psd, b0=b_psd, c0=c0_psd)
