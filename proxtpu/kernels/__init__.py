"""Fused Pallas TPU kernels for the hot inner steps (optional — every
solver also runs pure-XLA; kernels have interpret mode for CPU tests)."""

from .box_qp import (
    fused_pg_box_k_steps,
    fused_pg_box_step,
    reference_pg_box_step,
    solve_box_qp_batch,
    solve_box_qp_batch_blocked,
)
from .lasso import (
    fused_fb_prox_grad,
    fused_fista_k_steps,
    reference_fb_prox_grad,
    solve_lasso_batch,
    solve_lasso_batch_blocked,
    solve_lasso_batch_compacting,
    solve_lasso_batch_packed,
    solve_lasso_multirhs,
)
from .tv import (
    fused_cp_k_steps,
    reference_cp_step,
    solve_tv_batch,
)

__all__ = [
    "fused_fb_prox_grad", "reference_fb_prox_grad", "solve_lasso_batch",
    "fused_fista_k_steps", "solve_lasso_batch_blocked", "solve_lasso_multirhs",
    "solve_lasso_batch_compacting", "solve_lasso_batch_packed",
    "fused_pg_box_step", "reference_pg_box_step", "solve_box_qp_batch",
    "fused_pg_box_k_steps", "solve_box_qp_batch_blocked",
    "fused_cp_k_steps", "reference_cp_step", "solve_tv_batch",
]
