"""Pallas TPU kernels for the DCN-R hot path.

Two kernels earn their keep at this model's shapes (SURVEY.md §7.7):

  * ``cross_kernel`` — the L-layer cross stack fused into ONE kernel:
    each layer is a d-length dot + elementwise ops, far below MXU
    granularity, so the win is eliminating per-layer HBM round-trips of
    the [B, d] activation; train-capable via custom VJP.
  * ``tower_kernel`` — the entire eval-mode ranking tower (initial linear
    → residual blocks with BatchNorm folded into the matmuls → cross
    stack → final head) as ONE kernel: a request's scoring batch makes a
    single pass HBM→VMEM→MXU/VPU→HBM with zero intermediate
    materialization. This is the serve-path speed-of-light shape.

Both fall back to interpret mode off-TPU (tests run them on CPU with
bit-level parity checks against the jnp reference ops).
"""

from hhrs_tpu.ops.pallas.cross_kernel import cross_stack_pallas
from hhrs_tpu.ops.pallas.tower_kernel import dcnr_tower_eval_pallas, fold_eval_params

__all__ = ["cross_stack_pallas", "dcnr_tower_eval_pallas", "fold_eval_params"]


def pallas_supported() -> bool:
    """True when the default backend can compile Mosaic kernels natively."""
    import jax

    return jax.default_backend() == "tpu"
