from hhrs_tpu.ops.nn import (
    linear_init,
    linear_apply,
    batchnorm_init,
    batchnorm_apply,
    dropout,
    embedding_init,
)
from hhrs_tpu.ops.cross import cross_stack_init, cross_stack_apply
from hhrs_tpu.ops.resblock import resblock_init, resblock_apply

__all__ = [
    "linear_init",
    "linear_apply",
    "batchnorm_init",
    "batchnorm_apply",
    "dropout",
    "embedding_init",
    "cross_stack_init",
    "cross_stack_apply",
    "resblock_init",
    "resblock_apply",
]
