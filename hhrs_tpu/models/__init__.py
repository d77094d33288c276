from hhrs_tpu.models.dcn import ModelDims, init_dcn, apply_dcn, input_dim_of

__all__ = ["ModelDims", "init_dcn", "apply_dcn", "input_dim_of"]
