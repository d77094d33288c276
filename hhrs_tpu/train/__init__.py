from hhrs_tpu.train.metrics import auc_score, bce_with_logits, rmse_of_probs
from hhrs_tpu.train.trainer import TrainResult, train_dcn
from hhrs_tpu.train.artifacts import export_artifacts, load_artifact_bundle, ArtifactBundle

__all__ = [
    "auc_score",
    "bce_with_logits",
    "rmse_of_probs",
    "TrainResult",
    "train_dcn",
    "export_artifacts",
    "load_artifact_bundle",
    "ArtifactBundle",
]
