from hhrs_tpu.data.features import add_engineered_features
from hhrs_tpu.data.ingest import load_reviews_csv, load_friendships_csv, noise_filter
from hhrs_tpu.data.preprocess import Preprocessor, PreprocessArtifacts, DatasetSplits
from hhrs_tpu.data.synthetic import generate_synthetic_dataset

__all__ = [
    "add_engineered_features",
    "load_reviews_csv",
    "load_friendships_csv",
    "noise_filter",
    "Preprocessor",
    "PreprocessArtifacts",
    "DatasetSplits",
    "generate_synthetic_dataset",
]
