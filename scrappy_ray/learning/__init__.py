from .trainer import train, train_from_samples
from .optimizer import optimize_extractors, score_kb

__all__ = ["train", "train_from_samples", "optimize_extractors", "score_kb"]
