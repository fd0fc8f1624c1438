from .optimizer import (
    group,
    merge_selectors,
    optimize_extractors,
    optimize_patterns,
    score_kb,
    selector_distance,
    signature,
)
from .trainer import train, train_from_samples

__all__ = [
    "train",
    "train_from_samples",
    "optimize_extractors",
    "optimize_patterns",
    "score_kb",
    "group",
    "merge_selectors",
    "selector_distance",
    "signature",
]
