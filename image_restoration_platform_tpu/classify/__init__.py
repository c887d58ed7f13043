from .classifier import (
    ClassifierService,
    classify_scores,
    create_classifier_service,
    DEGRADATION_TYPES,
    DEGRADATION_ORDER,
)

__all__ = [
    "ClassifierService",
    "classify_scores",
    "create_classifier_service",
    "DEGRADATION_TYPES",
    "DEGRADATION_ORDER",
]
