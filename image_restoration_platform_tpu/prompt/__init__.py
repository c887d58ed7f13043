from .enhancer import (
    PromptEnhancerService,
    create_prompt_enhancer_service,
    DEGRADATION_TEMPLATES,
    conditioning_vector,
    COND_DIM,
)

__all__ = [
    "PromptEnhancerService",
    "create_prompt_enhancer_service",
    "DEGRADATION_TEMPLATES",
    "conditioning_vector",
    "COND_DIM",
]
