from .expressions import (
    ALL,
    PREV,
    CompleteExpression,
    PartialExpression,
    Placeholder,
    PlaceholderList,
    V,
    create_placeholder,
    fanin,
)
from .pipeline import Pipeline

__all__ = [
    "ALL",
    "PREV",
    "CompleteExpression",
    "PartialExpression",
    "Placeholder",
    "PlaceholderList",
    "Pipeline",
    "V",
    "create_placeholder",
    "fanin",
]
